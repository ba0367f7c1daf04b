"""(filled in during round 1 build-out)"""
