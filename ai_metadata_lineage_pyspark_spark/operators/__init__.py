"""Operator modules. Importing them registers queries in the registry."""
