"""Codec-branch coverage hook (VERDICT r04 next-step #3), mirroring
tests/test_delta_parity.py: the sandbox ships no image library, so
`decode_image`'s PIL branch is import-gated dead code here — but wherever
pillow exists, this test drives REAL PNG bytes through the exact
mapInPandas seam `image_meta_extract` uses and asserts:

- true (width, height, channels) from the codec match the encode-time truth;
- the codec-independent fields (n_bytes, content_hash) are bit-identical to
  what the deterministic stand-in path computes over the same payloads —
  i.e. swapping the decoder changes ONLY the decoded fields, never the
  Spark-side plumbing contract.
"""

from __future__ import annotations

import hashlib
import io

import pytest

pytest.importorskip("PIL", reason="pillow not installed in this environment")

from PIL import Image  # noqa: E402


def _png_bytes(width: int, height: int, mode: str) -> bytes:
    img = Image.new(mode, (width, height), color=0)
    # deterministic non-constant content so content hashes differ per image
    px = img.load()
    for x in range(width):
        for y in range(height):
            v = (x * 31 + y * 7) % 256
            px[x, y] = v if mode == "L" else (v, (v * 3) % 256, (v * 5) % 256)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


_CASES = [
    # (doc_id, width, height, mode, expected_channels)
    (0, 3, 5, "RGB", 3),
    (1, 17, 9, "L", 1),
    (2, 64, 2, "RGB", 3),
]


def test_real_png_decode_through_mapinpandas_seam(spark):
    from ai_metadata_lineage_pyspark_spark.operators.multimodal import (
        _IMAGE_META_SCHEMA,
        _decode_batches,
        image_meta_extract_decoded,
    )

    rows = [(d, _png_bytes(w, h, m)) for d, w, h, m, _c in _CASES]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    decoded = {r["doc_id"]: r for r in image_meta_extract_decoded(df).collect()}
    assert set(decoded) == {d for d, *_ in _CASES}
    for d, w, h, m, c in _CASES:
        r = decoded[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        payload = dict(rows)[d]
        assert r["n_bytes"] == len(payload)
        assert r["content_hash"] == hashlib.md5(payload).hexdigest()

    # plumbing parity: the stand-in decoder over the SAME payloads agrees on
    # every codec-independent field (schema, doc ids, bytes, hashes)
    stub = {
        r["doc_id"]: r
        for r in df.mapInPandas(_decode_batches, schema=_IMAGE_META_SCHEMA).collect()
    }
    for d in decoded:
        assert stub[d]["n_bytes"] == decoded[d]["n_bytes"]
        assert stub[d]["content_hash"] == decoded[d]["content_hash"]


def test_decode_image_unit_parity():
    from ai_metadata_lineage_pyspark_spark.operators.multimodal import decode_image

    meta = decode_image(_png_bytes(11, 4, "RGB"))
    assert meta == {"width": 11, "height": 4, "channels": 3}
