"""Multimodal plumbing tests: binary schema, Arrow batch shape, stubbed
codec, modality assignment."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ai_metadata_lineage_pyspark_spark.operators.multimodal import (
    _IMAGE_META_SCHEMA,
    _decode_batches,
    decode_image,
    with_payload,
)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_payload_is_binary_with_modality(spark):
    docs = spark.createDataFrame(
        [(0, "hello", "en"), (1, "world", "en"), (2, "!", "de")],
        ["doc_id", "text", "lang"],
    )
    out = with_payload(docs)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].modality == "image"
    assert rows[1].modality == "audio"
    assert rows[2].modality == "video"
    assert bytes(rows[0].payload) == b"hello"


def test_mapinpandas_decode_batch_shape(spark):
    docs = spark.createDataFrame(
        [(i * 3, f"doc number {i}", "en") for i in range(10)],  # all image modality
        ["doc_id", "text", "lang"],
    ).coalesce(1)
    meta = (
        with_payload(docs)
        .select("doc_id", "payload")
        .mapInPandas(_decode_batches, schema=_IMAGE_META_SCHEMA)
    )
    rows = meta.collect()
    assert len(rows) == 10
    # single partition + small data -> one Arrow batch containing all rows
    assert {r.batch_size for r in rows} == {10}
    r0 = next(r for r in rows if r.doc_id == 0)
    h = hashlib.md5(b"doc number 0").hexdigest()
    assert r0.content_hash == h
    assert r0.width == 1 + (int(h[0:2], 16) % 64)
    assert 1 <= r0.channels <= 4


def test_audio_chunk_features(spark, tmp_path):
    # an "audio" payload of 1300 bytes with 512-byte chunks -> offsets
    # 0, 512, 1024; the last chunk is the 276-byte tail. doc_id % 3 == 1
    # selects audio modality.
    text = "ab" * 650
    spark.createDataFrame([(1, text, "en", 1300)], ["doc_id", "text", "lang", "n_chars"]) \
        .write.parquet(str(tmp_path / "documents.parquet"))
    from ai_metadata_lineage_pyspark_spark.operators.multimodal import audio_chunk_features

    rows = sorted(audio_chunk_features(spark, str(tmp_path)).collect(), key=lambda r: r.chunk_offset)
    assert [r.chunk_offset for r in rows] == [0, 512, 1024]
    assert [r.n_bytes for r in rows] == [512, 512, 276]
    first = b"ab" * 256
    assert rows[0].byte_sum == sum(first)
    assert rows[0].energy == sum(first) / 512
    assert rows[0].chunk_hash == hashlib.md5(first).hexdigest()


def test_frame_sample_offsets(spark, tmp_path):
    # a "video" payload of 3000 bytes with stride 1024 and frame 256 ->
    # offsets 0, 1024, 2048 (last full window start <= 3000-256=2744)
    text = "x" * 3000
    spark.createDataFrame([(2, text, "en", 3000)], ["doc_id", "text", "lang", "n_chars"]) \
        .write.parquet(str(tmp_path / "documents.parquet"))
    from ai_metadata_lineage_pyspark_spark.operators.multimodal import video_frame_sample

    rows = sorted(video_frame_sample(spark, str(tmp_path)).collect(), key=lambda r: r.frame_offset)
    assert [r.frame_offset for r in rows] == [0, 1024, 2048]
    assert [r.frame_index for r in rows] == [0, 1, 2]
    assert rows[0].frame_hash == hashlib.md5(b"x" * 256).hexdigest()
