"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

Beyond-reference surface (BASELINE.json north-star; the reference models no
binary data at all). The container ships no image/audio libraries, so the
actual codec step is STUBBED (`decode_image` raises NotImplementedError and
documents the real integration point); everything Spark-side — binary
schema, Arrow-batched mapInPandas decode plumbing, per-batch shape, frame
sampling, partitioning — is real and oracle-tested against a deterministic
byte-level "decode" that both engines can compute.

The fixture carries no binary column, so `payload` is synthesized as the
UTF-8 encoding of `documents.text` (identical bytes in Spark `encode` and
DuckDB `encode`), and modality is assigned round-robin from doc_id — the
plumbing doesn't care that the bytes aren't real JPEGs.

Scale notes: binary payloads ride in parquet as regular columns; the decode
path is mapInPandas (Arrow batches, zero JVM<->Python row overhead), which is
exactly how a real PIL/ffmpeg stage would run at 100 TB — per-row CPU work
with no shuffle. Frame sampling is a JVM-side explode over byte offsets: the
expensive part (hashing sampled windows) stays in whole-stage codegen.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.io import fan_out, load
from ..registry import register

_MODALITIES = ["image", "audio", "video"]

# hex pair -> int, portable between Spark (conv) and DuckDB (instr math)
_SPARK_HEX2 = "cast(conv(substring({h}, {p}, 2), 16, 10) as int)"
_SQL_HEX2 = (
    "((instr('0123456789abcdef', substr({h}, {p}, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr({h}, {p} + 1, 1)) - 1))"
)


def decode_image(payload: bytes) -> dict:
    """Real image decode behind the codec import gate.

    When pillow is installed this returns the TRUE (width, height, channels)
    of the encoded image; in a codec-less environment it raises
    NotImplementedError and `image_meta_extract` runs the deterministic
    stand-in instead. The Spark-side contract (schema, Arrow batching,
    partitioning) is identical either way — tests/test_codec_parity.py
    drives real PNG bytes through the same mapInPandas seam wherever PIL
    exists, so the decode branch is covered-for-free on codec-equipped
    clusters (same treatment as the Delta parity hook).
    """
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:  # codec-less sandbox: documented stub seam
        raise NotImplementedError(
            "image decoding requires pillow; this environment stubs the "
            "codec step — see image_meta_extract for the deterministic "
            "stand-in and tests/test_codec_parity.py for the real-decode hook"
        ) from e
    with Image.open(BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "channels": len(im.getbands())}


def with_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal manifest rows: opaque binary payload + typed
    metadata (modality, byte length, content hash)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MODALITIES]),
            (F.col("doc_id") % len(_MODALITIES) + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        "lang",
    )


_MANIFEST_ORACLE = f"""
    WITH m AS (
      SELECT doc_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        text AS payload,  -- fixture text is pure ASCII: VARCHAR ops == byte ops
        lang
      FROM documents
    )
    SELECT modality,
      COUNT(*) AS n_docs,
      CAST(SUM(strlen(payload)) AS BIGINT) AS total_bytes,
      COUNT(DISTINCT lang) AS n_langs,
      MIN(md5(payload)) AS min_content_hash
    FROM m
    GROUP BY modality
"""


@register("multimodal_manifest", oracle=_MANIFEST_ORACLE)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column manifest: modality assignment + per-modality stats over
    the opaque payload (length, content hash) — the catalog layer a training
    pipeline keys shard/placement decisions on."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    return (
        with_payload(docs)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.countDistinct("lang").alias("n_langs"),
            F.min(F.md5("payload")).alias("min_content_hash"),
        )
    )


# ---------------------------------------------------------------------------
# image_meta_extract — Arrow-batched mapInPandas "decode".
# ---------------------------------------------------------------------------

_IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("batch_size", T.IntegerType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder, one Arrow batch at a time.

    Stand-in for decode_image(): 'width'/'height'/'channels' are derived
    from the payload's md5 so the oracle can replay them relationally.
    batch_size is emitted to make the Arrow batch shape observable in tests.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        hashes = [hashlib.md5(b).hexdigest() for b in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in payloads],
                "content_hash": hashes,
                "width": [1 + (int(h[0:2], 16) % 64) for h in hashes],
                "height": [1 + (int(h[2:4], 16) % 64) for h in hashes],
                "channels": [1 + (int(h[4:6], 16) % 4) for h in hashes],
                "batch_size": len(pdf),
            }
        )


def _real_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The REAL decoder over the identical mapInPandas seam: same input
    columns (doc_id, payload), same _IMAGE_META_SCHEMA output, but width/
    height/channels come from decode_image (PIL) instead of the md5-derived
    stand-in. Executor-side import of PIL, exactly like a production decode
    stage — the driver never needs the codec."""
    for pdf in batches:
        payloads = [bytes(b) for b in pdf["payload"]]
        metas = [decode_image(b) for b in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in payloads],
                "content_hash": [hashlib.md5(b).hexdigest() for b in payloads],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "channels": [m["channels"] for m in metas],
                "batch_size": len(pdf),
            }
        )


def image_meta_extract_decoded(images: DataFrame) -> DataFrame:
    """image_meta_extract's decode stage with the real codec: `images` is
    any DataFrame with (doc_id long, payload binary) where payload holds
    real encoded image bytes. Used by the codec parity hook; a production
    pipeline would call this directly on its binary-column manifest."""
    meta = images.select("doc_id", "payload").mapInPandas(
        _real_decode_batches, schema=_IMAGE_META_SCHEMA
    )
    return meta.select(
        "doc_id", "n_bytes", "content_hash", "width", "height", "channels"
    )


_IMAGE_META_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, text AS payload  -- ASCII fixture: VARCHAR == bytes
      FROM documents
      WHERE doc_id % 3 = 0
    ),
    h AS (SELECT doc_id, payload, md5(payload) AS ch FROM m)
    SELECT doc_id,
      strlen(payload) AS n_bytes,
      ch AS content_hash,
      1 + ({_SQL_HEX2.format(h="ch", p=1)} % 64) AS width,
      1 + ({_SQL_HEX2.format(h="ch", p=3)} % 64) AS height,
      1 + ({_SQL_HEX2.format(h="ch", p=5)} % 4) AS channels
    FROM h
"""


@register("image_meta_extract", oracle=_IMAGE_META_ORACLE, bench=True)
def image_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode stage over the image-modality payloads.

    The Python stage is the real integration point for PIL/torchvision
    (decode_image documents the swap); its deterministic stand-in keeps the
    stage oracle-checkable. batch_size is dropped from the comparison but
    asserted in unit tests (Arrow batch shape).
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    images = with_payload(docs).filter(F.col("modality") == "image")
    meta = images.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=_IMAGE_META_SCHEMA
    )
    return meta.select(
        "doc_id", "n_bytes", "content_hash", "width", "height", "channels"
    )


# ---------------------------------------------------------------------------
# audio_chunk_features — JVM-side chunking + Arrow-batched Python features.
# ---------------------------------------------------------------------------

_CHUNK_BYTES = 512

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_index", T.LongType()),
        T.StructField("chunk_offset", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("energy", T.DoubleType()),
        T.StructField("chunk_hash", T.StringType()),
    ]
)


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-chunk feature extraction, one Arrow batch at a time.

    Integration point for a real audio library (librosa/torchaudio): swap the
    byte-level energy for MFCC/spectrogram features over the decoded PCM.
    The stand-in computes REAL byte statistics (exact integer sum via numpy,
    energy = byte_sum / n_bytes in double) so the stage stays oracle-checkable.
    """
    import numpy as np

    for pdf in batches:
        chunks = [bytes(c) for c in pdf["chunk"]]
        sums = [int(np.frombuffer(c, dtype=np.uint8).astype(np.int64).sum()) for c in chunks]
        lens = [len(c) for c in chunks]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "chunk_index": pdf["chunk_index"],
                "chunk_offset": pdf["chunk_offset"],
                "n_bytes": lens,
                "byte_sum": sums,
                "energy": [s / n for s, n in zip(sums, lens)],
                "chunk_hash": [hashlib.md5(c).hexdigest() for c in chunks],
            }
        )


@register(
    "audio_chunk_features",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, text AS payload  -- ASCII fixture: VARCHAR == bytes
      FROM documents
      WHERE doc_id % 3 = 1
    ),
    idx AS (
      SELECT doc_id, payload,
        unnest(range(0, strlen(payload), {_CHUNK_BYTES})) AS chunk_offset
      FROM a
    ),
    c AS (
      SELECT doc_id, chunk_offset,
        substring(payload, CAST(chunk_offset AS INT) + 1, {_CHUNK_BYTES}) AS chunk
      FROM idx
    )
    SELECT doc_id,
      CAST(chunk_offset / {_CHUNK_BYTES} AS BIGINT) AS chunk_index,
      chunk_offset,
      CAST(strlen(chunk) AS BIGINT) AS n_bytes,
      CAST(list_sum(list_transform(range(strlen(chunk)),
                    i -> ord(substr(chunk, CAST(i AS INT) + 1, 1)))) AS BIGINT) AS byte_sum,
      CAST(list_sum(list_transform(range(strlen(chunk)),
                    i -> ord(substr(chunk, CAST(i AS INT) + 1, 1)))) AS DOUBLE)
        / strlen(chunk) AS energy,
      md5(chunk) AS chunk_hash
    FROM c
    """,
)
def audio_chunk_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path: fixed-size chunking of the opaque payload (JVM explode
    over byte offsets — stays in whole-stage codegen) followed by an
    Arrow-batched mapInPandas feature stage over the chunk bytes. This is the
    shape of a real resample/MFCC pipeline at 100 TB: chunking and shuffle-free
    scan parallelism JVM-side, per-chunk DSP in vectorized Python batches."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    audio = with_payload(docs).filter(F.col("modality") == "audio")
    chunks = audio.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.octet_length("payload") - F.lit(1),
                F.lit(_CHUNK_BYTES),
            )
        ).alias("chunk_offset"),
        "payload",
    ).select(
        "doc_id",
        (F.col("chunk_offset") / _CHUNK_BYTES).cast("bigint").alias("chunk_index"),
        F.col("chunk_offset").cast("bigint").alias("chunk_offset"),
        F.expr(f"substring(payload, chunk_offset + 1, {_CHUNK_BYTES})").alias("chunk"),
    )
    return chunks.mapInPandas(_audio_feature_batches, schema=_AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# video_frame_sample — JVM-side frame sampling over byte offsets.
# ---------------------------------------------------------------------------

_FRAME_BYTES = 256
_FRAME_STRIDE = 1024


@register(
    "video_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text AS payload  -- ASCII fixture: VARCHAR == bytes
      FROM documents
      WHERE doc_id % 3 = 2
    ),
    idx AS (
      SELECT doc_id, payload,
        unnest(range(0, GREATEST(strlen(payload) - {_FRAME_BYTES} + 1, 1),
                     {_FRAME_STRIDE})) AS frame_offset
      FROM v
    )
    SELECT doc_id,
      CAST(frame_offset / {_FRAME_STRIDE} AS BIGINT) AS frame_index,
      frame_offset,
      md5(substring(payload, CAST(frame_offset AS INT) + 1, {_FRAME_BYTES})) AS frame_hash
    FROM idx
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample fixed-size 'frames' every _FRAME_STRIDE bytes from the video
    payloads: explode over offsets + hash the sampled window, all JVM-side.
    A real ffmpeg keyframe extractor would replace the hash with a mapInPandas
    stage exactly like image_meta_extract's."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    videos = with_payload(docs).filter(F.col("modality") == "video")
    return (
        videos.select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.octet_length("payload") - F.lit(_FRAME_BYTES),
                        F.lit(0),
                    ),
                    F.lit(_FRAME_STRIDE),
                )
            ).alias("frame_offset"),
        )
        .select(
            "doc_id",
            (F.col("frame_offset") / _FRAME_STRIDE).cast("bigint").alias("frame_index"),
            F.col("frame_offset").cast("bigint").alias("frame_offset"),
            F.md5(
                F.expr(f"substring(payload, frame_offset + 1, {_FRAME_BYTES})")
            ).alias("frame_hash"),
        )
    )
