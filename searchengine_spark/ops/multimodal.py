"""Multimodal column plumbing: opaque binary media + typed metadata.

Training-data pipelines carry image/audio/video next to text.  The
Spark-side contract is what matters at scale and is fully real here:
media as ``binary`` columns with a typed metadata struct, decode /
feature-extract / resize / frame-sample as Arrow-batched ``mapInPandas``
stages with explicit schemas and bounded batch memory.

The *codecs* are not: this container has no image/audio libraries, so
the decode kernels are deterministic stand-ins behind ``_HAVE_PIL``-style
gates — ``real_decode_image`` raises NotImplementedError unless PIL is
importable; ``fake_features`` derives floats from sha256 so every stage
downstream of decode (schemas, partitioning, joins, dedup on features)
is testable end-to-end and byte-deterministic.
"""

import hashlib
import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "meta struct<width:int, height:int, duration_ms:int>"
)

FEATURES_SCHEMA = "id long, media_type string, n_bytes long, features array<float>"

FRAMES_SCHEMA = "id long, frame_idx int, t_ms int"

N_FEATURES = 8

_TYPE_BY_LANG = {
    "python": "text/x-python",
    "java": "text/x-java",
    "c": "text/x-c",
    "js": "text/javascript",
    "md": "text/markdown",
}


def synth_media(docs: DataFrame, id_col="doc_id", text_col="text",
                lang_col="lang") -> DataFrame:
    """Deterministic media table from a text corpus: the utf-8 bytes
    become the opaque payload; metadata is derived arithmetically.
    (Stand-in for reading real image/audio blobs from parquet/Iceberg —
    the downstream operators never look inside the bytes.)"""
    mt = F.lit("application/octet-stream")
    for lang, t in sorted(_TYPE_BY_LANG.items()):
        mt = F.when(F.col(lang_col) == lang, F.lit(t)).otherwise(mt)
    n = F.octet_length(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        mt.alias("media_type"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def fake_features(data: bytes, k: int = N_FEATURES):
    """Deterministic unit-scale floats from sha256 — the decode stub."""
    h = hashlib.sha256(data).digest()
    return [
        _struct.unpack(">I", h[4 * i : 4 * i + 4])[0] / 2**32
        for i in range(k)
    ]


def real_decode_image(data: bytes):  # pragma: no cover - gated stub
    """Real image decode — requires PIL, absent in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow; install it on the "
            "cluster image and swap fake_features for a real embedding"
        )
    raise NotImplementedError("wire a real model here")


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Batch shape: Arrow delivers ``media`` as bytes; output is a fixed
    k-dim float vector per row — exactly the contract a real
    image/audio encoder stage has (swap fake_features for the model)."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["media"]],
                    "features": [fake_features(bytes(b)) for b in pdf["media"]],
                }
            )

    return media.select("id", "media_type", "media").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video-style frame sampling plan: one row per sampled timestamp.

    Pure column ops — the expensive per-frame decode happens *after*
    this explode, on the sampled rows only (decode-late pattern)."""
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return media.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * every_ms,
            )
        ).alias("frame_idx", "t_ms"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable run of the FEATURE-EXTRACTION stage itself
    (not just the payload stats): the Arrow-batched mapInPandas decode
    stub end-to-end, features flattened to scalar columns f0..f7.

    The fake decode is sha256-derived, so the DuckDB oracle recomputes
    the identical floats from the text bytes: uint32 big-endian slices
    of the digest / 2^32, rounded through float32 exactly as the
    ``array<float>`` schema stores them (widening back to double is
    exact on both engines).  Swapping in a real encoder keeps every
    contract here except the oracle's arithmetic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(synth_media(docs))
    cols = [
        F.element_at(F.col("features"), i + 1).cast("double").alias(f"f{i}")
        for i in range(N_FEATURES)
    ]
    return feats.select(
        F.col("id").alias("doc_id"), "media_type", "n_bytes", *cols
    )


def media_frames(spark: SparkSession, sf_dir: str,
                 every_ms: int = 1000) -> DataFrame:
    """Driver-checkable frame-sampling plan: one row per sampled
    timestamp, duration-derived — the decode-late explode that real
    per-frame decoding would follow (frame_sample)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return frame_sample(synth_media(docs), every_ms=every_ms).select(
        F.col("id").alias("doc_id"), "frame_idx", "t_ms"
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable summary of the multimodal plumbing: payload
    size + content hash per media row (oracle: octet_length/sha256 of
    the source text — the payload IS those bytes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synth_media(docs)
    return media.select(
        F.col("id").alias("doc_id"),
        "media_type",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.sha2("media", 256).alias("sha"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
