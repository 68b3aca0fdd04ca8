"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata;
feature extraction runs as Arrow-batched ``mapInPandas`` over the bytes. The
actual codecs (PIL/ffmpeg) are NOT in this container, so the decode step is
stubbed behind ``decode_image`` (NotImplementedError for real formats, a
deterministic fake for the 'FAKE' magic) — the Spark-side plumbing (schema,
batching, UDF signature) is real and tested.

``media_meta`` is the oracle-checkable slice: payload byte length + sha256
computed from the binary column on both engines.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKE"


def decode_image(payload: bytes) -> np.ndarray:
    """Stub decoder. Real formats need PIL/libvips (not in this container).

    Payloads starting with the 'FAKE' magic decode deterministically: the
    next 2+2 bytes are big-endian (h, w), remaining bytes tile a uint8 image.
    """
    if payload[:4] == FAKE_MAGIC:
        h = int.from_bytes(payload[4:6], "big")
        w = int.from_bytes(payload[6:8], "big")
        body = np.frombuffer(payload[8:], dtype=np.uint8)
        if h * w == 0:
            return np.zeros((0, 0), dtype=np.uint8)
        reps = -(-h * w // max(1, body.size))
        return np.tile(body, reps)[: h * w].reshape(h, w)
    raise NotImplementedError(
        "real image decoding requires PIL/libvips, unavailable in this environment"
    )


def make_fake_payload(doc_id: int, text: str) -> bytes:
    h, w = 8 + doc_id % 8, 8 + (doc_id // 8) % 8
    return FAKE_MAGIC + h.to_bytes(2, "big") + w.to_bytes(2, "big") + text.encode()[:64]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-materialized as a media table: (doc_id, payload binary,
    media_type). Payload = utf-8 bytes of the text (a stand-in blob whose
    hash both engines can verify)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, payload_sha): typed metadata from the binary column."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


MEDIA_META_SQL = """
SELECT doc_id, strlen(text)::BIGINT AS n_bytes, sha256(text) AS payload_sha
FROM documents
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (the real
    multimodal plumbing: binary in, fixed-width features out). Uses the FAKE
    codec; rows whose payload can't decode yield decode_ok = false."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        "doc_id",
        F.udf(lambda i, t: make_fake_payload(i, t), "binary")(F.col("doc_id"), F.col("text")).alias("payload"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    img = decode_image(bytes(r.payload))
                    rows.append(
                        (r.doc_id, True, img.shape[0], img.shape[1], float(img.mean()) if img.size else 0.0)
                    )
                except NotImplementedError:
                    rows.append((r.doc_id, False, 0, 0, 0.0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "decode_ok", "height", "width", "mean_px"]
            )

    return media.mapInPandas(
        extract, "doc_id long, decode_ok boolean, height int, width int, mean_px double"
    )


QUERIES = {
    "multimodal_meta": media_meta,
    # media_features is non-SQL-expressible (stubbed codec) — exercised by
    # pytest; exposed without an oracle for the rows-only check.
    "multimodal_features": media_features,
}

ORACLES = {
    "multimodal_meta": MEDIA_META_SQL,
}
