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
        if body.size == 0:
            return np.zeros((h, w), dtype=np.uint8)
        reps = -(-h * w // body.size)
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


def fake_payload_col(doc_id, text):
    """FAKE payload as a pure Catalyst byte expression (no Python): magic ||
    2-byte big-endian h || 2-byte big-endian w || first 64 BYTES of the utf-8
    text. Bit-identical to ``make_fake_payload`` (pytest-pinned)."""
    h = F.lit(8) + doc_id % F.lit(8)
    w = F.lit(8) + (doc_id / F.lit(8)).cast("long") % F.lit(8)
    be16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    body = F.substring(F.encode(text, "utf-8"), 1, 64)  # byte-based on binary
    return F.concat(F.lit(FAKE_MAGIC), be16(h), be16(w), body)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (the real
    multimodal plumbing: binary in, fixed-width features out). Payload
    synthesis is a JVM-side byte expression; the decode inside the UDF is
    per-payload (an opaque codec is inherently per-blob) but header parsing
    and the tiled-mean use closed-form NumPy, never materializing the image.
    Rows whose payload can't decode yield decode_ok = false. Output floats
    are rounded via F.round AFTER the UDF (oracle rounding parity)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        "doc_id", fake_payload_col(F.col("doc_id"), F.col("text")).alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            hs = np.zeros(n, dtype=np.int32)
            ws = np.zeros(n, dtype=np.int32)
            means = np.zeros(n, dtype=np.float64)
            for i, p in enumerate(pdf["payload"]):
                p = bytes(p)
                if p[:4] != FAKE_MAGIC:
                    continue  # unknown codec -> decode_ok stays False
                h = int.from_bytes(p[4:6], "big")
                w = int.from_bytes(p[6:8], "big")
                body = np.frombuffer(p[8:], dtype=np.uint8)
                area = h * w
                ok[i], hs[i], ws[i] = True, h, w
                if area and body.size:
                    # mean of body tiled to area, without materializing it:
                    # full cycles * body sum + partial-prefix sum
                    full, rem = divmod(area, body.size)
                    csum = int(body.sum(dtype=np.int64))
                    psum = int(body[:rem].sum(dtype=np.int64))
                    means[i] = float(full * csum + psum) / float(area)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "decode_ok": ok, "height": hs,
                 "width": ws, "mean_px": means}
            )

    feats = media.mapInPandas(
        extract, "doc_id long, decode_ok boolean, height int, width int, mean_px double"
    )
    return feats.select(
        "doc_id", "decode_ok", "height", "width",
        F.round("mean_px", 9).alias("mean_px_r"),
    )


# DuckDB twin of the FAKE codec: h/w are doc_id arithmetic; the tiled mean is
# the same closed form over the byte values of the first 64 utf-8 bytes
# (blob byte value recovered from its hex pair).
# DuckDB can't slice BLOBs, so the body is hexed ONCE and byte i is the hex
# pair at (2i-1, 2i).
_BYTEVAL = (
    "(strpos('0123456789ABCDEF', substr(hb, CAST(2*i-1 AS BIGINT), 1)) - 1) * 16"
    " + strpos('0123456789ABCDEF', substr(hb, CAST(2*i AS BIGINT), 1)) - 1"
)
MEDIA_FEATURES_SQL = f"""
WITH m AS (
  SELECT doc_id,
         8 + doc_id % 8 AS h,
         8 + (doc_id // 8) % 8 AS w,
         substr(hex(encode(text)), 1, 128) AS hb
  FROM documents
),
s AS (
  SELECT doc_id, h, w,
         h * w AS area,
         (length(hb) // 2)::BIGINT AS blen,
         coalesce(list_sum(list_transform(range(1, length(hb) // 2 + 1),
                                          i -> {_BYTEVAL})), 0)::BIGINT AS csum,
         coalesce(list_sum(list_transform(range(1, CAST((h * w) % greatest(length(hb) // 2, 1) AS BIGINT) + 1),
                                          i -> {_BYTEVAL})), 0)::BIGINT AS psum
  FROM m
)
SELECT doc_id, TRUE AS decode_ok, CAST(h AS INT) AS height, CAST(w AS INT) AS width,
       round(CASE WHEN blen = 0 THEN 0.0
                  ELSE ((area // blen) * csum + psum)::DOUBLE / area::DOUBLE END,
             9) AS mean_px_r
FROM s
"""


QUERIES = {
    "multimodal_meta": media_meta,
    "multimodal_features": media_features,
}

ORACLES = {
    "multimodal_meta": MEDIA_META_SQL,
    "multimodal_features": MEDIA_FEATURES_SQL,
}
