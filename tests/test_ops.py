"""Ops-level invariants not covered by the DuckDB entry-parity gate."""

import pytest
from pyspark.sql import functions as F

from admarus_spark.ops import multimodal as mm
from admarus_spark.ops import similarity as sim

SF_SMALL = "/root/testdata/sf0.001"


def test_fake_payload_expr_matches_python(spark):
    """The Catalyst byte expression must be bit-identical to the Python
    reference codec (make_fake_payload) — including multi-byte utf-8 chars
    split at the 64-byte truncation point."""
    rows = [
        (0, "hello world"),
        (7, ""),
        (63, "é" * 100),              # 2-byte chars, cut mid-char at 64
        (64, "x" * 3 + "é"),
        (123456, "a" * 200),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: bytes(r["p"])
        for r in df.select(
            "doc_id", mm.fake_payload_col(F.col("doc_id"), F.col("text")).alias("p")
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == mm.make_fake_payload(doc_id, text), doc_id


def test_media_features_matches_decode_image(spark):
    feats = {
        r["doc_id"]: r
        for r in mm.media_features(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20).collect()
    for d in docs:
        img = mm.decode_image(mm.make_fake_payload(d["doc_id"], d["text"]))
        r = feats[d["doc_id"]]
        assert r["decode_ok"] and (r["height"], r["width"]) == img.shape
        assert abs(r["mean_px_r"] - img.mean()) < 1e-8, d["doc_id"]


def test_neardup_exact_guard_raises(spark):
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        sim.neardup_pairs_exact(spark, SF_SMALL, max_rows=1)


def test_neardup_bucketed_subset_of_exact(spark):
    exact = {
        (r["vec_a"], r["vec_b"]) for r in sim.neardup_pairs_exact(spark, SF_SMALL).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"]) for r in sim.neardup_pairs(spark, SF_SMALL).collect()
    }
    assert bucketed <= exact
    assert bucketed  # the LSH blocking must still find same-bucket near-dups
