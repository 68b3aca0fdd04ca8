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


def test_dedup_hash_swap_xxhash64(spark, tmp_path):
    """The md5-for-oracle-parity claim: swapping the dedup hash to the
    JVM-native xxhash64 must preserve (a) the exact grouping STRUCTURE of
    exact dedup, (b) the single-pass no-cartesian plan shape of MinHash,
    and (c) recall of true duplicate pairs through LSH banding."""
    import pandas as pd

    from admarus_spark.ops import dedup

    uniq = [
        f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} foxtrot{i} golf{i} hotel{i}"
        for i in range(10)
    ]
    texts = [uniq[i % 10] for i in range(40)]  # 10 contents x 4 copies
    pdf = pd.DataFrame({"doc_id": range(40), "text": texts})
    d = str(tmp_path / "dupcorp")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    # (a) identical grouping structure: same (keep_id, cnt) partition
    g_md5 = sorted(
        (r["keep_id"], r["cnt"]) for r in dedup.exact_groups(spark, d).collect()
    )
    g_xx = sorted(
        (r["keep_id"], r["cnt"])
        for r in dedup.exact_groups(spark, d, hash_method="xxhash64").collect()
    )
    assert g_md5 == g_xx == [(i, 4) for i in range(10)]

    # (b) plan shape: xxhash64 lands in the plan, still ONE aggregation pass
    # over the shingle stream, no cartesian/cross join anywhere
    bands = dedup.minhash_bands(spark, d, hash_method="xxhash64")
    plan = bands._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    # (c) every identical-content pair is recalled by LSH banding under
    # BOTH hashes (identical text -> identical signature -> same buckets)
    want = {
        (a, b)
        for i in range(10)
        for a in range(i, 40, 10)
        for b in range(i, 40, 10)
        if a < b
    }
    for method in ("md5", "xxhash64"):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_pairs(spark, d, hash_method=method).collect()
        }
        assert want <= got, method
