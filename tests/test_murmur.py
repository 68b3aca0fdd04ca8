"""Driver-side murmur3 must equal Spark's hash() (bucket routing parity)."""

import pandas as pd
from pyspark.sql import functions as F

from admarus_spark.murmur import spark_hash_string, term_bucket


def test_matches_spark_hash(spark):
    words = [
        "hunger", "license", "a", "ab", "abc", "abcd", "abcde", "", "été",
        "rareterm000063z", "x" * 100, "lang=en", "123", "ñ", "中文词",
    ]
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    got = {
        r["w"]: (r["h"], r["tb"])
        for r in df.select(
            "w", F.hash("w").alias("h"), F.pmod(F.hash("w"), F.lit(32)).alias("tb")
        ).collect()
    }
    for w in words:
        assert got[w][0] == spark_hash_string(w), w
        assert got[w][1] == term_bucket(w, 32), w


def test_int_hash_matches_spark(spark):
    from admarus_spark.murmur import spark_hash_int

    vals = list(range(-3, 40)) + [2**31 - 1, -(2**31), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {r["x"]: r["h"] for r in df.select("x", F.hash("x").alias("h")).collect()}
    for v in vals:
        assert got[v] == spark_hash_int(v), v


def test_identity_partition_keys(spark):
    """repartition(n, key) with the probe keys must place bucket tb alone in
    shuffle partition tb — the stage-2 identity routing invariant."""
    from admarus_spark.murmur import identity_partition_keys, spark_hash_int

    for n in (4, 32, 64):
        keys = identity_partition_keys(n)
        assert len(keys) == n
        assert [spark_hash_int(j) % n for j in keys] == list(range(n))
    n = 16
    keys = identity_partition_keys(n)
    src = spark.createDataFrame(
        [(tb, keys[tb]) for tb in range(n) for _ in range(5)], "tb int, pk int"
    )
    rows = (
        src.repartition(n, "pk")
        .withColumn("pid", F.spark_partition_id())
        .select("tb", "pid")
        .distinct()
        .collect()
    )
    assert all(r["tb"] == r["pid"] for r in rows)
