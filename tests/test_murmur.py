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
