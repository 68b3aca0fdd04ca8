"""Scan-parallelism guard for ops inputs.

A locally-generated corpus lands as ONE parquet row group, so its scan
yields a single effective input split and every map operation pipelined on
top of it — tokenize, explode, hashing, partial aggregation — runs in ONE
task regardless of the session's core count (a parquet split only reads
row groups whose midpoint it contains). Isolated with the noop sink at
sf1.0, a single `md5(shingle)` projection over the shingle stream cost
11.6 s against 2.6 s for the stream itself: ~1/32 of the machine doing all
the per-row work (OPTIMIZATION_r06.md).

``scan_wide`` widens such a scan with a round-robin repartition to the
session's parallelism — a cheap exchange of the raw rows (a few MB
locally) that unlocks every core for the expensive map work above it. The
guard is scale-adaptive, not a local-mode constant: any source that
already splits at least as wide as the session (a real multi-row-group /
multi-file table at cluster scale) passes through untouched, so no
shuffle is ever added where the scan parallelism is already sufficient.
Same rule the index build applies to its own content scan
(index/build.py stage 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_wide(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow scan up to the session parallelism;
    identity on inputs that already split wide enough."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


# the narrow/wide decision per (path, parallelism) — a property of the file
# layout, stable for the session; memoized because the .rdd partition-count
# probe costs ~0.1 s of driver planning per call
_NARROW: dict[tuple[str, int], bool] = {}


def read_wide(spark: SparkSession, path: str) -> DataFrame:
    """``scan_wide(spark.read.parquet(path))`` with the probe memoized."""
    n = spark.sparkContext.defaultParallelism
    key = (path, n)
    narrow = _NARROW.get(key)
    df = spark.read.parquet(path)
    if narrow is None:
        narrow = df.rdd.getNumPartitions() < n
        _NARROW[key] = narrow
    return df.repartition(n) if narrow else df
