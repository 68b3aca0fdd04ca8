"""Event-stream analytics (batch form; the streaming twin lives in
admarus_spark.streaming). Ports the reference's census window statistics
(``/root/reference/census/src/stats.rs:23-70``: per-window counts + median)
to tumbling event-time windows, plus TPC-H-style relational coverage of the
scan → join → aggregate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/A8: tumbling 1-hour windows per event_type: count + value sum."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_ts"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value_r"))
    )


HOURLY_SQL = """
SELECT CAST(date_part('epoch', date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value_r
FROM events GROUP BY 1, 2
"""


def census_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per event_type: count, exact interpolated median (stats.rs:61-68),
    max user activity after per-user dedup (max-per-folder analog)."""
    e = _events(spark, sf_dir)
    per_user = e.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    med = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value_r"),
    )
    mx = per_user.groupBy("event_type").agg(F.max("cnt").alias("max_user_events"))
    return med.join(mx, "event_type")


CENSUS_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT e.event_type, count(*) AS n,
       round(quantile_cont(e.value, 0.5), 6) AS median_value_r,
       (SELECT max(cnt) FROM per_user p WHERE p.event_type = e.event_type) AS max_user_events
FROM events e GROUP BY e.event_type
"""


def windows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/T3 current-vs-PREVIOUS window comparison
    (``/root/reference/census/src/stats.rs:42-54``: every record lands in
    the current 1h/24h window or the one preceding it, and both are
    reported). Batch analog: 'now' anchors deterministically at max(ts);
    current = (now-1d, now], previous = (now-2d, now-1d]. Per event_type:
    event counts, distinct users (the peers analog) and value sums for both
    windows, plus the count delta.

    Scale shape: one scalar-collect for the anchor, then a two-level
    aggregation — per (event_type, user_id) conditional partials first, so
    the distinct-user counts need NO Expand-based count(DISTINCT) pass —
    everything is map-side-combinable groupBys."""
    from datetime import datetime, timedelta

    e = _events(spark, sf_dir)
    now = e.agg(F.max("ts")).collect()[0][0]
    if now is None:
        # empty events table: anchor at the epoch — both windows are empty
        # and the aggregation returns zero rows with the normal schema
        # instead of `None - timedelta` raising (r5 review)
        now = datetime(1970, 1, 1)
    c1 = F.lit(now - timedelta(days=1)).cast("timestamp_ntz")
    c2 = F.lit(now - timedelta(days=2)).cast("timestamp_ntz")
    cur = F.col("ts") > c1
    prev = (F.col("ts") <= c1) & (F.col("ts") > c2)
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum(F.when(cur, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(prev, 1).otherwise(0)).alias("np"),
        F.sum(F.when(cur, F.col("value")).otherwise(0.0)).alias("vc"),
        F.sum(F.when(prev, F.col("value")).otherwise(0.0)).alias("vp"),
    )
    return per_user.groupBy("event_type").agg(
        F.sum("nc").cast("long").alias("n_cur"),
        F.sum("np").cast("long").alias("n_prev"),
        (F.sum("nc") - F.sum("np")).cast("long").alias("delta_n"),
        F.sum(F.when(F.col("nc") > 0, 1).otherwise(0)).cast("long").alias("users_cur"),
        F.sum(F.when(F.col("np") > 0, 1).otherwise(0)).cast("long").alias("users_prev"),
        F.round(F.sum("vc"), 6).alias("sum_value_cur_r"),
        F.round(F.sum("vp"), 6).alias("sum_value_prev_r"),
    )


WINDOWS_DELTA_SQL = """
WITH nw AS (SELECT max(date_part('epoch', ts)) AS s FROM events),
ev AS (SELECT event_type, user_id, value, date_part('epoch', ts) AS sec FROM events),
u AS (
  SELECT event_type, user_id,
         sum(CASE WHEN sec > (SELECT s FROM nw) - 86400 THEN 1 ELSE 0 END) AS nc,
         sum(CASE WHEN sec <= (SELECT s FROM nw) - 86400
                   AND sec > (SELECT s FROM nw) - 172800 THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN sec > (SELECT s FROM nw) - 86400 THEN value ELSE 0 END) AS vc,
         sum(CASE WHEN sec <= (SELECT s FROM nw) - 86400
                   AND sec > (SELECT s FROM nw) - 172800 THEN value ELSE 0 END) AS vp
  FROM ev GROUP BY 1, 2
)
SELECT event_type,
       sum(nc)::BIGINT AS n_cur,
       sum(np)::BIGINT AS n_prev,
       (sum(nc) - sum(np))::BIGINT AS delta_n,
       sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END)::BIGINT AS users_cur,
       sum(CASE WHEN np > 0 THEN 1 ELSE 0 END)::BIGINT AS users_prev,
       round(sum(vc), 6) AS sum_value_cur_r,
       round(sum(vp), 6) AS sum_value_prev_r
FROM u GROUP BY event_type
"""


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational scan+agg baseline (TPC-H Q1 shape over the testdata)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join path: customer ⋈ orders ⋈ lineitem revenue top-10 (broadcast the
    dimension side; Catalyst/AQE pick the join strategy)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10).select(
        "l_orderkey", "revenue", "o_orderdate"
    )


TPCH_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


QUERIES = {
    "events_hourly": hourly,
    "events_census_stats": census_stats,
    "events_windows_delta": windows_delta,
    "tpch_q1": tpch_q1,
    "tpch_q3ish": tpch_q3ish,
}

ORACLES = {
    "events_hourly": HOURLY_SQL,
    "events_census_stats": CENSUS_SQL,
    "events_windows_delta": WINDOWS_DELTA_SQL,
    "tpch_q1": TPCH_Q1_SQL,
    "tpch_q3ish": TPCH_Q3_SQL,
}
