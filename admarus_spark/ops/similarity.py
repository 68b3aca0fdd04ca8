"""Similarity search over the embeddings table (vec_id, embedding float[64],
label).

- brute-force cosine top-k (the exactness baseline)
- sign-LSH bucketing with data-derived hyperplanes (deterministic: the
  embeddings of vec ids 1..NB_PLANES serve as planes — no RNG parity issues
  between engines), plus a bucketed ANN top-k
- cosine near-dup pairs above a threshold

Float parity: elements are cast to float64 before any arithmetic on both
sides; dot products are left-fold sums; outputs round to 6 dp, absorbing
summation-order ulp noise while remaining far finer than real sim gaps.

Scale notes: brute force is a broadcast of ONE query vector against a scan
(fine at any corpus size for single queries); the near-dup pair op is
LSH-bucketed (pairs only within buckets — per-bucket work (n/2^planes)^2),
with the exact O(n^2) cartesian kept solely as a row-count-guarded baseline.
Three ANN families cover the design space: sign-LSH (bucketed candidates),
IVF (coarse-quantized inverted file, materialized as a cell-partitioned
table so probes are partition pruning), and PQ (per-subspace codes + ADC
shortlist + exact re-rank — the memory-compression path that reads codes,
not vectors). At 10^12 vectors these compose as IVF-PQ: partition by cell,
ADC within the probed cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._scan import read_wide

TOP_K = 10
NB_PLANES = 6
NEARDUP_THRESHOLD = 0.35
QUERY_VEC_ID = 0


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_wide(spark, f"{sf_dir}/embeddings.parquet")
    return e.withColumn("v", F.transform("embedding", lambda x: x.cast("double")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_DOT_DUCK = "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


def _cos_duck(a: str, b: str) -> str:
    dot = _DOT_DUCK.format(a=a, b=b)
    na = _DOT_DUCK.format(a=a, b=a)
    nb = _DOT_DUCK.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


# ----------------------------------------------------------------------
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors of the query vector (vec_id 0)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("sim_r", F.round(_cos(F.col("v"), F.col("qv")), 6))
        .orderBy(F.desc("sim_r"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sim_r")
    )


COSINE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, round({_cos_duck('e.v', 'q.qv')}, 6) AS sim_r
FROM e, q WHERE vec_id != {QUERY_VEC_ID}
ORDER BY sim_r DESC, vec_id ASC LIMIT {TOP_K}
"""


# ----------------------------------------------------------------------
def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket per vector from NB_PLANES data-derived hyperplanes."""
    e = _emb(spark, sf_dir)
    planes = (
        e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NB_PLANES))
        .select(F.col("vec_id").alias("p"), F.col("v").alias("pv"))
    )
    signs = (
        e.crossJoin(F.broadcast(planes))
        .withColumn("bit", F.when(_dot(F.col("v"), F.col("pv")) > 0, 1).otherwise(0))
        .withColumn("contrib", F.expr("shiftleft(CAST(bit AS BIGINT), CAST(p - 1 AS INT))"))
    )
    return signs.groupBy("vec_id").agg(F.sum("contrib").cast("long").alias("bucket"))


LSH_BUCKETS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (SELECT vec_id AS p, v AS pv FROM e WHERE vec_id BETWEEN 1 AND {NB_PLANES}),
signs AS (
  SELECT e.vec_id,
         CASE WHEN {_DOT_DUCK.format(a='e.v', b='planes.pv')} > 0 THEN 1 ELSE 0 END AS bit,
         p
  FROM e, planes
)
SELECT vec_id, sum(CAST(bit AS BIGINT) << CAST(p - 1 AS INT))::BIGINT AS bucket
FROM signs GROUP BY vec_id
"""


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: top-k within the query vector's LSH bucket (the scale path —
    candidates shrink ~2^NB_PLANES-fold; recall traded for bounded work)."""
    e = _emb(spark, sf_dir)
    b = lsh_buckets(spark, sf_dir)
    eb = e.join(b, "vec_id")
    qb = eb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        eb.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("sim_r", F.round(_cos(F.col("v"), F.col("qv")), 6))
        .orderBy(F.desc("sim_r"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sim_r")
    )


LSH_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (SELECT vec_id AS p, v AS pv FROM e WHERE vec_id BETWEEN 1 AND {NB_PLANES}),
signs AS (
  SELECT e.vec_id,
         CASE WHEN {_DOT_DUCK.format(a='e.v', b='planes.pv')} > 0 THEN 1 ELSE 0 END AS bit, p
  FROM e, planes
),
buckets AS (
  SELECT vec_id, sum(CAST(bit AS BIGINT) << CAST(p - 1 AS INT))::BIGINT AS bucket
  FROM signs GROUP BY vec_id
),
q AS (
  SELECT e.v AS qv, b.bucket AS qbucket FROM e JOIN buckets b USING (vec_id)
  WHERE vec_id = {QUERY_VEC_ID}
)
SELECT e.vec_id, round({_cos_duck('e.v', 'q.qv')}, 6) AS sim_r
FROM e JOIN buckets b USING (vec_id), q
WHERE b.bucket = q.qbucket AND e.vec_id != {QUERY_VEC_ID}
ORDER BY sim_r DESC, vec_id ASC LIMIT {TOP_K}
"""


# ----------------------------------------------------------------------
def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold, LSH-bucketed: the
    pair join runs ONLY within sign-LSH buckets (join on bucket, refine by
    exact cosine) — per-bucket work is (n/2^planes)^2, never a corpus-level
    cartesian. Cross-bucket near-dups are traded away, as in any LSH blocking
    scheme; the DuckDB oracle applies the identical bucketing. The unguarded
    exact cartesian lives in ``neardup_pairs_exact`` behind a row-count
    guard."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    buckets = lsh_buckets(spark, sf_dir)
    eb = e.join(buckets, "vec_id")
    a = eb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket")
    b = eb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim_r", F.round(_cos(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim_r") >= NEARDUP_THRESHOLD)
        .select("vec_a", "vec_b", "sim_r")
    )


NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (SELECT vec_id AS p, v AS pv FROM e WHERE vec_id BETWEEN 1 AND {NB_PLANES}),
signs AS (
  SELECT e.vec_id,
         CASE WHEN {_DOT_DUCK.format(a='e.v', b='planes.pv')} > 0 THEN 1 ELSE 0 END AS bit, p
  FROM e, planes
),
buckets AS (
  SELECT vec_id, sum(CAST(bit AS BIGINT) << CAST(p - 1 AS INT))::BIGINT AS bucket
  FROM signs GROUP BY vec_id
),
eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING (vec_id))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_cos_duck('a.v', 'b.v')}, 6) AS sim_r
FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_cos_duck('a.v', 'b.v')}, 6) >= {NEARDUP_THRESHOLD}
"""


def neardup_pairs_exact(
    spark: SparkSession, sf_dir: str, max_rows: int = 100_000
) -> DataFrame:
    """Exact O(n^2) cosine pair baseline, GUARDED: refuses to run above
    ``max_rows`` vectors (the cartesian is a recall yardstick for small
    samples, never a corpus-scale plan — use ``neardup_pairs``)."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    n = e.count()
    if n > max_rows:
        raise ValueError(
            f"neardup_pairs_exact is O(n^2); {n} vectors > guard {max_rows}. "
            "Use neardup_pairs (LSH-bucketed) at scale."
        )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim_r", F.round(_cos(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim_r") >= NEARDUP_THRESHOLD)
        .select("vec_a", "vec_b", "sim_r")
    )


# ----------------------------------------------------------------------
NB_CELLS = 8
NPROBE = 2

_SQ_DUCK = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: cell = argmin_c L2²(v, centroid_c), with
    deterministic data-derived centroids (the vectors of vec ids
    1..NB_CELLS — like the LSH planes, chosen so both engines share exact
    centroid bits; k-means TRAINING is an offline concern, and each Lloyd
    iteration is the same plan shape: broadcast centroids → assign →
    groupBy mean). Ties on the rounded distance break to the smallest
    centroid id via a lexicographic struct-min — identical to the oracle's
    (d2_r, c) row_number order.

    Scale shape: centroids broadcast (NB_CELLS rows); assignment is one
    scan + whole-stage-codegen fold per vector; the result is the
    inverted-file layout — store/partition the corpus BY cell and a probe
    becomes partition pruning, the same physical trick as the postings
    term-bucket."""
    e = _emb(spark, sf_dir)
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NB_CELLS)).select(
        F.col("vec_id").alias("c"), F.col("v").alias("cv")
    )
    d = e.crossJoin(F.broadcast(cents)).withColumn(
        "d2_r", F.round(_l2sq(F.col("v"), F.col("cv")), 9)
    )
    best = d.groupBy("vec_id").agg(F.min(F.struct(F.col("d2_r"), F.col("c"))).alias("m"))
    return best.select("vec_id", F.col("m.c").alias("cell"))


IVF_CELLS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {NB_CELLS}),
d AS (
  SELECT e.vec_id, cents.c,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({_SQ_DUCK.format(a='e.v', b='cents.cv')}, 9) ASC, cents.c ASC
         ) AS rn
  FROM e, cents
)
SELECT vec_id, c AS cell FROM d WHERE rn = 1
"""


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: probe the NPROBE cells whose centroids are nearest
    the query vector, then exact cosine top-k over ONLY those cells'
    members — the classic inverted-file search. Candidates shrink
    ~NB_CELLS/NPROBE-fold; recall is traded for bounded work, and the
    oracle applies the identical probe so the comparison is exact.

    At 10^12 vectors: centroids number ~sqrt(n) and stay broadcastable,
    the corpus table is written partitioned by cell, and this plan's
    probe join becomes partition pruning — candidates stream from NPROBE
    partitions, never a full scan."""
    e = _emb(spark, sf_dir)
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NB_CELLS)).select(
        F.col("vec_id").alias("c"), F.col("v").alias("cv")
    )
    cells = ivf_cells(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("d2_r", F.round(_l2sq(F.col("cv"), F.col("qv")), 9))
        .orderBy(F.asc("d2_r"), F.asc("c"))
        .limit(NPROBE)
        .select(F.col("c").alias("cell"))
    )
    return (
        e.join(cells, "vec_id")
        .join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("sim_r", F.round(_cos(F.col("v"), F.col("qv")), 6))
        .orderBy(F.desc("sim_r"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sim_r")
    )


IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {NB_CELLS}),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
d AS (
  SELECT e.vec_id, cents.c,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({_SQ_DUCK.format(a='e.v', b='cents.cv')}, 9) ASC, cents.c ASC
         ) AS rn
  FROM e, cents
),
cells AS (SELECT vec_id, c AS cell FROM d WHERE rn = 1),
probe AS (
  SELECT c AS cell FROM cents, q
  ORDER BY round({_SQ_DUCK.format(a='cents.cv', b='q.qv')}, 9) ASC, c ASC
  LIMIT {NPROBE}
)
SELECT e.vec_id AS vec_id, round({_cos_duck('e.v', 'q.qv')}, 6) AS sim_r
FROM e
JOIN cells ON e.vec_id = cells.vec_id
JOIN probe ON cells.cell = probe.cell
CROSS JOIN q
WHERE e.vec_id != {QUERY_VEC_ID}
ORDER BY sim_r DESC, e.vec_id ASC LIMIT {TOP_K}
"""


def ivf_materialize(spark: SparkSession, sf_dir: str, base_dir: str = "/tmp/admarus_ivf") -> str:
    """Write the inverted-file layout ONCE: embeddings partitioned BY cell
    (``cell=<c>/`` directories), so every subsequent probe is partition
    pruning instead of recomputing the cell assignment per query — the
    physical migration the ``ivf_topk`` docstring promises (VERDICT r4 #4),
    and the exact trick the postings table plays with ``tb``. Keyed by the
    source dir; skipped when the table already exists (at production scale
    this is the offline index build; staleness is the caller's contract,
    like any index)."""
    key = sf_dir.strip("/").replace("/", "_")
    import os

    out = os.path.join(base_dir, f"{key}_c{NB_CELLS}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        e = _emb(spark, sf_dir)
        cells = ivf_cells(spark, sf_dir)
        (
            e.select("vec_id", "embedding")
            .join(cells, "vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(out)
        )
    return out


def ivf_topk_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k over the MATERIALIZED cells-partitioned table: the
    NPROBE nearest cells are established driver-side from the broadcast-
    sized centroid set (NB_CELLS ~ sqrt(n) rows — a bounded collect), and
    the candidate scan is ``PartitionFilters: cell IN (...)`` — candidates
    stream from NPROBE partition directories, the full corpus is never
    read (plan captured in BENCH/PLANS.md §5). Result-identical to
    ``ivf_topk`` and to the shared DuckDB oracle."""
    path = ivf_materialize(spark, sf_dir)
    e = _emb(spark, sf_dir)
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NB_CELLS)).select(
        F.col("vec_id").alias("c"), F.col("v").alias("cv")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    probe_cells = [
        int(r["c"])
        for r in (
            cents.crossJoin(F.broadcast(q))
            .withColumn("d2_r", F.round(_l2sq(F.col("cv"), F.col("qv")), 9))
            .orderBy(F.asc("d2_r"), F.asc("c"))
            .limit(NPROBE)
            .collect()
        )
    ]
    t = spark.read.parquet(path).withColumn(
        "v", F.transform("embedding", lambda x: x.cast("double"))
    )
    return (
        t.filter(F.col("cell").isin(probe_cells) & (F.col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(q))
        .withColumn("sim_r", F.round(_cos(F.col("v"), F.col("qv")), 6))
        .orderBy(F.desc("sim_r"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sim_r")
    )


# ----------------------------------------------------------------------
# product quantization: PQ codes + ADC shortlist -> exact re-rank (round 5)
# ----------------------------------------------------------------------
PQ_M = 4          # subspaces (64-dim embedding -> 4 x 16-dim)
PQ_SUB = 16       # dims per subspace
PQ_K = 8          # centroids per subspace codebook
PQ_SHORTLIST = 50 # ADC candidates fed to the exact re-rank


def _l2sq_sub(a, b, m: int):
    """L2² over subspace m (a 16-element slice of both vectors), the same
    left-fold element order as ``_l2sq`` — literal slice starts keep the
    expression whole-stage-codegen."""
    return _l2sq(
        F.slice(a, m * PQ_SUB + 1, PQ_SUB), F.slice(b, m * PQ_SUB + 1, PQ_SUB)
    )


def _pq_sq_duck(a: str, b: str) -> str:
    """DuckDB twin of ``_l2sq_sub`` with the subspace index from a CTE
    column ``m`` (0-based): element i of subspace m is [m*16 + i]."""
    return (
        f"list_sum(list_transform(range(1, {PQ_SUB} + 1), "
        f"i -> ({a}[m.m*{PQ_SUB}+i] - {b}[m.m*{PQ_SUB}+i]) "
        f"* ({a}[m.m*{PQ_SUB}+i] - {b}[m.m*{PQ_SUB}+i])))"
    )


def _pq_cents_m(e: DataFrame) -> DataFrame:
    """Per-subspace codebook rows (m, c, cv): deterministic data-derived
    centroids — the full vectors of vec ids 1..PQ_K, each contributing its
    m-th slice (k-means TRAINING is an offline concern, same rationale as
    the IVF centroids; each Lloyd step is the identical plan shape)."""
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= PQ_K)).select(
        F.col("vec_id").alias("c"), F.col("v").alias("cv")
    )
    return cents


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoder: code(v, m) = argmin_c L2²(v[m], centroid_c[m]) per
    subspace — each 64-dim float vector compresses to PQ_M small codes
    (4 x 3 bits here; 4 bytes vs 256 at production K=256), the
    representation ADC scans instead of raw vectors. Ties on the rounded
    distance break to the smallest centroid id (struct-min, identical to
    the oracle's row_number order).

    Scale shape: the codebook is PQ_K broadcast rows; encoding is ONE scan
    with a 4-struct inline — no shuffle, no Python. At 10^12 vectors the
    codes table is what lives hot (16-64x smaller than the vectors) and
    combines with the IVF layout (encode residuals per cell) — IVF-PQ."""
    e = _emb(spark, sf_dir)
    cents = _pq_cents_m(e)
    per_sub = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "c",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.round(_l2sq_sub(F.col("v"), F.col("cv"), m), 9).alias("d2_r"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ),
    )
    best = per_sub.groupBy("vec_id", "m").agg(
        F.min(F.struct(F.col("d2_r"), F.col("c"))).alias("b")
    )
    return best.select(
        "vec_id", F.col("m").cast("int").alias("m"), F.col("b.c").cast("int").alias("code")
    )


PQ_CODES_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {PQ_K}),
m AS (SELECT unnest(range(0, {PQ_M})) AS m),
d AS (
  SELECT e.vec_id, m.m, cents.c,
         row_number() OVER (
           PARTITION BY e.vec_id, m.m
           ORDER BY round({{sq}}, 9) ASC, cents.c ASC
         ) AS rn
  FROM e, cents, m
)
SELECT vec_id, CAST(m AS INT) AS m, CAST(c AS INT) AS code FROM d WHERE rn = 1
""".format(sq=_pq_sq_duck("e.v", "cents.cv"))


def pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-k, the production two-stage recipe: (1) ADC — the query
    builds a (m, c) distance table against the codebook (PQ_M x PQ_K
    broadcast rows), each vector's approximate distance is the FIXED-ORDER
    sum of its codes' table entries (d0 + d1 + d2 + d3 — pinned, so both
    engines add identical rounded doubles identically), shortlist =
    PQ_SHORTLIST smallest; (2) exact cosine re-ranks only the shortlist.
    The scan reads CODES, never raw vectors — the memory-bandwidth shape
    that makes billion-scale ANN fit in RAM; raw vectors are touched for
    PQ_SHORTLIST rows only."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    return _adc_rerank(e, q, pq_codes(spark, sf_dir))


def _adc_rerank(e: DataFrame, q: DataFrame, codes: DataFrame) -> DataFrame:
    """Stages 2+3 of the PQ recipe, shared by ``pq_topk`` (codes = the
    full table) and ``ivfpq_topk`` (codes pre-gated by the coarse probe):
    ADC — the query's (m, c) distance table against the codebook (PQ_M ×
    PQ_K broadcast rows), each vector's approximate distance is the
    FIXED-ORDER sum of its codes' table entries (d0 + d1 + d2 + d3 —
    pinned, so both engines add identical rounded doubles identically),
    shortlist = PQ_SHORTLIST smallest — then exact cosine re-ranks the
    shortlist only. ONE copy of the float-parity-critical expression tree;
    its DuckDB twin is ``_adc_rerank_sql`` — change them TOGETHER."""
    cents = _pq_cents_m(e)
    dtab = cents.crossJoin(F.broadcast(q)).select(
        "c",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.round(_l2sq_sub(F.col("cv"), F.col("qv"), m), 9).alias("dq"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ),
    )
    wide = codes.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("code"))).alias(f"c{m}")
            for m in range(PQ_M)
        ]
    )
    for m in range(PQ_M):
        dm = dtab.filter(F.col("m") == m).select(
            F.col("c").cast("int").alias(f"c{m}"), F.col("dq").alias(f"dq{m}")
        )
        wide = wide.join(F.broadcast(dm), f"c{m}")
    # pinned LEFT-fold order dq0 + dq1 + ... so both engines add identical
    # rounded doubles identically; built from PQ_M, not hardcoded — a PQ_M
    # change must not silently sum a subset (r5 review)
    asum = F.col("dq0")
    for m in range(1, PQ_M):
        asum = asum + F.col(f"dq{m}")
    adist = F.round(asum, 9).alias("adist_r")
    short = (
        wide.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", adist)
        .orderBy(F.asc("adist_r"), F.asc("vec_id"))
        .limit(PQ_SHORTLIST)
    )
    return (
        e.join(F.broadcast(short.select("vec_id")), "vec_id")
        .crossJoin(F.broadcast(q))
        .withColumn("sim_r", F.round(_cos(F.col("v"), F.col("qv")), 6))
        .orderBy(F.desc("sim_r"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sim_r")
    )


def _adc_rerank_sql(extra_ctes: str = "", codes_gate: str = "") -> str:
    """DuckDB twin of ``_adc_rerank`` (+ the ``pq_codes`` encode it scans):
    ``extra_ctes`` land between the ``q`` and ``d`` CTEs (must end with a
    trailing comma), ``codes_gate`` is a JOIN clause appended to the wide
    aggregation's FROM to gate which codes are scanned."""
    return """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {pq_k}),
m AS (SELECT unnest(range(0, {pq_m})) AS m),
q AS (SELECT v AS qv FROM e WHERE vec_id = {qid}),{extra}
d AS (
  SELECT e.vec_id, m.m, cents.c,
         row_number() OVER (
           PARTITION BY e.vec_id, m.m
           ORDER BY round({sq_code}, 9) ASC, cents.c ASC
         ) AS rn
  FROM e, cents, m
),
codes AS (SELECT vec_id, m, c AS code FROM d WHERE rn = 1),
dtab AS (
  SELECT m.m, cents.c, round({sq_q}, 9) AS dq
  FROM cents, m, q
),
wide AS (
  SELECT codes.vec_id,
         {wide_cols}
  FROM codes{gate} GROUP BY codes.vec_id
),
short AS (
  SELECT w.vec_id,
         round({adc_sum}, 9) AS adist_r
  FROM wide w
  {dtab_joins}
  WHERE w.vec_id != {qid}
  ORDER BY adist_r ASC, w.vec_id ASC
  LIMIT {shortlist}
)
SELECT e.vec_id AS vec_id, round({cos}, 6) AS sim_r
FROM e JOIN short ON e.vec_id = short.vec_id CROSS JOIN q
ORDER BY sim_r DESC, e.vec_id ASC LIMIT {top_k}
""".format(
        pq_k=PQ_K,
        pq_m=PQ_M,
        qid=QUERY_VEC_ID,
        shortlist=PQ_SHORTLIST,
        top_k=TOP_K,
        extra=extra_ctes,
        gate=codes_gate,
        # generated from PQ_M (r5 review: hardcoded 0..3 columns/joins/sum
        # would silently ignore subspaces if PQ_M changed); the sum's
        # left-fold order matches _adc_rerank's dq0 + dq1 + ...
        wide_cols=",\n         ".join(
            f"max(CASE WHEN m = {m} THEN code END) AS c{m}" for m in range(PQ_M)
        ),
        adc_sum=" + ".join(f"d{m}.dq" for m in range(PQ_M)),
        dtab_joins="\n  ".join(
            f"JOIN dtab d{m} ON d{m}.m = {m} AND d{m}.c = w.c{m}"
            for m in range(PQ_M)
        ),
        sq_code=_pq_sq_duck("e.v", "cents.cv"),
        sq_q=_pq_sq_duck("cents.cv", "q.qv"),
        cos=_cos_duck("e.v", "q.qv"),
    )


PQ_TOPK_SQL = _adc_rerank_sql()


def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed retrieval — the billion-scale production recipe
    with both structures engaged in ONE query plan: (1) coarse probe — the
    NPROBE cells nearest the query (same broadcast argmin as ``ivf_topk``)
    gate the candidate set; (2) ADC over the probed candidates' CODES only
    (distance table = PQ_M×PQ_K broadcast rows; approximate distance =
    the pinned-order sum d0+d1+d2+d3), shortlist = PQ_SHORTLIST smallest;
    (3) exact cosine re-ranks the shortlist. Raw vectors are touched for
    PQ_SHORTLIST rows; every scanned candidate costs PQ_M small codes.

    This composition shares ONE global codebook across cells (codes here
    are ``pq_codes``'s); production IVF-PQ usually encodes residuals
    v − centroid(cell) for tighter quantization — the residual variant is
    the same plan with the cell-centroid join moved before the encode,
    traded off here for a DuckDB-checkable deterministic codebook.

    At 10^12 vectors: the codes table is stored partitioned BY cell (the
    ``ivf_materialize`` layout), so step 2's candidate gate is partition
    pruning — the ADC scan streams NPROBE partitions of 4-byte codes and
    the full-precision vectors stay cold."""
    e = _emb(spark, sf_dir)
    cents = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= NB_CELLS)).select(
        F.col("vec_id").alias("c"), F.col("v").alias("cv")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("d2_r", F.round(_l2sq(F.col("cv"), F.col("qv")), 9))
        .orderBy(F.asc("d2_r"), F.asc("c"))
        .limit(NPROBE)
        .select(F.col("c").alias("cell"))
    )
    cand = ivf_cells(spark, sf_dir).join(F.broadcast(probe), "cell").select("vec_id")
    return _adc_rerank(e, q, pq_codes(spark, sf_dir).join(cand, "vec_id"))


_IVFPQ_EXTRA_CTES = """
icents AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {nb}),
celld AS (
  SELECT e.vec_id, icents.c,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({sq_cell}, 9) ASC, icents.c ASC
         ) AS rn
  FROM e, icents
),
cells AS (SELECT vec_id, c AS cell FROM celld WHERE rn = 1),
probe AS (
  SELECT c AS cell FROM icents, q
  ORDER BY round({sq_probe}, 9) ASC, c ASC
  LIMIT {nprobe}
),
cand AS (SELECT cells.vec_id FROM cells JOIN probe ON cells.cell = probe.cell),""".format(
    nb=NB_CELLS,
    nprobe=NPROBE,
    sq_cell=_SQ_DUCK.format(a="e.v", b="icents.cv"),
    sq_probe=_SQ_DUCK.format(a="icents.cv", b="q.qv"),
)

IVFPQ_TOPK_SQL = _adc_rerank_sql(
    extra_ctes=_IVFPQ_EXTRA_CTES,
    codes_gate=" JOIN cand ON codes.vec_id = cand.vec_id",
)


QUERIES = {
    "sim_cosine_topk": cosine_topk,
    "sim_lsh_buckets": lsh_buckets,
    "sim_lsh_topk": lsh_topk,
    "sim_neardup_pairs": neardup_pairs,
    "sim_ivf_cells": ivf_cells,
    "sim_ivf_topk": ivf_topk,
    "sim_ivf_topk_mat": ivf_topk_materialized,
    "sim_pq_codes": pq_codes,
    "sim_pq_topk": pq_topk,
    "sim_ivfpq_topk": ivfpq_topk,
}

ORACLES = {
    "sim_cosine_topk": COSINE_TOPK_SQL,
    "sim_lsh_buckets": LSH_BUCKETS_SQL,
    "sim_lsh_topk": LSH_TOPK_SQL,
    "sim_neardup_pairs": NEARDUP_SQL,
    "sim_ivf_cells": IVF_CELLS_SQL,
    "sim_ivf_topk": IVF_TOPK_SQL,
    # same reference semantics: the materialized layout must reproduce the
    # recompute-per-query plan's results exactly
    "sim_ivf_topk_mat": IVF_TOPK_SQL,
    "sim_pq_codes": PQ_CODES_SQL,
    "sim_pq_topk": PQ_TOPK_SQL,
    "sim_ivfpq_topk": IVFPQ_TOPK_SQL,
}
