"""Deduplication operators over the documents table.

- exact: hash-groupBy on content (md5 — identical hex in Spark and DuckDB)
- MinHash + LSH banding: token-3-gram shingles → per-permutation min of a
  salted md5 (string min == 128-bit numeric min), ALL permutations in one
  groupBy pass → band buckets → candidate pairs via bucket self-join
- SimHash: 60-bit sign fingerprint from tf-weighted md5 bits of terms, all
  60 bit-sums as conditional aggregates in one pass
- n-gram Jaccard: shingle-set Jaccard for pairs sharing >= 1 kept shingle,
  with a df-cap dropping boilerplate shingles (bounds the self-join)

Scale notes: every operator is shuffle-on-key (content hash / shingle /
bucket), ONE pass over the shingle/tf stream each (no crossJoin/explode
multipliers), no driver-side loops; pair joins are bounded by LSH banding
or the shingle df-cap (never a full cross join). md5 here is the *portable*
hash for oracle parity; at 100 TB you would swap ``xxhash64`` in (same plan
shape, one expression change — noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import DUCKDB_TOKENS_EXPR, tokenize_expr
from ._scan import read_wide

NUM_PERM = 12
BAND_ROWS = 3          # 12 perms / 3 rows = 4 bands
JACCARD_THRESHOLD = 0.5
# shingles in more docs than this are boilerplate: excluded from the exact
# Jaccard op on BOTH engines (bounds the self-join at O(cap^2) per shingle)
MAX_SHINGLE_DF = 100

def _hash_col(col, method: str = "md5"):
    """The dedup signature/join hash. md5 (default) is the PORTABLE choice —
    identical hex in Spark and DuckDB, which the oracle-parity gate needs.
    At 100 TB pass ``hash_method='xxhash64'``: the JVM-native 64-bit hash
    skips the 32-hex-char string materialization per row — IDENTICAL plan
    shape and grouping structure, proven by
    tests/test_ops.py::test_dedup_hash_swap_xxhash64."""
    if method == "md5":
        return F.md5(col)
    if method == "xxhash64":
        return F.xxhash64(col).cast("string")
    raise ValueError(f"unknown hash method {method!r}")


# ONE definition of the tokenizer rule (tokenizer.py owns it; r5 review:
# a local copy could silently desynchronize the oracles from the engine)
_TOK_EXPR_DUCK = DUCKDB_TOKENS_EXPR.format(col="text")
# DuckDB 1-based lists; Spark 0-based arrays — same shingle stream.
_SHINGLES_DUCK = f"""
SELECT doc_id,
       unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
FROM (SELECT doc_id, {_TOK_EXPR_DUCK} AS t FROM documents)
WHERE len(t) >= 3
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) token-3-gram stream."""
    d = read_wide(spark, f"{sf_dir}/documents.parquet")
    t = d.select("doc_id", tokenize_expr(F.col("text")).alias("t"))
    sh = F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", F.explode(sh).alias("shingle"))


# ----------------------------------------------------------------------
def exact_groups(spark: SparkSession, sf_dir: str, hash_method: str = "md5") -> DataFrame:
    """Exact dedup: group by content hash; keep_id = min doc_id per group."""
    d = read_wide(spark, f"{sf_dir}/documents.parquet")
    return (
        d.groupBy(_hash_col(F.col("text"), hash_method).alias("content_md5"))
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_id"))
    )


EXACT_SQL = """
SELECT md5(text) AS content_md5, count(*) AS cnt, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""


# ----------------------------------------------------------------------
def minhash_bands(spark: SparkSession, sf_dir: str, hash_method: str = "md5") -> DataFrame:
    """LSH band buckets: (doc_id, band, bucket).

    Single-pass signatures: ONE groupBy over the shingle stream computes all
    NUM_PERM minima as conditional aggregates (map-side partial agg), instead
    of crossJoin(perms) which shuffles the shingle stream x NUM_PERM (the r1
    plan moved 12x the bytes for identical values). Banding stays a cheap
    4-element explode over the already-aggregated per-doc signature row."""
    sh = _shingles(spark, sf_dir)
    sig_aggs = [
        F.min(
            _hash_col(F.concat_ws(":", F.lit(str(p)), F.col("shingle")), hash_method)
        ).alias(f"sig_{p}")
        for p in range(NUM_PERM)
    ]
    sigs = sh.groupBy("doc_id").agg(*sig_aggs)
    n_bands = NUM_PERM // BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                _hash_col(
                    F.concat_ws(
                        ",",
                        *[F.col(f"sig_{p}") for p in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)],
                    ),
                    hash_method,
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


MINHASH_BANDS_SQL = f"""
WITH sh AS ({_SHINGLES_DUCK}),
sigs AS (
  SELECT doc_id, p, min(md5(CAST(p AS VARCHAR) || ':' || shingle)) AS sig
  FROM sh CROSS JOIN (SELECT unnest(range({NUM_PERM})) AS p)
  GROUP BY doc_id, p
)
SELECT doc_id, CAST(p // {BAND_ROWS} AS INT) AS band,
       md5(string_agg(sig, ',' ORDER BY p)) AS bucket
FROM sigs GROUP BY doc_id, p // {BAND_ROWS}
"""


def minhash_pairs(spark: SparkSession, sf_dir: str, hash_method: str = "md5") -> DataFrame:
    """Near-dup candidate pairs: docs sharing any LSH band bucket.

    The band table persists before the self-join (r6): Catalyst does not
    reuse the signature pipeline's exchanges between the two join sides
    (plans/r06 — same non-reuse the ngram op showed), so without the cache
    the whole tokenize → shingle → 12-way md5-min aggregation ran twice.
    Bounded: 4 rows per doc (band, bucket hashes only)."""
    b = minhash_bands(spark, sf_dir, hash_method).persist()
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


MINHASH_PAIRS_SQL = f"""
WITH bands AS ({MINHASH_BANDS_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


# ----------------------------------------------------------------------
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash from tf-weighted term-hash bits: (doc_id, simhash).

    Single-pass: all 60 bit-sums are conditional aggregates over the
    (doc, term, tf) table — per-j bit positions are compile-time constants,
    so the whole fingerprint is ONE whole-stage-codegen groupBy (the r1
    plan exploded each tf row x60 through two extra shuffles).

    r6: the 60 bits come from ONE ``conv`` of the md5's first 15 hex chars
    to a 60-bit integer plus shift/mask per bit, replacing 60 per-row
    instr+substring evaluations. Bit-exact: hex digit p (1-indexed)
    contributes its 2^s bit at integer position 4*(15-p)+s, so the old
    ``(digit(j//4+1) >> (3-j%4)) & 1`` equals ``(hv >> (59-j)) & 1``.
    Measured -35% on the aggregate stage at sf1.0."""
    d = read_wide(spark, f"{sf_dir}/documents.parquet")
    tf = (
        d.select("doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("hv", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"))
    )

    # expression STRINGS, not Column chains: 60 aggs plus a 60-branch
    # fingerprint fold built via Column operators cost ~600 py4j
    # round-trips — over 1 s of driver time per call, twice the job's
    # actual execution at sf0.1 (the same constant the engine's _score
    # eliminated in r5). One F.expr per agg and ONE for the fold.
    v_aggs = [
        F.expr(f"sum(tf * (2 * ((hv >> {59 - j}) & 1) - 1))").alias(f"v_{j}")
        for j in range(60)
    ]
    v = tf.groupBy("doc_id").agg(*v_aggs)
    fp_sql = " + ".join(
        f"(CASE WHEN v_{j} > 0 THEN {1 << j}L ELSE 0L END)" for j in range(60)
    )
    return v.select("doc_id", F.expr(f"CAST(({fp_sql}) AS BIGINT)").alias("simhash"))


SIMHASH_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({_TOK_EXPR_DUCK}) AS term FROM documents)
  GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id, tf, md5(term) AS h, j
  FROM tf CROSS JOIN (SELECT unnest(range(60)) AS j)
),
v AS (
  SELECT doc_id, j,
         sum(tf * (2 * (((strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
                         >> CAST(3 - j % 4 AS INT)) & 1) - 1)) AS vj
  FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
       sum(CASE WHEN vj > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)::BIGINT AS simhash
FROM v GROUP BY doc_id
"""


# ----------------------------------------------------------------------
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard over distinct 3-gram shingle sets for pairs sharing at least
    one shingle, with a document-frequency CAP on shingles: shingles present
    in more than MAX_SHINGLE_DF docs (boilerplate — license headers, common
    idioms) are excluded from BOTH the intersection computation and the set
    sizes. Without the cap the per-shingle pair fan-out is O(df^2) per hot
    shingle — a single million-doc boilerplate shingle alone would dominate
    the whole job at corpus scale; with it, per-shingle work is bounded by
    MAX_SHINGLE_DF^2. Standard practice for near-dup mining; the DuckDB
    oracle applies the identical cap.

    r6 plan (same values, one shingle pass): the previous shape — distinct
    stream → hot-shingle anti-join → 900k-row broadcast self-join, with the
    sizes aggregate re-reading the stream — recomputed the whole tokenize →
    distinct → cap chain FOUR times (Catalyst reused none of the identical
    exchanges across the branches; plans/r06). Now ONE groupBy(shingle)
    builds the capped shingle → doc-set table (collect_set dedups per-doc
    shingle repeats, the size filter IS the df cap) and persists it —
    bounded at ≤ cap ids per kept shingle — and every consumer derives
    from the cache: the kept (shingle, doc_id) stream by explode, sizes
    and the pair self-join from that stream. The explode preserves the
    groupBy's hash partitioning on shingle, so the self-join adds no new
    exchange for its equi-key. The sizes attach stays a plain equi-join so
    the planner can broadcast locally but fall back at corpus scale."""
    sh = _shingles(spark, sf_dir)
    g = (
        sh.groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") <= MAX_SHINGLE_DF)
    ).persist()
    kept = g.select("shingle", F.explode("docs").alias("doc_id"))
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard_r",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 9),
        )
        .filter(F.col("jaccard_r") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard_r")
    )


NGRAM_JACCARD_SQL = f"""
WITH sh0 AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_DUCK})),
kept AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {MAX_SHINGLE_DF}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)),
sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, round(i / (sa.sz + sb.sz - i), 9) AS jaccard_r
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / (sa.sz + sb.sz - i), 9) >= {JACCARD_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": exact_groups,
    "dedup_minhash_bands": minhash_bands,
    "dedup_minhash_pairs": minhash_pairs,
    "dedup_simhash": simhash,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
}

ORACLES = {
    "dedup_exact": EXACT_SQL,
    "dedup_minhash_bands": MINHASH_BANDS_SQL,
    "dedup_minhash_pairs": MINHASH_PAIRS_SQL,
    "dedup_simhash": SIMHASH_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
}
