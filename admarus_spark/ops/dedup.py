"""Deduplication operators over the documents table.

- exact: hash-groupBy on content (md5 — identical hex in Spark and DuckDB)
- MinHash + LSH banding: token-3-gram shingles → per-permutation min of a
  salted md5 (string min == 128-bit numeric min) → band buckets → candidate
  pairs via bucket self-join
- SimHash: 60-bit sign fingerprint from tf-weighted md5 bits of terms
- n-gram Jaccard: exact shingle-set Jaccard for pairs sharing >= 1 shingle

Scale notes: every operator is shuffle-on-key (content hash / shingle /
bucket), no driver-side loops; the shingle self-joins are bounded by LSH
banding (pairs come only from shared buckets, never a full cross join). md5
here is the *portable* hash for oracle parity; at 100 TB you would swap
``xxhash64`` in (same plan shape, one expression change — noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import make_tokenize_udf

NUM_PERM = 12
BAND_ROWS = 3          # 12 perms / 3 rows = 4 bands
JACCARD_THRESHOLD = 0.5

_TOK_EXPR_DUCK = (
    "list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'), t -> length(t) >= 3)"
)
# DuckDB 1-based lists; Spark 0-based arrays — same shingle stream.
_SHINGLES_DUCK = f"""
SELECT doc_id,
       unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
FROM (SELECT doc_id, {_TOK_EXPR_DUCK} AS t FROM documents)
WHERE len(t) >= 3
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) token-3-gram stream."""
    tok = make_tokenize_udf()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = d.select("doc_id", tok(F.col("text")).alias("t"))
    sh = F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", F.explode(sh).alias("shingle"))


# ----------------------------------------------------------------------
def exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash; keep_id = min doc_id per group."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.groupBy(F.md5("text").alias("content_md5"))  # scale: xxhash64("text")
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_id"))
    )


EXACT_SQL = """
SELECT md5(text) AS content_md5, count(*) AS cnt, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""


# ----------------------------------------------------------------------
def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band buckets: (doc_id, band, bucket)."""
    sh = _shingles(spark, sf_dir)
    perms = spark.range(NUM_PERM).withColumnRenamed("id", "p")
    sigs = (
        sh.crossJoin(perms)
        .groupBy("doc_id", "p")
        .agg(F.min(F.md5(F.concat_ws(":", F.col("p"), F.col("shingle")))).alias("sig"))
    )
    return (
        sigs.withColumn("band", (F.col("p") / F.lit(BAND_ROWS)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("p", "sig"))), lambda s: s["sig"]
                    ),
                    ",",
                )
            ).alias("bucket")
        )
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


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any LSH band bucket."""
    b = minhash_bands(spark, sf_dir)
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
    """60-bit SimHash from tf-weighted term-hash bits: (doc_id, simhash)."""
    tok = make_tokenize_udf()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = (
        d.select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    bits = tf.select(
        "doc_id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j")
    )
    nibble = F.expr("instr('0123456789abcdef', substring(h, CAST(j / 4 AS INT) + 1, 1)) - 1")
    bit = F.expr(
        "(CAST(instr('0123456789abcdef', substring(h, CAST(j / 4 AS INT) + 1, 1)) - 1 AS BIGINT)"
        " >> CAST(3 - j % 4 AS INT)) & 1"
    )
    v = bits.withColumn("contrib", F.col("tf") * (F.lit(2) * bit - F.lit(1)))
    return (
        v.groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("vj"))
        .withColumn("bitval", F.when(F.col("vj") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")).otherwise(F.lit(0)))
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


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
    """Exact Jaccard over distinct 3-gram shingle sets, for pairs sharing at
    least one shingle; emits pairs with jaccard >= threshold."""
    sh = _shingles(spark, sf_dir).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
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
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_DUCK})),
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
