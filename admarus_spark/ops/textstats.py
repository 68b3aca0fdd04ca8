"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

``quality`` ports the reference's logistic length score exactly
(``/root/reference/webui/src/result/scores.rs:89-98``:
``1/(1+exp(-0.017*(len-250)))``, clamped to 1.0 at >= 0.995) and combines it
with a punctuation-ratio penalty. Language ID is a stopword-hit heuristic
(argmax over per-language stopword counts, ties/zero -> 'unknown' /
lexicographically-smallest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenizer import make_tokenize_udf

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "and", "for", "with", "this", "that"),
    "es": ("los", "las", "que", "por", "con", "para"),
    "fr": ("les", "des", "une", "est", "dans", "pour"),
    "zh": ("zhe", "shi", "bu", "wo", "ni", "hao"),
}

_TOK_EXPR_DUCK = (
    "list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'), t -> length(t) >= 3)"
)


def _tok_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = make_tokenize_udf()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", "text", tok(F.col("text")).alias("t"))


# ----------------------------------------------------------------------
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred): strict-argmax stopword hits; 0 hits -> unknown,
    ties -> lexicographically smallest language among the maxima."""
    base = _tok_df(spark, sf_dir).select("doc_id", F.explode_outer("t").alias("term"))
    aggs = [
        F.sum(F.when(F.col("term").isin(list(words)), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    counts = base.groupBy("doc_id").agg(*aggs)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"c_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when((best > 0) & (F.col(f"c_{lg}") == best), F.lit(lg)).otherwise(pred)
    return counts.select("doc_id", pred.alias("lang_pred"))


def _langid_sql() -> str:
    langs = sorted(LANG_STOPWORDS)
    cols = ",\n       ".join(
        "sum(CASE WHEN term IN ({}) THEN 1 ELSE 0 END) AS c_{}".format(
            ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lg]), lg
        )
        for lg in langs
    )
    best = "greatest({})".format(", ".join(f"c_{lg}" for lg in langs))
    pred = "CASE"
    for lg in langs:
        pred += f" WHEN {best} > 0 AND c_{lg} = {best} THEN '{lg}'"
    pred += " ELSE 'unknown' END"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_concat({_TOK_EXPR_DUCK}, [NULL])) AS term FROM documents
),
counts AS (
  SELECT doc_id, {cols}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {pred} AS lang_pred FROM counts
"""


# ----------------------------------------------------------------------
def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio_r, length_score_r, quality_r)."""
    d = _tok_df(spark, sf_dir)
    n_tok = F.size("t").cast("long")
    n_chars = F.length("text").cast("double")
    punct = (F.length("text") - F.length(F.regexp_replace("text", "[^0-9a-zA-Z ]", ""))).cast("double")
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    raw = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-0.017) * (n_tok.cast("double") - F.lit(250.0))))
    length_score = F.when(raw >= 0.995, F.lit(1.0)).otherwise(raw)  # scores.rs:96
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio_r"),
        F.round(length_score, 6).alias("length_score_r"),
        F.round(length_score * (F.lit(1.0) - punct_ratio), 6).alias("quality_r"),
    )


QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({_TOK_EXPR_DUCK})::BIGINT AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         (length(text) - length(regexp_replace(text, '[^0-9a-zA-Z ]', '', 'g')))::DOUBLE AS punct
  FROM documents
),
sc AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         1.0 / (1.0 + exp(-0.017 * (n_tokens::DOUBLE - 250.0))) AS raw
  FROM base
)
SELECT doc_id, n_tokens,
       round(punct_ratio, 6) AS punct_ratio_r,
       round(CASE WHEN raw >= 0.995 THEN 1.0 ELSE raw END, 6) AS length_score_r,
       round((CASE WHEN raw >= 0.995 THEN 1.0 ELSE raw END) * (1.0 - punct_ratio), 6) AS quality_r
FROM sc
"""


# ----------------------------------------------------------------------
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_ws): engine tokens, distinct terms,
    raw whitespace-split tokens."""
    d = _tok_df(spark, sf_dir)
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))).cast("long")
    return d.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
        ws.alias("n_ws"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len({_TOK_EXPR_DUCK})::BIGINT AS n_tokens,
       len(list_distinct({_TOK_EXPR_DUCK}))::BIGINT AS n_distinct,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))::BIGINT AS n_ws
FROM documents
"""


# ----------------------------------------------------------------------
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fingerprint): winnowing-style min-hash over token-3-gram
    shingles (rolling window of the token stream; md5 as the portable hash)."""
    d = _tok_df(spark, sf_dir)
    sh = F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"),
    ).otherwise(F.array().cast("array<string>"))
    ex = d.select("doc_id", F.explode(sh).alias("shingle"))
    return ex.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


FINGERPRINT_SQL = f"""
SELECT doc_id, min(md5(shingle)) AS fingerprint
FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM (SELECT doc_id, {_TOK_EXPR_DUCK} AS t FROM documents)
  WHERE len(t) >= 3
)
GROUP BY doc_id
"""


# Embedded common-English word list (stand-in for the reference's build-time
# downloaded top-5000 list, word-lists/build.rs:1-31 — no downloads here).
COMMON_EN = (
    "the and for are but not you all any can had her was one our out day get "
    "has him his how man new now old see two way who boy did its let put say "
    "she too use that with have this will your from they know want been good "
    "much some time very when come here just like long make many more only "
    "over such take than them well were what".split()
)


def common_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 common-words ratio (documents.rs:254-266): byte share of common-EN
    tokens among all token bytes; only computed for lang='en' docs (the
    reference has word lists for English only), NULL otherwise."""
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", make_tokenize_udf()(F.col("text")).alias("t"))
        .select("doc_id", "lang", F.explode_outer("t").alias("term"))
    )
    agg = base.groupBy("doc_id", "lang").agg(
        F.sum(F.when(F.col("term").isin(COMMON_EN), F.length("term")).otherwise(0)).alias("common"),
        F.sum(F.when(~F.col("term").isin(COMMON_EN), F.length("term")).otherwise(0)).alias("uncommon"),
    )
    ratio = F.when(
        (F.col("lang") == "en") & ((F.col("common") + F.col("uncommon")) > 0),
        F.round(F.col("common").cast("double") / (F.col("common") + F.col("uncommon")), 9),
    )
    return agg.select("doc_id", ratio.alias("common_ratio_r"))


def _common_words_sql() -> str:
    lst = ", ".join(f"'{w}'" for w in COMMON_EN)
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_concat({_TOK_EXPR_DUCK}, [NULL])) AS term FROM documents
),
agg AS (
  SELECT doc_id, lang,
         sum(CASE WHEN term IN ({lst}) THEN length(term) ELSE 0 END) AS common,
         sum(CASE WHEN term IS NOT NULL AND term NOT IN ({lst}) THEN length(term) ELSE 0 END) AS uncommon
  FROM toks GROUP BY doc_id, lang
)
SELECT doc_id,
       CASE WHEN lang = 'en' AND common + uncommon > 0
            THEN round(common::DOUBLE / (common + uncommon), 9) END AS common_ratio_r
FROM agg
"""


QUERIES = {
    "text_lang_id": lang_id,
    "text_common_words": common_words,
    "text_quality": quality,
    "text_token_counts": token_counts,
    "text_fingerprint": fingerprint,
}

ORACLES = {
    "text_lang_id": _langid_sql(),
    "text_common_words": _common_words_sql(),
    "text_quality": QUALITY_SQL,
    "text_token_counts": TOKEN_COUNTS_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
}
