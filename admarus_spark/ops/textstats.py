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

from ..tokenizer import DUCKDB_TOKENS_EXPR, tokenize_expr
from ._scan import read_wide

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "and", "for", "with", "this", "that"),
    "es": ("los", "las", "que", "por", "con", "para"),
    "fr": ("les", "des", "une", "est", "dans", "pour"),
    "zh": ("zhe", "shi", "bu", "wo", "ni", "hao"),
}

# ONE definition of the tokenizer rule (tokenizer.py owns it; r5 review)
_TOK_EXPR_DUCK = DUCKDB_TOKENS_EXPR.format(col="text")


def _tok_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_wide(spark, f"{sf_dir}/documents.parquet")
    return d.select("doc_id", "text", tokenize_expr(F.col("text")).alias("t"))


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


# ----------------------------------------------------------------------
# Character-trigram language ID (Cavnar/Trenkle-style profile scoring).
#
# The reference's P3 derives a document's language from the document itself
# (daemon HTML `lang` attr extraction); the training-data analog is a
# content-derived classifier rather than trusting an input column. Profiles
# are built ONCE at import from literal seed text: per language, the most
# discriminative [a-z ] trigrams (frequency margin over every other
# language) with their seed frequencies as weights. Scoring is one
# Catalyst-only scan — per trigram an occurrence count via
# length(lower(text)) - length(replace(...)), then a fixed-order weighted
# sum per language and a strict argmax (ties / all-zero -> 'unknown',
# lexicographically-smallest wins). The identical SQL fragment runs on both
# engines (Spark F.expr == DuckDB), so float order is pinned by
# construction. At 100 TB this is a narrow projection over one scan: no
# shuffle, no UDF, ~N_LANGS*N_TRIGRAMS string scans per row.

_LANG_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it walks with "
        "their friends because there is nothing that they would rather do "
        "this evening when the work is finished and everything has been said"
    ),
    "fr": (
        "le renard brun saute par dessus le chien paresseux et ensuite il "
        "marche avec ses amis parce que rien ne lui ferait plus plaisir ce "
        "soir quand le travail est fini et que tout a ete dit dans la maison"
    ),
    "de": (
        "der schnelle braune fuchs springt uber den faulen hund und dann "
        "geht er mit seinen freunden weil es nichts gibt was sie lieber tun "
        "wurden an diesem abend wenn die arbeit fertig ist und alles gesagt"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego "
        "camina con sus amigos porque no hay nada que prefieran hacer esta "
        "noche cuando el trabajo esta terminado y todo ha sido dicho en casa"
    ),
}
_NGRAM_TOP = 12


def _trigram_freqs(text: str) -> dict[str, float]:
    grams: dict[str, int] = {}
    for i in range(len(text) - 2):
        g = text[i : i + 3]
        if all(c == " " or "a" <= c <= "z" for c in g):
            grams[g] = grams.get(g, 0) + 1
    total = sum(grams.values())
    return {g: c / total for g, c in grams.items()}


def _build_lang_profiles() -> dict[str, list[tuple[str, float]]]:
    """Deterministic: for each language the _NGRAM_TOP trigrams with the
    largest frequency margin over every other seed, weight = round(seed
    frequency, 6). Trigrams are [a-z ]-only, so they embed verbatim in SQL."""
    freqs = {lg: _trigram_freqs(s) for lg, s in _LANG_SEEDS.items()}
    out: dict[str, list[tuple[str, float]]] = {}
    for lg, f in freqs.items():
        margin = {
            g: p - max((freqs[o].get(g, 0.0) for o in freqs if o != lg), default=0.0)
            for g, p in f.items()
        }
        top = sorted(margin, key=lambda g: (-margin[g], g))[:_NGRAM_TOP]
        out[lg] = [(g, round(f[g], 6)) for g in sorted(top)]
    return out


LANG_PROFILES = _build_lang_profiles()


def _ngram_score_sql(lang: str) -> str:
    """One language's weighted trigram score over lower(text) — the SAME
    string is compiled by Spark (F.expr) and DuckDB, pinning float order."""
    terms = [
        f"{w} * (CAST(length(lower(text)) - length(replace(lower(text), '{g}', '')) "
        f"AS DOUBLE) / 3.0)"
        for g, w in LANG_PROFILES[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, s_de, s_en, s_es, s_fr): content-derived trigram
    language ID. Scores rounded to 9dp (repo float-oracle convention)."""
    d = read_wide(spark, f"{sf_dir}/documents.parquet")
    langs = sorted(LANG_PROFILES)
    scored = d.select(
        "doc_id",
        *[F.round(F.expr(_ngram_score_sql(lg)), 9).alias(f"s_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when((best > 0) & (F.col(f"s_{lg}") == best), F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("lang_pred"), *[f"s_{lg}" for lg in langs]
    )


def _langid_ngram_sql() -> str:
    langs = sorted(LANG_PROFILES)
    cols = ",\n       ".join(
        f"round({_ngram_score_sql(lg)}, 9) AS s_{lg}" for lg in langs
    )
    best = "greatest({})".format(", ".join(f"s_{lg}" for lg in langs))
    pred = "CASE"
    for lg in langs:
        pred += f" WHEN {best} > 0 AND s_{lg} = {best} THEN '{lg}'"
    pred += " ELSE 'unknown' END"
    score_cols = ", ".join(f"s_{lg}" for lg in langs)
    return f"""
WITH scored AS (
  SELECT doc_id, {cols} FROM documents
)
SELECT doc_id, {pred} AS lang_pred, {score_cols} FROM scored
"""


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
    # explicit whitespace class, NOT \s: Java regex \s includes \x0B
    # (vertical tab) while DuckDB's RE2 \s does not — a document containing
    # one would value-diverge from the oracle (r5 review). The same class
    # spelled out on both sides is dialect-proof.
    ws = F.size(
        F.filter(F.split("text", "[ \\t\\n\\f\\r]+"), lambda x: x != F.lit(""))
    ).cast("long")
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
       len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'), x -> x != ''))::BIGINT AS n_ws
FROM documents
"""


# ----------------------------------------------------------------------
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fingerprint): winnowing-style min-hash over token-3-gram
    shingles (rolling window of the token stream; md5 as the portable hash).
    The shingle stream is dedup's — ONE definition of the parity-critical
    expression on each engine (r5 review: four drifting copies before)."""
    from .dedup import _shingles

    ex = _shingles(spark, sf_dir)
    return ex.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


def _fingerprint_sql() -> str:
    from .dedup import _SHINGLES_DUCK

    return f"""
SELECT doc_id, min(md5(shingle)) AS fingerprint
FROM ({_SHINGLES_DUCK})
GROUP BY doc_id
"""


FINGERPRINT_SQL = _fingerprint_sql()


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
        read_wide(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", tokenize_expr(F.col("text")).alias("t"))
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
    "text_lang_ngram": lang_id_ngram,
    "text_common_words": common_words,
    "text_quality": quality,
    "text_token_counts": token_counts,
    "text_fingerprint": fingerprint,
}

ORACLES = {
    "text_lang_id": _langid_sql(),
    "text_lang_ngram": _langid_ngram_sql(),
    "text_common_words": _common_words_sql(),
    "text_quality": QUALITY_SQL,
    "text_token_counts": TOKEN_COUNTS_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
}
