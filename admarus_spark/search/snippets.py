"""Best-snippet selection (P5) with parity to the reference.

Reference ``extract_score`` (``/root/reference/daemon/src/documents.rs:131-163``):
fragments are candidate text pieces (DOM text nodes there; LINES of the file
here — the plain-text analog for source code); fragments of byte length
<= 50 or >= 350 are skipped; a fragment is tokenized by splitting on
non-ASCII-alphanumeric, keeping len >= 3, lowercasing; score = 4 if the
FIRST token is a positive query term, + 1 per positive term present among
the remaining tokens; the best strictly-greater score wins (earliest
fragment on ties); no fragment scoring > 0 -> no extract.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLIT = re.compile(r"[^0-9a-zA-Z]+")


def extract_score(fragment: str, positive_terms: list[str]) -> int:
    """documents.rs:131-147, exactly (split, len>=3 filter, then lowercase)."""
    words = [w.lower() for w in _SPLIT.split(fragment) if len(w) >= 3]
    if not words:
        return 0
    first, rest = words[0], words[1:]
    score = 4 if first in positive_terms else 0
    for t in positive_terms:
        if t in rest:
            score += 1
    return score


def best_extract(content: str, positive_terms: list[str]) -> str | None:
    """documents.rs:148-166 over line fragments; byte-length bounds 51..349."""
    best, best_score = None, 0
    for fragment in content.split("\n"):
        blen = len(fragment.encode("utf-8"))
        if blen >= 350 or blen <= 50:
            continue
        s = extract_score(fragment, positive_terms)
        if s > best_score:
            best_score = s
            best = fragment
    return best


def with_snippets(results: DataFrame, docs: DataFrame, positive_terms: list[str]) -> DataFrame:
    """Attach the best extract to top-k results. ``docs`` is the source table
    (repo, path, content); the join touches only the k winners (broadcast),
    the snippet scoring is an Arrow-batched pandas UDF over k rows.

    A winner whose (repo, path) is missing from ``docs`` (a stale or subset
    source table — e.g. re-read after an incremental update replaced the
    path) is emitted with ``extract`` null rather than silently dropped from
    the top-k (r5 review; the big side cannot sit on the preserved side of
    an outer broadcast join, so the missing winners come back via a k-row
    anti-join union instead)."""
    terms = list(positive_terms)

    @F.pandas_udf(T.StringType())
    def snippet_udf(contents: pd.Series) -> pd.Series:
        return contents.map(lambda c: best_extract(c or "", terms))

    joined = docs.select("repo", "path", "content").join(
        F.broadcast(results), ["repo", "path"]
    )
    # a source table carrying a (repo, path) twice (base snapshot unioned
    # with a re-crawled delta) must not fan a winner out into duplicate
    # result rows: keep one deterministic content per key. Dedup AFTER the
    # join — it runs over ~k rows, not the whole docs table.
    w = Window.partitionBy("repo", "path").orderBy(F.desc("content"))
    joined = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    found = joined.withColumn("extract", snippet_udf(F.col("content"))).drop("content")
    cols = [c for c in results.columns] + ["extract"]
    missing = results.join(
        F.broadcast(found.select("repo", "path")), ["repo", "path"], "left_anti"
    ).withColumn("extract", F.lit(None).cast("string"))
    return (
        found.select(*cols)
        .unionByName(missing.select(*cols))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
