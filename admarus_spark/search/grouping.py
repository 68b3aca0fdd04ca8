"""Result grouping with title-anchoring and small-group disbanding.

Ports the reference's grouping pipeline Spark-first:

- G1 ``is_grouping_result`` (``/root/reference/webui/src/result/format.rs:114-141``):
  a result may ANCHOR a group only when its *title* satisfies the whole
  query AST (boolean word-presence eval — no scores). Our corpus analog of
  a title is the document's first ``TITLE_TOKENS`` tokens (the heading).
- G2 group-by-path-prefix (``ranked.rs:116-139``): the group key is the
  result's directory (path prefix).
- G3 disband small groups (``ranked.rs:141-162``): groups with <= 3 children
  are merged back up — their members are emitted as individual results, as
  are all members of groups that never found an anchor (G1 fail).
- G4 group score = best member (``grouped.rs:28-31``).

Everything is DataFrame-native: the title-match AST eval compiles to a
Catalyst boolean over a token-array column (array_contains folds), the
group pass is one groupBy over the scored match set, and the disband pass
is a semi-join of members against the non-kept group keys (auto-broadcast:
group keys are orders of magnitude fewer than docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..query.ast import Filter, NAmong, Not, QueryComp, Word

TITLE_TOKENS = 8
MIN_GROUP_CHILDREN = 4  # groups with <= 3 children are disbanded (G3)


def compile_title_match(comp: QueryComp, toks: Column) -> Column:
    """Boolean AST eval over a token-array column (format.rs:114-141: the
    title must satisfy the query). Metadata filters never match a title."""
    if isinstance(comp, Word):
        return F.array_contains(toks, comp.word)
    if isinstance(comp, Filter):
        return F.lit(False)
    if isinstance(comp, Not):
        return ~compile_title_match(comp.comp, toks)
    if isinstance(comp, NAmong):
        hits = None
        for c in comp.among:
            h = compile_title_match(c, toks).cast("int")
            hits = h if hits is None else hits + h
        return hits >= F.lit(comp.n)
    raise TypeError(type(comp))


def group_anchored(
    results: DataFrame,
    titles: DataFrame,
    query_root: QueryComp,
    group_key: Column,
    limit: int | None = None,
) -> DataFrame:
    """Group scored results by ``group_key``; keep a group only when it is
    title-anchored (G1) and has > 3 members (G3); disband the rest into
    individual rows. Returns (key, score_r, members) ordered by
    (score_r desc, key asc).

    ``results``: (score, path, ...) — e.g. ``SearchEngine.search(q, None)``.
    ``titles``: (path, ttoks array<string>) title token arrays, keyed by the
    same path namespace (engine-internal doc ids are NOT the source table's
    ids — path is the stable join key).
    """
    tm = compile_title_match(query_root, F.col("ttoks"))
    # Join on (repo, path) when both sides carry repo — path alone fans out
    # across same-path repos; and LEFT join so a result path missing from
    # titles is still emitted (as a never-anchoring member) instead of being
    # silently dropped (ADVICE r2). A null title makes tm null -> false.
    join_keys = (
        ["repo", "path"]
        if "repo" in results.columns and "repo" in titles.columns
        else ["path"]
    )
    per = (
        results.join(titles, join_keys, "left")
        .withColumn("tm", F.coalesce(tm, F.lit(False)))
        .withColumn("grp", group_key)
        .select("grp", "path", "score", "tm")
    )
    g = per.groupBy("grp").agg(
        F.max("score").alias("best"),
        F.count("*").alias("members"),
        F.max(F.col("tm").cast("int")).alias("anch"),
    )
    keep_pred = (F.col("anch") == 1) & (F.col("members") >= MIN_GROUP_CHILDREN)
    kept = g.filter(keep_pred).select(
        F.col("grp").alias("key"),
        F.round("best", 9).alias("score_r"),
        "members",
    )
    disband_keys = g.filter(~keep_pred).select("grp")
    disbanded = per.join(disband_keys, "grp").select(
        F.col("path").alias("key"),
        F.round("score", 9).alias("score_r"),
        F.lit(1).cast("long").alias("members"),
    )
    out = kept.unionByName(disbanded).orderBy(F.desc("score_r"), F.asc("key"))
    return out.limit(limit) if limit is not None else out
