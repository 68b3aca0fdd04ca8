"""G1/G3 grouping semantics (format.rs:114-141, ranked.rs:141-162):
title-anchored groups kept only above the disband threshold; everything
else emitted as individual results."""

from pyspark.sql import functions as F

from admarus_spark.query.parser import parse_query
from admarus_spark.search.grouping import (
    compile_title_match,
    group_anchored,
    group_walk,
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "path string, ttoks array<string>")


def test_group_anchored_keeps_and_disbands(spark):
    # dir a/: 4 members, one title-anchored       -> kept as a group
    # dir b/: 4 members, NO title anchor (G1)     -> disbanded
    # dir c/: 3 members, anchored but small (G3)  -> disbanded
    results = spark.createDataFrame(
        [(f"{d}/{i}", 1.0 + i / 10.0) for d in "abc" for i in range(4 if d != "c" else 3)],
        "path string, score double",
    )
    titles = _toks(
        spark,
        [(f"a/{i}", ["x"] if i else ["foo"]) for i in range(4)]
        + [(f"b/{i}", ["x"]) for i in range(4)]
        + [(f"c/{i}", ["foo"]) for i in range(3)],
    )
    out = group_anchored(
        results, titles, parse_query("foo").root, group_key=F.substring("path", 1, 1)
    ).collect()
    by_key = {r["key"]: r for r in out}
    assert by_key["a"]["members"] == 4 and by_key["a"]["score_r"] == 1.3
    assert "b" not in by_key and "c" not in by_key
    assert {k for k in by_key if k.startswith("b/")} == {f"b/{i}" for i in range(4)}
    assert {k for k in by_key if k.startswith("c/")} == {f"c/{i}" for i in range(3)}
    assert all(by_key[f"b/{i}"]["members"] == 1 for i in range(4))


def test_group_walk_longest_ancestor_and_disband_cascade(spark):
    """G2 walk (ranked.rs:107-162): members attach to the LONGEST anchored
    ancestor directory; small groups disband and their parent+members
    re-attach to the longest KEPT ancestor; surplus anchors in one directory
    become ordinary members; unattachable results stay individual."""
    rows = [
        ("a/b/idx", 5.0),    # anchor of a/b (outranked -> surplus member)
        ("a/b/idx2", 6.0),   # anchor of a/b (parent: higher score)
        ("a/b/m1", 1.0), ("a/b/m2", 2.0), ("a/b/m3", 3.0), ("a/b/m4", 4.0),
        ("a/b/c/idx", 2.5),  # anchor of a/b/c (1 child -> disbands)
        ("a/b/c/m5", 0.5),   # attaches to a/b/c (longest), not a/b
        ("z/q/f", 1.5),      # no anchored ancestor -> individual
    ]
    results = spark.createDataFrame(rows, "path string, score double")
    anchored = {"a/b/idx", "a/b/idx2", "a/b/c/idx"}
    titles = spark.createDataFrame(
        [(p, ["foo"] if p in anchored else ["x"]) for p, _ in rows],
        "path string, ttoks array<string>",
    )
    out = group_walk(results, titles, parse_query("foo").root).collect()
    got = {r["key"]: (r["score_r"], r["members"]) for r in out}
    # a/b keeps: 5 attached (m1-4 + surplus idx), then a/b/c's parent+member
    # re-attach on the disband walk -> 1 + 5 + 2 = 8 members, best score 6.0
    assert got == {"a/b": (6.0, 8), "z/q/f": (1.5, 1)}


def test_group_walk_no_kept_groups_all_individual(spark):
    results = spark.createDataFrame(
        [("a/b/idx", 2.0), ("a/b/m1", 1.0)], "path string, score double"
    )
    titles = spark.createDataFrame(
        [("a/b/idx", ["foo"]), ("a/b/m1", ["x"])], "path string, ttoks array<string>"
    )
    out = group_walk(results, titles, parse_query("foo").root).collect()
    assert sorted((r["key"], r["score_r"], r["members"]) for r in out) == [
        ("a/b/idx", 2.0, 1), ("a/b/m1", 1.0, 1)
    ]


def test_group_anchored_missing_title_and_repo_dup(spark):
    """ADVICE r2: a result whose path is missing from titles must still be
    emitted (as a disbanded singleton), and duplicate paths across repos must
    not fan the title join out when repo is present on both sides."""
    results = spark.createDataFrame(
        [("r1", "a/0", 1.0), ("r2", "a/0", 2.0), ("r1", "b/0", 3.0)],
        "repo string, path string, score double",
    )
    titles = spark.createDataFrame(
        [("r1", "a/0", ["foo"]), ("r2", "a/0", ["x"])],  # b/0 has no title row
        "repo string, path string, ttoks array<string>",
    )
    out = group_anchored(
        results, titles, parse_query("foo").root, group_key=F.substring("path", 1, 1)
    ).collect()
    # no group reaches 4 members -> everything disbands; no fanout
    # duplicates, and (r5) disbanded keys are repo-qualified — the bare
    # path would emit two indistinguishable "a/0" rows
    assert sorted((r["key"], r["score_r"]) for r in out) == [
        ("r1/a/0", 1.0), ("r1/b/0", 3.0), ("r2/a/0", 2.0)
    ]


def test_title_match_ast_shapes(spark):
    df = _toks(spark, [("p", ["alpha", "beta", "gamma"])])
    cases = [
        ("alpha AND beta", True),
        ("alpha AND delta", False),
        ("alpha AND NOT delta", True),
        ("2(alpha, delta, gamma)", True),
        ("2(alpha, delta, epsilon)", False),
        ("lang=en AND alpha", False),  # filters never satisfy a title
    ]
    for q, want in cases:
        got = df.select(
            compile_title_match(parse_query(q).root, F.col("ttoks")).alias("m")
        ).collect()[0]["m"]
        assert got == want, q


def test_group_walk_is_repo_scoped(spark):
    """Two repos share the directory name src/: repoA holds the anchor and
    enough members to keep its group; repoB's same-named directory must
    neither attach to repoA's group nor inflate its member count (r5
    review — the walk runs over the namespaced repo/path, making the repo
    the root segment of every group key)."""
    rows = [
        ("A", f"src/{n}", s)
        for n, s in [("idx", 9.0), ("m1", 1.0), ("m2", 2.0), ("m3", 3.0), ("m4", 4.0)]
    ] + [("B", "src/other1", 5.0), ("B", "src/other2", 6.0)]
    results = spark.createDataFrame(rows, "repo string, path string, score double")
    titles = spark.createDataFrame(
        [("A", "src/idx", ["foo"])]
        + [(r, p, ["x"]) for r, p, _ in rows if (r, p) != ("A", "src/idx")],
        "repo string, path string, ttoks array<string>",
    )
    out = group_walk(results, titles, parse_query("foo").root).collect()
    by_key = {r["key"]: r for r in out}
    assert by_key["A/src"]["members"] == 5  # anchor + 4 members, repoA ONLY
    assert by_key["B/src/other1"]["members"] == 1
    assert by_key["B/src/other2"]["members"] == 1
    assert len(out) == 3


def test_group_anchored_null_group_key_rows_survive(spark):
    """A nullable group_key expression must not silently drop rows: the
    null-key rows coalesce to their own singleton key and are emitted as
    disbanded individuals (r5 review — an equi-join on a null grp never
    matches)."""
    results = spark.createDataFrame(
        [("a/1", 1.0), ("a/2", 2.0), ("b/1", 3.0)], "path string, score double"
    )
    titles = _toks(spark, [("a/1", ["foo"]), ("a/2", ["x"]), ("b/1", ["x"])])
    gk = F.when(F.col("path").startswith("a/"), F.substring("path", 1, 1))
    out = group_anchored(
        results, titles, parse_query("foo").root, group_key=gk
    ).collect()
    keys = {r["key"] for r in out}
    assert "b/1" in keys  # null-key row emitted, not dropped
    assert {"a/1", "a/2"} <= keys  # anchored but small -> disbanded
    assert len(out) == 3


def test_group_anchored_disbanded_keys_repo_qualified(spark):
    """When the title join is (repo, path)-keyed, disbanded singleton keys
    carry the repo prefix — the bare path is ambiguous across repos (r5
    review)."""
    results = spark.createDataFrame(
        [("A", "p/1", 1.0), ("B", "p/1", 2.0)],
        "repo string, path string, score double",
    )
    titles = spark.createDataFrame(
        [("A", "p/1", ["x"]), ("B", "p/1", ["x"])],
        "repo string, path string, ttoks array<string>",
    )
    out = group_anchored(
        results,
        titles,
        parse_query("foo").root,
        group_key=F.concat_ws("/", F.col("repo"), F.substring("path", 1, 1)),
    ).collect()
    assert sorted(r["key"] for r in out) == ["A/p/1", "B/p/1"]


def test_group_walk_releases_cache(spark):
    """Grouping caches register in the caller's tracker (or the module
    registry) so a long-lived serving session can release them (r5 review:
    persist without an unpersist path leaks executor storage)."""
    from admarus_spark.search import grouping

    results = spark.createDataFrame([("a/b", 1.0)], "path string, score double")
    titles = _toks(spark, [("a/b", ["foo"])])
    tracker: list = []
    group_walk(results, titles, parse_query("foo").root, tracker=tracker).collect()
    assert len(tracker) == 3  # per, att, ratt
    for df in tracker:
        df.unpersist()

    grouping.release_cache()  # idempotent on an empty registry
    group_walk(results, titles, parse_query("foo").root).collect()
    assert len(grouping._LIVE_CACHE) == 3
    grouping.release_cache()
    assert grouping._LIVE_CACHE == []
