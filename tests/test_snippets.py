"""Snippet extraction (P5) parity: documents.rs:131-163 semantics."""

from admarus_spark.query.parser import parse_query
from admarus_spark.search.snippets import best_extract, extract_score


def test_extract_score_reference_semantics():
    terms = ["hunger", "games"]
    # first word match -> +4; presence in the rest -> +1 each
    frag = "hunger was the first word and games follow with more hunger"
    assert extract_score(frag, terms) == 4 + 1 + 1  # first=hunger(+4), games(+1), hunger in rest(+1)
    # split-then-filter-then-lowercase: len<3 words dropped BEFORE first-word pick
    assert extract_score("a hunger strike", ["hunger"]) == 4  # 'a' dropped, first='hunger'
    assert extract_score("", ["x"]) == 0
    assert extract_score("nothing relevant here", ["hunger"]) == 0


def test_best_extract_bounds_and_ties():
    terms = ["needle"]
    short = "needle"  # <= 50 bytes -> skipped
    good_a = "the needle fragment " + "x" * 40  # first >50b with score 1
    good_b = "needle first word here " + "y" * 40  # score 4, later
    content = "\n".join([short, good_a, good_b])
    assert best_extract(content, terms) == good_b
    # strictly-greater wins: equal-score later fragment does NOT replace
    tie_a = "xxx the needle appears here " + "p" * 30
    tie_b = "yyy another needle mention " + "q" * 30
    assert extract_score(tie_a, terms) == extract_score(tie_b, terms) == 1
    assert best_extract("\n".join([tie_a, tie_b]), terms) == tie_a
    # nothing scores -> None
    assert best_extract("irrelevant " + "q" * 60, terms) is None
    # >= 350 bytes skipped
    big = "needle " + "w" * 360
    assert best_extract(big, terms) is None


def test_engine_snippets(docs_engine, spark, docs_pdf):
    docs = spark.createDataFrame(docs_pdf)
    q = "parser AND lexer"
    res = docs_engine.search_with_snippets(q, docs, k=5).collect()
    assert len(res) > 0
    terms = parse_query(q).positive_terms()
    # exact parity with the python oracle on the same content
    content_by_path = dict(zip(docs_pdf["path"], docs_pdf["content"]))
    for r in res:
        want = best_extract(content_by_path[r["path"]], terms)
        assert r["extract"] == want


def test_weighted_terms():
    q = parse_query("aaa AND 2(bbb, ccc) AND lang=en")
    # clone_only_words strips the filter (n 3->2), weights divide by fan-out
    wt = dict(q.weighted_terms())
    assert wt["aaa"] == 0.5
    assert wt["bbb"] == 0.25 and wt["ccc"] == 0.25


def test_with_snippets_missing_doc_emits_null_extract(spark):
    """A top-k winner whose (repo, path) is absent from the docs table — a
    stale or subset source — must be emitted with extract=null, not
    silently dropped from the top-k (r5 review)."""
    from admarus_spark.search.snippets import with_snippets

    results = spark.createDataFrame(
        [(1, 2.0, "r", "a.py"), (2, 1.0, "r", "gone.py")],
        "doc_id long, score double, repo string, path string",
    )
    frag = "the needle fragment " + "x" * 40
    docs = spark.createDataFrame(
        [("r", "a.py", frag)], "repo string, path string, content string"
    )
    rows = with_snippets(results, docs, ["needle"]).collect()
    assert [r["path"] for r in rows] == ["a.py", "gone.py"]  # score desc
    assert rows[0]["extract"] == frag
    assert rows[1]["extract"] is None


def test_with_snippets_duplicate_doc_rows_do_not_fan_out(spark):
    """A source table carrying the same (repo, path) twice — e.g. a base
    snapshot unioned with a re-crawled delta — must not duplicate a top-k
    winner in the output; one deterministic content row wins."""
    from admarus_spark.search.snippets import with_snippets

    results = spark.createDataFrame(
        [(1, 2.0, "r", "a.py")],
        "doc_id long, score double, repo string, path string",
    )
    frag_a = "the needle fragment aaaa " + "x" * 40
    frag_b = "the needle fragment bbbb " + "x" * 40
    docs = spark.createDataFrame(
        [("r", "a.py", frag_a), ("r", "a.py", frag_b)],
        "repo string, path string, content string",
    )
    rows = with_snippets(results, docs, ["needle"]).collect()
    assert len(rows) == 1
    # deterministic winner: lexicographically greatest content
    assert rows[0]["extract"] == frag_b
