"""Oracle semantics sanity (the reference-derived assertions, SURVEY.md §5)."""

import math

from admarus_spark.oracle import OracleIndex, bm25_idf


def test_priorities_relevance_order(movies_oracle):
    # kamilata/tests/priorities.rs:82-92 — the fully-matching doc ranks above
    # the partially-matching one under relevance ordering (BM25 fold).
    res = movies_oracle.search("perfectly matching", 10)
    ids = [d for d, _ in res]
    perfect = movies_oracle.docs.index[
        movies_oracle.docs.content.str.startswith("Perfect match")
    ][0]
    partial = movies_oracle.docs.index[
        movies_oracle.docs.content.str.startswith("Partial match")
    ][0]
    assert ids.index(perfect) < ids.index(partial)


def test_hunger_recall(movies_oracle):
    # kamilata/tests/search.rs:60-74 — result set contains every doc whose
    # token list contains 'hunger' (single-node: 100% recall, >= the 50% bar)
    want = set(movies_oracle.postings["hunger"][0].tolist())
    got = {d for d, _ in movies_oracle.search("hunger", k=10**9)}
    assert got == want


def test_or_is_max(docs_oracle):
    a = dict(docs_oracle.search("parser", 10**9))
    b = dict(docs_oracle.search("lexer", 10**9))
    both = dict(docs_oracle.search("parser / lexer", 10**9))
    for d, s in both.items():
        assert math.isclose(s, max(a.get(d, 0.0), b.get(d, 0.0)), rel_tol=0, abs_tol=0)


def test_and_is_mean_and_gated(docs_oracle):
    a = dict(docs_oracle.search("parser", 10**9))
    b = dict(docs_oracle.search("lexer", 10**9))
    both = dict(docs_oracle.search("parser AND lexer", 10**9))
    assert set(both) == set(a) & set(b)
    for d, s in both.items():
        assert s == (sorted([a[d], b[d]], reverse=True)[0] + sorted([a[d], b[d]], reverse=True)[1]) / 2.0


def test_not_excludes(docs_oracle):
    base = {d for d, _ in docs_oracle.search("parser", 10**9)}
    without = {d for d, _ in docs_oracle.search("parser AND NOT bloom", 10**9)}
    bloom = set(docs_oracle.postings["bloom"][0].tolist())
    assert without == base - bloom


def test_nofm_gate(docs_oracle):
    res = {d for d, _ in docs_oracle.search("2(parser, lexer, bloom)", 10**9)}
    p = set(docs_oracle.postings["parser"][0].tolist())
    l = set(docs_oracle.postings["lexer"][0].tolist())
    b = set(docs_oracle.postings["bloom"][0].tolist())
    want = (p & l) | (p & b) | (l & b)
    assert res == want


def test_filter_gates(docs_oracle):
    res = docs_oracle.search("lang=python AND bloom", 10**9)
    langs = docs_oracle.meta["lang"]
    blo = set(docs_oracle.postings["bloom"][0].tolist())
    assert {d for d, _ in res} == {d for d in blo if langs[d] == "python"}
    # filter halves the AND mean (predicate scores 0)
    solo = dict(docs_oracle.search("bloom", 10**9))
    for d, s in res:
        assert s == solo[d] / 2.0


def test_idf_formula():
    assert bm25_idf(100, 10) == float(math.log(1.0 + (100.0 - 10.0 + 0.5) / (10.0 + 0.5)))


def test_tiebreak_doc_id_asc(movies_oracle):
    res = movies_oracle.search("hunger", 10**9)
    for (d1, s1), (d2, s2) in zip(res, res[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)
