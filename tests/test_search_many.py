"""Batched search must produce per-query results identical to search()."""

QUERIES = {
    "hot": "license",
    "and2": "license AND parser",
    "quick_or": "parser lexer bloom",
    "nofm": "2(parser, lexer, bloom)",
    "notq": "parser AND NOT bloom",
    # metadata filter in a NOT subtree: stays on the BATCHED path (no
    # positive filter) but forces the needs_meta doc_dict join + the fold's
    # meta_exprs inside the exploded per-query struct projection
    "not_meta": "parser AND NOT lang=python",
    "rare": "rareterm000063z",
    "meta": "lang=python AND bloom",      # positive filter -> exact fallback
    "pure_meta": "lang=python",           # filter-only candidates -> fallback
    "missing": "nosuchterm",
}


def test_search_many_matches_single(docs_engine):
    batch = docs_engine.search_many(QUERIES, k=10).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_search_many_empty_batch(docs_engine):
    out = docs_engine.search_many({"none": "nosuchterm"}, k=5)
    assert out.count() == 0


def test_search_many_forced_pruning_matches_single(docs_engine):
    """With the posting-volume gate lowered, EVERY batched shape must still
    match its sequential result while the union masks prune the decode."""
    prev = docs_engine.batch_prune_min_postings
    docs_engine.batch_prune_min_postings = 0
    try:
        batch = docs_engine.search_many(QUERIES, k=10).collect()
    finally:
        docs_engine.batch_prune_min_postings = prev
    assert docs_engine.last_batch_prune is not None
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_search_many_wand_off_matches_single(docs_engine):
    """Forcing the full decode must not change batched results."""
    batch = docs_engine.search_many(QUERIES, k=10, wand="off").collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_search_many_batched_decode_prunes(docs_engine):
    """The PIVOT path's batched decode must skip blocks when member-query
    masks apply: a hot∧rare conjunction bounds the hot term's decode to the
    blocks holding the rare term's single posting (VERDICT r4 #2). The
    group-eval cap is zeroed to force the pivot path (whose mask machinery
    serves over-cap groups and metadata folds), and the posting-volume gate
    is lowered for the fixture-sized corpus."""
    prev = docs_engine.batch_prune_min_postings
    prev_cap = docs_engine.group_eval_max_bytes
    docs_engine.batch_prune_min_postings = 0
    docs_engine.group_eval_max_bytes = 0
    try:
        got = docs_engine.search_many(
            {"andrare": "license AND rareterm000063z"}, k=5
        ).collect()
    finally:
        docs_engine.batch_prune_min_postings = prev
        docs_engine.group_eval_max_bytes = prev_cap
    st = docs_engine.last_batch_prune
    assert st is not None
    assert 0 < st["blocks_kept"] < st["blocks_total"]
    single = [
        (r["doc_id"], r["score"])
        for r in docs_engine.search("license AND rareterm000063z", 5, wand="off").collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == single


def test_search_many_greedy_fallback_matches_single(docs_engine):
    """With the driver θ-probe disabled (batch_probe_max_df=0), every
    max-fold member must fall to the EXECUTOR-side per-term greedy and still
    match its sequential result — the zero-driver-cost path hot/uniform
    batches take at scale."""
    prev_gate, prev_cap, prev_ge = (
        docs_engine.batch_prune_min_postings, docs_engine.batch_probe_max_df,
        docs_engine.group_eval_max_bytes,
    )
    docs_engine.batch_prune_min_postings = 0
    docs_engine.batch_probe_max_df = 0
    docs_engine.group_eval_max_bytes = 0
    try:
        batch = docs_engine.search_many(QUERIES, k=10).collect()
    finally:
        docs_engine.batch_prune_min_postings = prev_gate
        docs_engine.batch_probe_max_df = prev_cap
        docs_engine.group_eval_max_bytes = prev_ge
    st = docs_engine.last_batch_prune
    assert st is not None and st["greedy_terms"] > 0
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_search_many_capped_probe_failure_degrades_to_greedy(docs_engine):
    """probe cap of 1: only the df-1 rare term's block is probe-eligible, so
    θ cannot reach k distinct docs — _bmw_masks_meta must return None and
    the member must degrade to greedy, never ship all-True masks."""
    prev_gate, prev_cap, prev_ge = (
        docs_engine.batch_prune_min_postings, docs_engine.batch_probe_max_df,
        docs_engine.group_eval_max_bytes,
    )
    docs_engine.batch_prune_min_postings = 0
    docs_engine.batch_probe_max_df = 1
    docs_engine.group_eval_max_bytes = 0
    try:
        got = docs_engine.search_many(
            {"skew": "license rareterm000063z"}, k=10
        ).collect()
    finally:
        docs_engine.batch_prune_min_postings = prev_gate
        docs_engine.batch_probe_max_df = prev_cap
        docs_engine.group_eval_max_bytes = prev_ge
    st = docs_engine.last_batch_prune
    assert st is not None and st["greedy_terms"] > 0
    single = [
        (r["doc_id"], r["score"])
        for r in docs_engine.search("license rareterm000063z", 10, wand="off").collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == single


def test_group_eval_routing_stats(docs_engine):
    """At defaults, every postings-only member routes to the executor-side
    group evaluation; members sharing terms coalesce into one group
    (connected components), so the shared blobs ship and decode once."""
    docs_engine.search_many(QUERIES, k=10).collect()
    st = docs_engine.last_group_eval
    assert st is not None
    # hot/and2/quick_or/nofm/notq/rare are postings-only; not_meta has a
    # filter in its fold (pivot), meta/pure_meta fall back, missing is
    # bloom-gated out
    assert st["members"] == 6
    # hot+and2 share 'license'; and2+quick_or+nofm+notq share parser/bloom
    # -> one component; 'rare' stands alone
    assert st["groups"] == 2


def test_group_eval_zero_cap_routes_all_to_pivot(docs_engine):
    """With the group byte cap at zero every group is 'over cap' and must
    take the distributed pivot path — results identical."""
    prev = docs_engine.group_eval_max_bytes
    docs_engine.group_eval_max_bytes = 0
    try:
        batch = docs_engine.search_many(QUERIES, k=10).collect()
    finally:
        docs_engine.group_eval_max_bytes = prev
    assert docs_engine.last_group_eval is None
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_group_members_connected_components():
    from admarus_spark.query.parser import parse_query
    from admarus_spark.search.group_eval import group_members

    members = {
        "a": parse_query("alpha AND beta"),
        "b": parse_query("beta OR gamma"),
        "c": parse_query("delta"),
        "d": parse_query("unindexedword"),
    }
    df = {"alpha": 3, "beta": 5, "gamma": 2, "delta": 1}
    comps = group_members(members, df)
    as_sets = sorted(tuple(c) for c in comps)
    # a-b share 'beta'; c alone; d has no indexed terms -> its own component
    assert as_sets == [("a", "b"), ("c",), ("d",)]


def test_group_eval_sharded_matches_single(docs_engine, monkeypatch):
    """Forced doc-range sharding (3 shards per group): every member's
    result must stay float-identical to the sequential path — per-shard
    top-ks are exact within their id range (BM25 is doc-local) and the
    merge window keeps the same (score desc, doc_id asc) order."""
    monkeypatch.setenv("SPARK_GRAFT_GROUP_EVAL_SHARDS", "3")
    batch = docs_engine.search_many(QUERIES, k=10).collect()
    st = docs_engine.last_group_eval
    assert st is not None
    assert st["sharded_groups"] == st["groups"] == 2
    assert st["tasks"] == 6
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_group_eval_many_shards_matches_single(docs_engine, monkeypatch):
    """More shards than docs-per-range granularity (8): empty shards and
    rows range-pruned out of most replicas must not change any result."""
    monkeypatch.setenv("SPARK_GRAFT_GROUP_EVAL_SHARDS", "8")
    batch = docs_engine.search_many(QUERIES, k=10).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        single = [
            (r["doc_id"], r["score"]) for r in docs_engine.search(q, 10, wand="off").collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_group_eval_shards_off_single_task_per_group(docs_engine, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GROUP_EVAL_SHARDS", "off")
    docs_engine.search_many(QUERIES, k=10).collect()
    st = docs_engine.last_group_eval
    assert st is not None
    assert st["tasks"] == st["groups"] and st["sharded_groups"] == 0
