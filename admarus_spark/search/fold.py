"""Compile the query AST into Spark SQL expression strings (JVM-side fold).

The reference evaluates the AST per candidate doc in Rust
(``/root/reference/daemon/src/query/matching.rs:43-66``). Here the same fold
becomes a Catalyst expression tree over per-term score columns — whole-stage
codegen, no Python in the scoring hot path.

The compiler emits SQL STRINGS (one ``F.expr`` per query at the call site)
rather than building Column objects: every Column operator is a py4j socket
round-trip, and a 10-query batch over a ~30-term union was measured at
~6,900 round-trips ≈ 1.9 s of driver-side plan construction — a constant
that neither executor count nor cluster size can shrink (BENCH/
QUERY_DECOMP.json). The parsed expression trees are identical, so float
results are bit-identical (verified by the engine==oracle e2e suite).

Semantics (pinned, SURVEY.md §7.3 + oracle.py):

- Word    -> B: term score > 0;            S: the BM25 term score column
- Filter  -> B: metadata column == value;  S: 0.0 (predicates gate, not score)
- Not(c)  -> B: NOT B(c);                  S: 0.0
- NAmong  -> B: at least n children match; S: sum of the n largest matched
             child scores (descending-order left fold — pinned float order,
             identical to the oracle) / n

Float parity: the only operations are IEEE +,*,/ and comparisons on float64,
performed in the same order as the NumPy oracle — bit-identical results.
Double literals are emitted as ``repr(v) + "D"``: Python's shortest
round-trip repr parses back to the identical IEEE double in the JVM.
"""

from __future__ import annotations

from ..query.ast import Filter, NAmong, Not, QueryComp, Word


def sql_quote(v: str) -> str:
    """Single-quoted SQL string literal (quotes doubled, backslashes escaped
    — Spark's parser treats backslash as an escape inside string literals)."""
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def dlit(v: float) -> str:
    """Spark SQL double literal: shortest round-trip repr + D suffix."""
    return f"{float(v)!r}D"


def compile_fold(
    comp: QueryComp,
    term_cols: dict[str, str],
    meta_cols: dict[str, str],
) -> tuple[str, str]:
    """Returns (B, S): boolean-match and float64-score SQL expressions over
    the column expressions in ``term_cols`` / ``meta_cols`` (themselves SQL
    strings, e.g. ``coalesce(_s_3, 0.0D)`` / a metadata column name)."""
    if isinstance(comp, Word):
        s = term_cols.get(comp.word)
        if s is None:
            return "false", "0.0D"
        return f"({s} > 0.0D)", s
    if isinstance(comp, Filter):
        col = meta_cols.get(comp.name)
        if col is None:
            return "false", "0.0D"
        return f"coalesce({col} = {sql_quote(comp.value)}, false)", "0.0D"
    if isinstance(comp, Not):
        b, _ = compile_fold(comp.comp, term_cols, meta_cols)
        return f"(NOT {b})", "0.0D"
    if isinstance(comp, NAmong):
        children = [compile_fold(c, term_cols, meta_cols) for c in comp.among]
        # matched child scores, nulls for unmatched, then compacted
        matched = "array_compact(array({}))".format(
            ", ".join(f"CASE WHEN {b} THEN {s} END" for b, s in children)
        )
        gate = f"(size({matched}) >= {comp.n})"
        take = min(comp.n, len(comp.among))
        topn = f"slice(sort_array({matched}, false), 1, {take})"
        total = f"aggregate({topn}, 0.0D, (a, x) -> a + x)"
        score = (
            f"(CASE WHEN {gate} THEN {total} / {dlit(float(comp.n))} "
            f"ELSE 0.0D END)"
        )
        return gate, score
    raise TypeError(type(comp))


def is_max_fold(comp: QueryComp) -> bool:
    """True when the AST is pure-disjunctive over words (a single Word or
    ``NAmong{n=1}`` of Words) — the fold reduces to max over term scores and
    per-term block-max top-k pruning is rank-safe (SURVEY.md §7.4)."""
    if isinstance(comp, Word):
        return True
    if isinstance(comp, NAmong) and comp.n == 1:
        return all(isinstance(c, Word) for c in comp.among)
    return False
