"""Compile the query AST into Spark Column expressions (JVM-side fold).

The reference evaluates the AST per candidate doc in Rust
(``/root/reference/daemon/src/query/matching.rs:43-66``). Here the same fold
becomes a Catalyst expression tree over per-term score columns — whole-stage
codegen, no Python in the scoring hot path.

Semantics (pinned, SURVEY.md §7.3 + oracle.py):

- Word    -> B: term score > 0;            S: the BM25 term score column
- Filter  -> B: metadata column == value;  S: 0.0 (predicates gate, not score)
- Not(c)  -> B: NOT B(c);                  S: 0.0
- NAmong  -> B: at least n children match; S: sum of the n largest matched
             child scores (descending-order left fold — pinned float order,
             identical to the oracle) / n

Float parity: the only operations are IEEE +,*,/ and comparisons on float64,
performed in the same order as the NumPy oracle — bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..query.ast import Filter, NAmong, Not, QueryComp, Word


def compile_fold(
    comp: QueryComp,
    term_cols: dict[str, Column],
    meta_cols: dict[str, Column],
) -> tuple[Column, Column]:
    """Returns (B, S): boolean-match column and float64 score column."""
    if isinstance(comp, Word):
        s = term_cols.get(comp.word)
        if s is None:
            return F.lit(False), F.lit(0.0)
        return s > F.lit(0.0), s
    if isinstance(comp, Filter):
        col = meta_cols.get(comp.name)
        if col is None:
            return F.lit(False), F.lit(0.0)
        return F.coalesce(col == F.lit(comp.value), F.lit(False)), F.lit(0.0)
    if isinstance(comp, Not):
        b, _ = compile_fold(comp.comp, term_cols, meta_cols)
        return ~b, F.lit(0.0)
    if isinstance(comp, NAmong):
        children = [compile_fold(c, term_cols, meta_cols) for c in comp.among]
        # matched child scores, nulls for unmatched, then compacted
        matched = F.array_compact(F.array(*[F.when(b, s) for b, s in children]))
        cnt = F.size(matched)
        gate = cnt >= F.lit(comp.n)
        take = min(comp.n, len(comp.among))
        topn = F.slice(F.sort_array(matched, asc=False), 1, take)
        total = F.aggregate(topn, F.lit(0.0), lambda a, x: a + x)
        score = F.when(gate, total / F.lit(float(comp.n))).otherwise(F.lit(0.0))
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
