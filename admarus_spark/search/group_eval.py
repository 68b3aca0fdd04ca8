"""Executor-side batched query evaluation (the group-eval fast path).

``search_many`` co-locates each member query's posting blobs in one shuffle
partition (identity-routed via ``murmur.identity_partition_keys``, the same
trick as the build's raw-tf exchange) and this module evaluates every member
entirely inside the executor: decode with the same rank-safe block pruning
as the single-query paths — now executor-LOCAL, so candidate-id
intersections and top-k block selection ship ZERO driver bytes — then a
NumPy AST fold mirroring ``oracle.OracleIndex._fold`` float-for-float, then
the exact top-k. The output is k rows per member query, so the former
pivot/explode/window superstructure (a 25-column partial-agg shuffle of
every decoded posting, the measured scaling sink of the batched path —
BENCH/QUERY_DECOMP.json) disappears from the plan.

This is the reference's own evaluation shape: the daemon answers a query
against its local index slice in one process
(``/root/reference/daemon/src/index/inner_im.rs:90-104``,
``daemon/src/query/matching.rs:43-88``); here one group = one executor task
over the group's co-located posting lists.

Scale shape: a "group" is a connected component of queries sharing terms —
its work is bounded by the member terms' total posting volume, NOT the
corpus. The engine routes groups whose estimated decoded bytes exceed
``SPARK_GRAFT_GROUP_EVAL_MAX_BYTES`` to the distributed pivot path instead
(monster terms at 10^12-doc scale must fan out per-doc; a batch of hundreds
of bounded queries wants per-QUERY parallelism — both paths coexist and
union).

Float parity: identical op order as ``oracle.term_scores`` / ``_fold``
(IEEE +,*,/ on float64, descending-order left-fold sums), idf computed
driver-side with ``np.log`` from the TRUE corpus df and shipped as float64
values — the batched parity suite (tests/test_search_many.py) asserts
bit-equality against the sequential Catalyst path, which is itself
oracle-gated.

Rank-safety per member (same arguments as the driver-side mask union,
engine._batch_masks):

- max-fold members: per-term greedy block selection keeps >= k docs per
  term with the top saturations; under the max fold a doc's score is its
  best surviving component, and every top-k doc's best component survives.
- conjunctive members: the rarest REQUIRED word decodes fully; its ids are
  an exact candidate superset, other terms keep exactly the blocks whose
  id range intersects it. Non-candidates cannot pass the gate; candidates
  keep complete per-term scores.
- n-of-m members: pigeonhole — the (m'-n+1) rarest present children's id
  union is an exact candidate superset (engine._nofm_cover_words).
- any other shape decodes its terms fully (exact by construction).
- a term shared by several members decodes the UNION of their needs;
  extra rows are true postings and can only move a member's computed
  result toward the full-decode answer.

Doc-range sharding (r5): a LARGE component's makespan would otherwise be
one task — the measured query-scaling ceiling (BENCH/QUERY_DECOMP.json:
the 10-query batch's biggest component bounds local[4]). Because a doc's
BM25 score depends only on its own (tf, dl) and GLOBAL (df, avgdl), the
evaluation is exactly partitionable by doc id: the engine replicates a
big group's compressed blobs to S shard partitions, and each shard calls
``evaluate_group`` with ``id_lo/id_hi`` — blocks outside the range are
skipped via their stored [first, last] bounds, decoded ids are clipped to
the range, and the shard returns its exact in-range top-k. The union of
shard top-ks contains the global top-k (every doc lives in exactly one
shard), which a k-row window upstream finalizes. Per-shard rank-safety is
the SAME argument as unsharded — candidates, pigeonhole covers and greedy
saturation heaps are all computed from range-clipped arrays, so "beaten
by >= k docs" always means k docs *inside this shard's range*.
"""

from __future__ import annotations

import numpy as np

from .. import BM25_B, BM25_K1
from ..index.codec import decode_postings
from ..query.ast import NAmong, Not, Query, QueryComp, Word, required_words
from .fold import is_max_fold


def select_blocks_topk(
    r,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    id_lo: int | None = None,
    id_hi: int | None = None,
) -> np.ndarray:
    """Greedy block-max selection: visit blocks in descending upper bound,
    stop once >= k saturations >= the next bound are known. Exact block-max
    values (computed at build time with identical float math) make this
    rank-safe: every skipped doc is strictly beaten, within its term, by at
    least k docs — and under the max-fold, by the same k docs globally.

    With a shard range [id_lo, id_hi): out-of-range blocks are never
    visited, and a straddling block contributes ONLY its in-range
    saturations to the heap — so "beaten by k" always means k docs inside
    the range, which is what the shard's top-k needs."""
    bmax = np.asarray(r.block_max, dtype=np.float64)
    nb = bmax.size
    keep = np.zeros(nb, dtype=bool)
    ranged = id_lo is not None
    range_keep = None
    if ranged:
        range_keep = select_blocks_range(r, id_lo, id_hi)
    order = np.argsort(-bmax, kind="stable")
    best = np.empty(0, dtype=np.float64)
    for blk in order:
        if range_keep is not None and not range_keep[blk]:
            continue
        if best.size >= k and bmax[blk] < best[best.size - k]:
            break
        keep[blk] = True
        one = np.zeros(nb, dtype=bool)
        one[blk] = True
        ids, tfs, dls = decode_postings(
            r.ids, r.tfs, r.dls, r.block_firsts, r.block_lens,
            one, r.ids_offs, r.tfs_offs, r.dls_offs,
        )
        if ranged:
            sel = (ids >= id_lo) & (ids < id_hi)
            tfs, dls = tfs[sel], dls[sel]
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        sat = tf / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        best = np.sort(np.concatenate((best, sat)))
    return keep


def select_blocks_range(r, id_lo: int, id_hi: int) -> np.ndarray | None:
    """Keep mask for a shard's doc-id range [id_lo, id_hi): block i spans
    the closed id interval [first_i, last_i]; keep it iff that interval
    intersects the range. Returns None on the legacy layout (no stored
    ``block_lasts``) — the caller then decodes all blocks and relies on the
    post-decode id clip, which is correct but unpruned."""
    if not hasattr(r, "block_lasts") or r.block_lasts is None:
        return None
    firsts = np.asarray(r.block_firsts, dtype=np.int64)
    lasts = np.asarray(r.block_lasts, dtype=np.int64)
    return (lasts >= id_lo) & (firsts < id_hi)


def select_blocks_intersect(r, cand: np.ndarray) -> np.ndarray:
    """Keep mask for conjunctive pruning: block i spans ids [first_i,
    last_i] (stored bounds — NOT inferred from the next block's first,
    which is invalid after chunk-concatenated merges where per-chunk runs
    interleave); keep it iff the sorted candidate array has any id in that
    closed range. Exact decode reduction: a skipped block holds no
    candidate, and non-candidates cannot pass the conjunctive fold gate."""
    firsts = np.asarray(r.block_firsts, dtype=np.int64)
    if firsts.size == 0 or cand.size == 0:
        return np.zeros(firsts.size, dtype=bool)
    lasts = np.asarray(r.block_lasts, dtype=np.int64)
    lo = np.searchsorted(cand, firsts, side="left")
    hi = np.searchsorted(cand, lasts, side="right")
    return hi > lo


def nofm_cover_words(comp: QueryComp, df_map: dict[str, int]) -> list[str] | None:
    """Pigeonhole candidate cover for a top-level ``NAmong{1<n<m}`` whose
    children are all Words. Returns the ``m'-n+1`` present children with the
    smallest df (m' = children whose word is indexed), ``[]`` when fewer
    than n children are present (no doc can match), or None when the shape
    does not apply (nested subtrees, filters, NOTs — those keep the
    full-decode path)."""
    if not (isinstance(comp, NAmong) and 1 < comp.n < len(comp.among)):
        return None
    if not all(isinstance(c, Word) for c in comp.among):
        return None
    present = [c.word for c in comp.among if c.word in df_map]
    if len(present) < comp.n:
        return []
    k = len(present) - comp.n + 1
    return sorted(present, key=lambda t: (df_map[t], t))[:k]


def _decode_term(
    rows, keep_masks, id_lo: int | None = None, id_hi: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a term's posting rows (one per generation) with per-row keep
    masks (None = full), concatenated and sorted ascending by doc id (block
    runs interleave after chunked merges; downstream searchsorted lookups
    need global order). A shard range clips the result to ids in
    [id_lo, id_hi) — straddling blocks decode whole, their out-of-range
    tail is dropped here."""
    parts = []
    for r, keep in zip(rows, keep_masks):
        parts.append(
            decode_postings(
                r.ids, r.tfs, r.dls, r.block_firsts, r.block_lens,
                keep, r.ids_offs, r.tfs_offs, r.dls_offs,
            )
        )
    ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    order = np.argsort(ids, kind="stable")
    ids, tfs, dls = ids[order], tfs[order], dls[order]
    if id_lo is not None:
        lo = np.searchsorted(ids, id_lo, side="left")
        hi = np.searchsorted(ids, id_hi, side="left")
        ids, tfs, dls = ids[lo:hi], tfs[lo:hi], dls[lo:hi]
    return ids, tfs, dls


def _term_scores(
    term: str,
    cand: np.ndarray,
    dl: np.ndarray,
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
) -> tuple[np.ndarray, np.ndarray]:
    """(B, S) for a Word leaf over candidate doc ids — the executor twin of
    ``oracle.OracleIndex.term_scores`` (same searchsorted lookup, same
    float order), with tf sourced from the decoded (possibly rank-safely
    pruned) arrays and idf from the driver-shipped TRUE-df literals."""
    tf = np.zeros(cand.size, dtype=np.float64)
    entry = decoded.get(term)
    if entry is not None and entry[0].size:
        ids, tfs, _ = entry
        pos = np.searchsorted(ids, cand)
        pos_c = np.clip(pos, 0, ids.size - 1)
        hit = pos < ids.size
        hit &= ids[pos_c] == cand
        tf[hit] = tfs[pos_c[hit]].astype(np.float64)
    B = tf > 0
    S = np.zeros(cand.size, dtype=np.float64)
    idf = idf_map.get(term)
    if idf is not None:
        K = k1 * ((1.0 - b) + b * dl.astype(np.float64) / avgdl)
        S = np.where(B, idf * (tf / (tf + K)), 0.0)
    return B, S


def _fold(
    comp: QueryComp,
    B_map: dict[str, np.ndarray],
    S_map: dict[str, np.ndarray],
    n_cand: int,
) -> tuple[np.ndarray, np.ndarray]:
    """NumPy AST fold over precomputed per-term (B, S) — line-for-line the
    oracle's ``_fold`` (matching.rs:43-66 semantics, pinned float order).
    Filter leaves never reach this path (the engine routes members whose
    fold references metadata to the pivot path, which joins doc_dict)."""
    if isinstance(comp, Word):
        B = B_map.get(comp.word)
        if B is None:
            return (
                np.zeros(n_cand, dtype=bool),
                np.zeros(n_cand, dtype=np.float64),
            )
        return B, S_map[comp.word]
    if isinstance(comp, Not):
        Bc, _ = _fold(comp.comp, B_map, S_map, n_cand)
        return ~Bc, np.zeros(n_cand, dtype=np.float64)
    if isinstance(comp, NAmong):
        Bs, Ss = [], []
        for ch in comp.among:
            Bc, Sc = _fold(ch, B_map, S_map, n_cand)
            Bs.append(Bc)
            Ss.append(Sc)
        Bm = np.stack(Bs)
        Sm = np.stack(Ss)
        matched = Bm.sum(axis=0)
        gate = matched >= comp.n
        masked = np.where(Bm, Sm, -np.inf)
        desc = -np.sort(-masked, axis=0)  # descending per candidate
        take = min(comp.n, len(comp.among))
        acc = np.zeros(n_cand, dtype=np.float64)
        for i in range(take):  # pinned left-fold in descending order
            row = desc[i]
            acc = acc + np.where(np.isfinite(row), row, 0.0)
        S = np.where(gate, acc / float(comp.n), 0.0)
        return gate, S
    raise TypeError(f"group-eval fold cannot evaluate {type(comp).__name__}")


def evaluate_group(
    members: list[tuple[str, Query]],
    rows: dict[str, list],
    df_map: dict[str, int],
    idf_map: dict[str, float],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_lo: int | None = None,
    id_hi: int | None = None,
) -> list[tuple[str, int, float]]:
    """Evaluate one co-located group of member queries; returns
    (query_id, doc_id, score) rows — exact top-k per member, identical
    floats and (score desc, doc_id asc) order as the single-query path.

    ``rows``: term -> posting rows (itertuples of the scanned blob
    columns, one per generation).

    ``id_lo/id_hi``: the shard's doc-id range (None = unsharded). Every
    decode clips to the range, so the returned rows are the member's exact
    top-k *among docs in the range*; per-candidate scores are elementwise
    over that doc's own (tf, dl) and global (idf, avgdl), hence identical
    floats to the unsharded path. A term whose blobs were range-pruned
    before the shuffle simply isn't ``present`` here — semantically "no
    postings in this id range", which every plan kind already handles."""
    present = set(rows)
    # ---- pass 1: classify members, mark per-term decode needs ----------
    plans: list[tuple[str, Query, str, list[str]]] = []
    need_full: set[str] = set()
    greedy: set[str] = set()
    for qid, q in members:
        qterms = [t for t in dict.fromkeys(q.terms()) if t in present]
        pos = [t for t in dict.fromkeys(q.positive_terms()) if t in present]
        if not pos:
            continue  # no candidate source -> empty member result
        qdf = {t: df_map[t] for t in qterms}
        if is_max_fold(q.root):
            greedy.update(pos)
            plans.append((qid, q, "maxfold", pos))
            continue
        req = required_words(q.root)
        if req:
            if req - set(qdf):
                continue  # a required word has no postings -> empty
            rare = min(req, key=lambda t: (qdf[t], t))
            need_full.add(rare)
            plans.append((qid, q, "conj", [rare]))
            continue
        cover = nofm_cover_words(q.root, qdf)
        if cover is not None:
            if not cover:
                continue  # fewer than n children present -> empty
            uniq = list(dict.fromkeys(cover))
            need_full.update(uniq)
            plans.append((qid, q, "nofm", uniq))
            continue
        # general shape (nested folds, NOTs over subtrees): full decode,
        # exact by construction
        need_full.update(qterms)
        plans.append((qid, q, "general", pos))

    ranged = id_lo is not None
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for t in need_full:
        masks = [
            select_blocks_range(r, id_lo, id_hi) if ranged else None
            for r in rows[t]
        ]
        decoded[t] = _decode_term(rows[t], masks, id_lo, id_hi)

    # ---- member candidate sets (from fully-decoded source terms) -------
    member_cand: dict[int, np.ndarray] = {}
    for i, (qid, q, kind, src_terms) in enumerate(plans):
        if kind in ("conj", "nofm"):
            member_cand[i] = np.unique(
                np.concatenate([decoded[t][0] for t in src_terms])
            )

    # ---- pass 2: decode remaining terms with the UNION of member needs -
    rest: set[str] = set()
    for qid, q, kind, _src in plans:
        rest.update(t for t in q.terms() if t in present)
    for t in sorted(rest - set(decoded)):
        trows = rows[t]
        masks: list[np.ndarray | None] = []
        for r in trows:
            m: np.ndarray | None = None
            full = False
            if t in greedy:
                m = select_blocks_topk(r, k, k1, b, avgdl, id_lo, id_hi)
            for i, (qid, q, kind, _src) in enumerate(plans):
                if kind not in ("conj", "nofm") or t not in q.terms():
                    continue
                if not hasattr(r, "block_lasts") or r.block_lasts is None:
                    full = True  # legacy layout: no id bounds -> full decode
                    break
                mi = select_blocks_intersect(r, member_cand[i])
                m = mi if m is None else (m | mi)
            if full or m is None:
                # no query-driven mask: decode the shard range (None on an
                # unsharded group or the legacy layout = all blocks; the
                # post-decode clip keeps legacy correct)
                m = select_blocks_range(r, id_lo, id_hi) if ranged else None
            masks.append(m)
        decoded[t] = _decode_term(trows, masks, id_lo, id_hi)

    # ---- pass 3: evaluate each member over its candidates --------------
    recs: list[tuple[str, int, float]] = []
    for i, (qid, q, kind, src_terms) in enumerate(plans):
        if kind in ("conj", "nofm"):
            cand = member_cand[i]
            arrs = [decoded[t] for t in src_terms]
        else:
            arrs = [decoded[t] for t in src_terms if decoded[t][0].size]
            if not arrs:
                continue
            cand = np.unique(np.concatenate([a[0] for a in arrs]))
        if cand.size == 0:
            continue
        # doc length per candidate: every candidate appears in >= 1 source
        # array (its own posting carries dl)
        ids_c = np.concatenate([a[0] for a in arrs])
        dls_c = np.concatenate([a[2] for a in arrs])
        uniq, first = np.unique(ids_c, return_index=True)
        # uniq == cand by construction for both branches
        dl = dls_c[first]
        B_map: dict[str, np.ndarray] = {}
        S_map: dict[str, np.ndarray] = {}
        for t in dict.fromkeys(q.terms()):
            B_map[t], S_map[t] = _term_scores(
                t, cand, dl, decoded, idf_map, k1, b, avgdl
            )
        Bq, Sq = _fold(q.root, B_map, S_map, cand.size)
        keep = np.flatnonzero(Bq)
        if keep.size == 0:
            continue
        ids_k = cand[keep]
        sc = Sq[keep]
        order = np.lexsort((ids_k, -sc))[:k]
        recs.extend((qid, int(ids_k[j]), float(sc[j])) for j in order)
    return recs


def group_members(
    members: dict[str, Query], df_map: dict[str, int]
) -> list[list[str]]:
    """Connected components of member queries sharing indexed terms
    (union-find): each component's blobs co-locate in one shuffle
    partition, so a shared term is scanned and decoded once."""
    parent: dict[str, str] = {qid: qid for qid in members}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    term_owner: dict[str, str] = {}
    for qid, q in members.items():
        for t in q.terms():
            if t not in df_map:
                continue
            if t in term_owner:
                ra, rb = find(qid), find(term_owner[t])
                if ra != rb:
                    parent[ra] = rb
            else:
                term_owner[t] = qid
    comps: dict[str, list[str]] = {}
    for qid in members:
        comps.setdefault(find(qid), []).append(qid)
    return [sorted(v) for _r, v in sorted(comps.items())]
