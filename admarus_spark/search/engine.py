"""Top-k BM25 query engine over a built index.

Query lifecycle (mirrors the reference's local search slice,
``/root/reference/daemon/src/api/local_search.rs:3-18`` →
``daemon/src/index/inner_im.rs:90-104``, re-expressed Spark-first —
SURVEY.md §4 physical plan):

driver:  parse AST → bloom gate (M1, ``matching.rs:19-41``) → per-term
         bucket routing (term-hash partition pruning + per-bucket bloom)
stage A: scan postings WHERE tb IN (...) AND term IN (...)   [partition
         pruning + parquet predicate pushdown]
stage B: decode varint blocks (Arrow-batched mapInPandas, NumPy inside);
         optional rank-safe block-max skipping for disjunctive queries
stage C: per-doc AST fold compiled to Catalyst expressions (fold.py)
stage D: global top-k: orderBy(score desc, doc_id asc).limit(k)
         → TakeOrderedAndProject
stage E: broadcast-join the k winners back to doc_dict for display fields

Per-term idf is computed on the driver with NumPy from collected (term, df)
rows and injected as float64 literals, so engine and oracle share the exact
same ln() bits (float-parity note in oracle.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1, FILTER_BITS
from ..hashword import filter_get
from ..index.build import IndexPaths, heal_swap
from ..index.codec import decode_postings
from ..murmur import identity_partition_keys, term_bucket
from ..oracle import bm25_idf
from ..query.ast import Filter, NAmong, Not, Query, QueryComp, Word, required_words
from ..query.parser import parse_query
from .fold import compile_fold, dlit, is_max_fold, sql_quote
from .group_eval import (
    evaluate_group,
    group_members,
    nofm_cover_words as _nofm_cover_words,
    select_blocks_intersect as _select_blocks_intersect,
    select_blocks_topk as _select_blocks_topk,
)

RESULT_SCHEMA = "doc_id long, score double, repo string, path string, commit string, lang string"


def _sum_df(rows) -> dict[str, int]:
    """df per term as the SUM over its posting rows: an updated-but-not-yet-
    compacted index stores one row per (term, generation) — the incremental
    path APPENDS delta postings instead of rewriting buckets — and idf must
    see the term's TOTAL df (generations hold disjoint doc ids, so the sum
    is exact)."""
    out: dict[str, int] = {}
    for r in rows:
        out[r["term"]] = out.get(r["term"], 0) + int(r["df"])
    return out


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        # heal interrupted write-then-swap replacements (r5 review): a crash
        # between swap_dir's two renames leaves a live dir missing with the
        # complete new generation in <dir>_next — a read-only consumer
        # constructed inside that window must promote it, not fail at the
        # parquet read. Guarded on the dir being absent so a clean init
        # touches nothing (single-writer: no update()/compact() mid-flight).
        for _p in (self.paths.stats, self.paths.summaries,
                   self.paths.postings, self.paths.doc_dict):
            if not os.path.isdir(_p):
                heal_swap(_p)
        stats = spark.read.parquet(self.paths.stats).collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        # block-max values are exact bounds only under the avgdl they were
        # encoded with; stats drift (incremental updates) disables WAND
        try:
            self.wand_safe = float(stats["bm_avgdl"]) == self.avgdl
        except (KeyError, TypeError, ValueError):
            self.wand_safe = True
        self.doc_dict = spark.read.parquet(self.paths.doc_dict)
        self.postings = spark.read.parquet(self.paths.postings)
        # tombstones: stale generations of changed documents (incremental
        # upsert). Dead ids are anti-joined out of decoded postings BEFORE
        # ranking and out of the dictionary; block-max skipping is disabled
        # because the stored bounds may be dominated by dead docs (rank
        # safety). The set stays small relative to the corpus (a full
        # rebuild compacts); broadcast anti-join keeps this shuffle-free.
        tomb_path = os.path.join(index_dir, "tombstones")
        self.tombstones: DataFrame | None = None
        if os.path.exists(tomb_path):
            self.tombstones = spark.read.parquet(tomb_path)
            self.doc_dict = self.doc_dict.join(
                F.broadcast(self.tombstones), "doc_id", "left_anti"
            )
            self.wand_safe = False
        # driver-side summaries: init reads ONLY the two rollup rows (meta
        # bloom + global term bloom, precomputed by stage3) — n_buckets
        # scales with the corpus, so eagerly materializing every bucket's
        # 125 KB bloom would cost O(n_buckets) driver heap and a slow init
        # at 100 TB scale. Per-bucket blooms load lazily, one pruned collect
        # per batch of queried buckets. Legacy indexes without the global
        # row fall back to the eager full load.
        self._summaries = spark.read.parquet(self.paths.summaries)
        self.bucket_blooms: dict[int, np.ndarray] = {}
        self._absent_buckets: set[int] = set()
        self.meta_bloom = np.zeros(FILTER_BITS // 8, dtype=np.uint8)
        global_terms: np.ndarray | None = None
        for r in self._summaries.filter(F.col("kind").isin("meta", "global")).collect():
            filt = np.frombuffer(r["filter"], dtype=np.uint8)
            if r["kind"] == "meta":
                self.meta_bloom = filt
            else:
                global_terms = filt
        self._lazy_blooms = global_terms is not None
        if not self._lazy_blooms:
            for r in self._summaries.filter(F.col("kind") == "terms").collect():
                self.bucket_blooms[int(r["tb"])] = np.frombuffer(r["filter"], dtype=np.uint8)
            blooms = list(self.bucket_blooms.values())
            global_terms = (
                np.bitwise_or.reduce(blooms) if blooms else np.zeros(FILTER_BITS // 8, np.uint8)
            )
        self.global_bloom = np.bitwise_or(global_terms, self.meta_bloom)
        from ..index import checkpoint as _ckpt

        stage2 = _ckpt.read_metrics(index_dir, "stage2_postings")
        # n_buckets is the ROUTING modulus: it must be the configured bucket
        # count, not max(occupied)+1 — a trailing bucket with zero terms
        # writes no partition/summary row, and inferring from occupancy would
        # route every term with the wrong modulus (silently empty results).
        # Persisted in stage2 metrics; occupancy inference is the legacy
        # fallback for pre-r2 indexes only.
        n_b = stage2.get("n_buckets")
        if n_b is not None:
            self.n_buckets = int(n_b)
        else:
            # legacy fallback (pre-r2 index without stage2 metrics): infer
            # from the summaries table, NOT the in-memory bloom dict — under
            # lazy-bloom init the dict is empty at this point and max()+1
            # would silently route every term with modulus 1 (ADVICE r3)
            mx = self._summaries.filter(F.col("kind") == "terms").agg(
                F.max("tb")
            ).collect()[0][0]
            self.n_buckets = int(mx) + 1 if mx is not None else 1
        # dictionary cache: for small dictionaries, (term -> df) is loaded
        # once at init so queries skip the per-query df-collect job; at
        # billion-term scale this stays lazy (per-query pruned collect).
        self.df_cache: dict[str, int] | None = None
        # conjunctive decode pruning kicks in when the rarest required word
        # has df at or below this (its ids are decoded driver-side and
        # shipped in the decode closure — ~8 bytes/doc)
        self.and_prune_max_df = 100_000
        # cross-term BMW θ-probing fetches whole posting blobs to the driver
        # (blob columns are not block-sliceable in a collect); cap the fetch
        # so a pathologically hot term cannot ship a multi-GB blob per query
        # — above the cap BMW returns None and the executor-side per-term
        # greedy (no driver fetch) takes over (ADVICE r4)
        self.bmw_max_term_df = int(os.environ.get("SPARK_GRAFT_BMW_MAX_DF", 2_000_000))
        # batched-decode pruning engages only when the batch's total posting
        # volume exceeds this: below it the decode is cheaper than the
        # driver-side mask computation the pruning spends (mask latency is
        # constant in executor count; the decode it saves is not)
        self.batch_prune_min_postings = int(
            os.environ.get("SPARK_GRAFT_BATCH_PRUNE_MIN_POSTINGS", 50_000)
        )
        # the same trade for SINGLE queries (r6): below this total posting
        # volume, the driver round-trips the pruning paths spend (BMW block
        # meta + θ-probe blob fetches, conjunctive/n-of-m rare-id fetches)
        # cost more than the full decode they avoid — measured at sf1.0
        # (50k docs): wand="off" beat "auto" on every multi-term shape
        # (n-of-m 0.87→0.64 s) while the single-term executor-side greedy
        # (zero driver bytes) stayed a win. Full decode is the exactness
        # BASELINE, so the gate can only widen decoded volume, never
        # change results. wand="on" still forces the pruning machinery.
        self.single_prune_min_postings = int(
            os.environ.get("SPARK_GRAFT_SINGLE_PRUNE_MIN_POSTINGS", 50_000)
        )
        # batched θ-probing fetches blobs ONLY for terms at or below this df:
        # rare/mid blobs are small and carry the high actual scores that set
        # a tight θ (the df-skew win case); hot blobs never ship driver-side
        # in the batched path — hot uniform members use the executor-side
        # per-term greedy instead, whose cost shrinks with executors
        self.batch_probe_max_df = int(
            os.environ.get("SPARK_GRAFT_BATCH_PROBE_MAX_DF", 100_000)
        )
        # batched members whose group (connected component of queries
        # sharing terms) decodes under this many estimated bytes evaluate
        # entirely executor-side (group_eval.py: co-located blobs, local
        # pruning, k rows out); larger groups take the distributed pivot
        # path — at 10^12-doc scale a monster term's postings must fan out
        # per-doc, while a batch of bounded queries wants per-QUERY
        # parallelism. ~24 bytes per decoded posting (3 int64 arrays).
        self.group_eval_max_bytes = int(
            os.environ.get("SPARK_GRAFT_GROUP_EVAL_MAX_BYTES", 1 << 30)
        )
        # persisted intermediates from the previous search_many/_finish call;
        # released at the next query (or via release_cache) so a long-lived
        # serving session does not leak executor cache (ADVICE r1).
        self._live_cache: list[DataFrame] = []
        # decode-pruning evidence from the last cross-term BMW query / the
        # last batched search_many mask union / the last group-eval routing
        self.last_bmw: dict | None = None
        self.last_batch_prune: dict | None = None
        self.last_group_eval: dict | None = None
        # tombstoned ids pinned driver-side, lazily (bounded by design: the
        # set holds changed-doc old generations + crash-recovery orphans and
        # compact() clears it) — feeds the live-df correction below
        self._dead_cache: np.ndarray | None = None
        # true max live doc id, lazily (one tiny columnar aggregate, cached
        # per engine life / refresh()): ids are append-assigned and never
        # reused, so after update()+compact() cycles the live set is SPARSE
        # in [0, max_id] with max_id >> n_docs — doc-range shards sized by
        # n_docs would pile every recent doc into the open-ended last shard
        # (r5 review)
        self._max_id_cache: int | None = None
        n_terms = stage2.get("n_terms")
        if n_terms is not None and n_terms <= 200_000:
            self.df_cache = _sum_df(self.postings.select("term", "df").collect())
        # dictionary pin (r6): every query's final join re-scans the doc_dict
        # parquet (~0.1-0.3 s/query measured at sf1.0); a serving engine
        # keeps its dictionary hot, same philosophy as df_cache above. Size-
        # gated like df_cache (rows known from stats — ~100 B/row, so the
        # default 5M cap bounds the executor cache at a few hundred MB; a
        # billion-doc index keeps the plain scan). Materialized EAGERLY:
        # a serving engine preloads its dictionary before taking traffic,
        # so the first query after init/refresh pays no cold scan (same
        # reasoning as the eager df_cache collect above). refresh()
        # unpersists before re-init, so an external update is picked up
        # exactly like the other init-time snapshots.
        self._dd_persisted = False
        dd_cache_max = int(os.environ.get("SPARK_GRAFT_DD_CACHE_MAX_DOCS", 5_000_000))
        if self.n_docs <= dd_cache_max:
            self.doc_dict = self.doc_dict.persist()
            self.doc_dict.count()
            self._dd_persisted = True

    # --------------------------------------------------------------------
    def refresh(self) -> None:
        """Re-sync with an index that was updated underneath this engine
        (incremental upsert / compaction from another process): a long-lived
        serving session otherwise keeps the df cache, blooms and tombstone
        view from init — the guards keep results rank-safe (stale df_cache
        returns empty rather than wrong) but recall silently drops until
        re-init (VERDICT r4 #7). Re-runs init: stats, rollup rows, df cache,
        tombstones and n_buckets re-read; cached per-bucket blooms and
        persisted intermediates dropped. Cost equals engine construction
        (two O(1) summary collects + the size-gated dictionary cache) —
        cheap enough for a periodic refresh tick."""
        self.release_cache()
        if getattr(self, "_dd_persisted", False):
            self.doc_dict.unpersist()
        self.__init__(self.spark, self.paths.index_dir)

    # --- M1 bloom gate (matching.rs:19-41 semantics, u32 sum/gate) ------
    def _bloom_match_score(self, comp: QueryComp, filt: np.ndarray, optimistic: bool = True) -> int:
        """Driver-side query-vs-summary match score.

        ``optimistic=True`` (the pruning mode) treats Not subtrees as always
        possibly matching: a corpus-wide bloom can prove a term absent from
        every doc, but never that some doc lacks it — the reference's literal
        M1 would wrongly skip ``a AND NOT b`` whenever b exists anywhere
        (that is acceptable for its p2p routing, not for doc-level results).
        ``optimistic=False`` reproduces matching.rs:19-41 exactly (used by
        the parity tests)."""
        if isinstance(comp, Word):
            return 1 if filter_get(filt, comp.word) else 0
        if isinstance(comp, Filter):
            return 1 if filter_get(filt, f"{comp.name}={comp.value}") else 0
        if isinstance(comp, Not):
            if optimistic:
                return 1
            return 1 if self._bloom_match_score(comp.comp, filt, optimistic) == 0 else 0
        if isinstance(comp, NAmong):
            total = 0
            matching = 0
            for c in comp.among:
                s = self._bloom_match_score(c, filt, optimistic)
                total += s
                if s > 0:
                    matching += 1
            return total if matching >= comp.n else 0
        raise TypeError(type(comp))

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], RESULT_SCHEMA)

    def _ensure_bucket_blooms(self, tbs: set[int]) -> None:
        """Lazily load the queried buckets' term blooms: ONE tb-pruned
        collect for all missing buckets, cached for the engine's lifetime.
        Buckets with no summary row (zero terms landed there) are cached as
        absent so they are never re-queried."""
        if not self._lazy_blooms:
            return
        missing = [
            tb
            for tb in tbs
            if tb not in self.bucket_blooms and tb not in self._absent_buckets
        ]
        if not missing:
            return
        rows = self._summaries.filter(
            (F.col("kind") == "terms") & F.col("tb").isin(missing)
        ).collect()
        for r in rows:
            self.bucket_blooms[int(r["tb"])] = np.frombuffer(r["filter"], dtype=np.uint8)
        self._absent_buckets.update(set(missing) - set(self.bucket_blooms))

    def _track(self, df: DataFrame) -> DataFrame:
        self._live_cache.append(df.persist())
        return df

    def release_cache(self) -> None:
        """Unpersist intermediates cached by previous queries."""
        for df in self._live_cache:
            df.unpersist()
        self._live_cache.clear()

    # --------------------------------------------------------------------
    def search(
        self, query: str | Query, k: int | None = 10, wand: str = "auto",
        _keep_cache: bool = False,
    ) -> DataFrame:
        """Top-k results: (doc_id, score, repo, path, commit, lang).

        ``k=None`` returns EVERY gated match ranked (no limit, no broadcast
        dictionary join) — the shape downstream group-bys aggregate directly
        instead of flowing through a huge top-k broadcast."""
        if not _keep_cache:
            self.release_cache()
        if isinstance(query, str):
            query = parse_query(query)
        # driver-side bloom short-circuit (inner_im.rs:91-94)
        if self._bloom_match_score(query.root, self.global_bloom) == 0:
            return self._empty_result()

        all_terms = list(dict.fromkeys(query.terms()))
        pos_filters = query.positive_filters()

        # route terms to buckets; per-bucket bloom drops absent terms early
        self._ensure_bucket_blooms({term_bucket(t, self.n_buckets) for t in all_terms})
        scan_terms: list[str] = []
        buckets: set[int] = set()
        for t in all_terms:
            tb = term_bucket(t, self.n_buckets)
            bloom = self.bucket_blooms.get(tb)
            if bloom is not None and filter_get(bloom, t):
                scan_terms.append(t)
                buckets.add(tb)

        has_filter_cands = any(n in self.doc_dict.columns for n, _ in pos_filters)
        if not scan_terms and not has_filter_cands:
            return self._empty_result()

        scored: DataFrame | None = None
        term_col: dict[str, str] = {}
        if scan_terms:
            pruned = self.postings.filter(
                F.col("tb").isin(sorted(buckets)) & F.col("term").isin(scan_terms)
            )
            if self.df_cache is not None:
                df_map = {t: self.df_cache[t] for t in scan_terms if t in self.df_cache}
            else:
                df_map = _sum_df(pruned.select("term", "df").collect())
            if self.tombstones is not None and df_map:
                df_map = self._live_df_map(pruned, df_map)
            # block skipping is rank-safe ONLY for pure max-folds with no
            # metadata filters: on AND/n-of-m/NOT shapes a skipped block
            # zeroes a term's pivot column for docs still present via another
            # term, flipping the gate. wand="on" overrides NEITHER guard:
            # not the shape guard, and not wand_safe (stale bm_avgdl or
            # pending tombstones make the stored block maxes a lie — a
            # forced skip could drop a true top-k block). The knob only
            # distinguishes "auto"/"on" from "off" (the full-decode
            # baseline); exactness is never traded.
            shape_safe = is_max_fold(query.root) and not pos_filters and k is not None
            # small-volume gate (r6): under the threshold, skip every pruning
            # path that costs a driver round-trip — keep only the per-term
            # greedy (executor-side, zero driver bytes) for single-term
            # max-folds. "auto" only; "on" keeps forcing the machinery.
            small = (
                wand == "auto"
                and sum(df_map.values()) < self.single_prune_min_postings
            )
            use_wand = (
                shape_safe
                and self.wand_safe
                and wand in ("on", "auto")
                and not (small and len(df_map) > 1)
            )
            # conjunctive decode pruning (the AND/n-of-n analog of WAND):
            # every match must contain ALL required words, so the rarest
            # required word's posting ids bound the candidate set EXACTLY —
            # other terms skip blocks whose id range holds no candidate and
            # drop non-candidate rows after decode. Unlike block-max
            # skipping this is shape-exact, not merely rank-safe.
            cand_ids = None
            req = required_words(query.root)
            if req and wand != "off" and not use_wand:
                missing = req - set(df_map)
                if missing:
                    return self._empty_result()  # a required word is unindexed
                if len(df_map) > 1 and not small:
                    rare = min(req, key=lambda t: df_map[t])
                    if df_map[rare] <= self.and_prune_max_df:
                        cand_ids = self._collect_term_ids(rare)
            elif not req and wand != "off" and not use_wand:
                # n-of-m pigeonhole pruning (1 < n < m): a doc matching at
                # least n of m' present children misses at most m'-n of
                # them, so it MUST appear in the postings of at least one of
                # ANY m'-n+1 chosen children. The m'-n+1 rarest children's
                # id union is therefore an exact candidate superset — the
                # same decode machinery as the conjunctive path applies
                # (VERDICT r2 #9; AND is the n=m special case: 1 rarest
                # list). Exact, not merely rank-safe: non-candidates cannot
                # pass the >= n gate, and candidate rows survive in EVERY
                # term's list, keeping their fold scores complete.
                cover = _nofm_cover_words(query.root, df_map)
                if cover is not None:
                    if not cover:
                        return self._empty_result()  # fewer than n present
                    uniq_cover = list(dict.fromkeys(cover))
                    if not small and (
                        sum(df_map[t] for t in uniq_cover) <= self.and_prune_max_df
                    ):
                        parts = [self._collect_term_ids(t) for t in uniq_cover]
                        cand_ids = np.unique(np.concatenate(parts))
            if cand_ids is not None and cand_ids.size == 0:
                # a required/cover word has an empty posting list (stale
                # df_cache after an external update): no doc can match
                return self._empty_result()
            if df_map:
                # cross-term BMW: one global threshold shared by every term
                # (strictly more pruning than the per-term greedy, which
                # must keep >= k docs PER term); falls back to the greedy
                # per-term selection when masks are not applicable
                wand_k = k if use_wand else None
                block_masks = None
                if use_wand and len(df_map) > 1:
                    # single-term queries: per-term greedy == BMW result, so
                    # skip the two extra driver round-trips
                    block_masks = self._bmw_masks(pruned, df_map, k)
                    if block_masks is not None:
                        wand_k = None
                decoded = self._decode(pruned, wand_k, cand_ids, block_masks)
                scored, term_col = self._score(decoded, df_map)

        if scored is None and not has_filter_cands:
            return self._empty_result()
        return self._finish(query, scored, term_col, pos_filters, k)

    # --------------------------------------------------------------------
    def search_with_snippets(self, query, docs: DataFrame, k: int = 10) -> DataFrame:
        """Top-k + best-extract snippets (P5, documents.rs:131-163): the
        source table is joined only against the k winners (broadcast)."""
        from .snippets import with_snippets

        if isinstance(query, str):
            query = parse_query(query)
        res = self.search(query, k)
        return with_snippets(res, docs, query.positive_terms())

    # --------------------------------------------------------------------
    def search_many(
        self, queries: dict[str, str | Query], k: int = 10, wand: str = "auto"
    ) -> DataFrame:
        """Batched execution: MANY queries, per-query results identical to
        ``search`` (same floats, same order). Members route across three
        paths and union:

        - **group-eval** (the default for postings-only members on a clean
          index): each connected component of queries sharing terms becomes
          ONE identity-routed shuffle partition of posting blobs, evaluated
          entirely executor-side (``group_eval.evaluate_group``: local
          rank-safe block pruning, the oracle's NumPy fold, exact top-k) —
          k rows per query come back, no per-doc pivot, no driver θ probes.
        - **pivot** (``_search_many_pivot``): shared scan + decode + BM25
          pivot + one exploded fold plan + windowed per-query top-k — for
          members whose folds reference metadata, tombstoned indexes,
          groups over the decoded-bytes cap, and the ``wand="off"``
          full-decode baseline. The shared decode is pruned by the UNION of
          the member queries' block masks (``_batch_masks``).
        - **fallback**: members with positive metadata filters take the
          exact single-query path (their candidates come from doc_dict, not
          postings).

        Returns (query_id, doc_id, score, repo, path, commit, lang), top-k
        per query by (score desc, doc_id asc).
        """
        # Phase timings for the scaling decomposition (BENCH/BASELINE.md):
        # prep = parse + bloom gates + df lookup; mask = _batch_masks θ
        # probes; plan = plan construction after masks. All DRIVER-side
        # constants — the distributed job itself is timed by the caller.
        t_start = time.time()
        self.last_batch_timings = {"prep_sec": 0.0, "mask_sec": 0.0, "plan_sec": 0.0}
        self.last_group_eval = None
        self.release_cache()
        parsed: dict[str, Query] = {
            qid: (parse_query(q) if isinstance(q, str) else q) for qid, q in queries.items()
        }
        batched: dict[str, Query] = {}
        fallback: dict[str, Query] = {}
        for qid, q in parsed.items():
            if self._bloom_match_score(q.root, self.global_bloom) == 0:
                continue
            # any positive metadata filter can source candidates beyond the
            # positive-term posting union (e.g. `lang=en / word`) -> take the
            # exact single-query path for those
            if q.positive_terms() and not q.positive_filters():
                batched[qid] = q
            elif q.positive_filters():
                fallback[qid] = q

        parts: list[DataFrame] = []
        if batched:
            union_terms: list[str] = list(
                dict.fromkeys(t for q in batched.values() for t in q.terms())
            )
            self._ensure_bucket_blooms(
                {term_bucket(t, self.n_buckets) for t in union_terms}
            )
            scan_terms = []
            for t in union_terms:
                tb = term_bucket(t, self.n_buckets)
                bloom = self.bucket_blooms.get(tb)
                if bloom is not None and filter_get(bloom, t):
                    scan_terms.append(t)
            if scan_terms:
                if self.df_cache is not None:
                    df_map = {t: self.df_cache[t] for t in scan_terms if t in self.df_cache}
                else:
                    buckets = sorted({term_bucket(t, self.n_buckets) for t in scan_terms})
                    df_map = _sum_df(
                        self.postings.filter(
                            F.col("tb").isin(buckets) & F.col("term").isin(scan_terms)
                        ).select("term", "df").collect()
                    )
                if self.tombstones is not None and df_map:
                    buckets = sorted({term_bucket(t, self.n_buckets) for t in df_map})
                    df_map = self._live_df_map(
                        self.postings.filter(
                            F.col("tb").isin(buckets) & F.col("term").isin(list(df_map))
                        ),
                        df_map,
                    )
                if df_map:
                    self.last_batch_timings["prep_sec"] = time.time() - t_start
                    ge_groups, pivot_members = self._route_batch_members(
                        batched, df_map, wand
                    )
                    if ge_groups:
                        parts.append(self._search_many_groups(ge_groups, df_map, k))
                    if pivot_members:
                        part = self._search_many_pivot(pivot_members, df_map, k, wand)
                        if part is not None:
                            parts.append(part)
        for qid, q in fallback.items():
            parts.append(
                self.search(q, k, _keep_cache=True).select(
                    F.lit(qid).alias("query_id"), "doc_id", "score"
                )
            )
        if not parts:
            return self.spark.createDataFrame([], "query_id string, " + RESULT_SCHEMA)
        topk = parts[0]
        for p in parts[1:]:
            topk = topk.unionByName(p)
        out = self.doc_dict.join(F.broadcast(topk), "doc_id")
        result = out.select(
            "query_id", "doc_id", "score", "repo", "path", "commit", "lang"
        ).orderBy("query_id", F.desc("score"), F.asc("doc_id"))
        self.last_batch_timings["plan_sec"] = (
            time.time() - t_start
            - self.last_batch_timings["prep_sec"]
            - self.last_batch_timings["mask_sec"]
        )
        return result

    # --------------------------------------------------------------------
    def _route_batch_members(
        self, batched: dict[str, Query], df_map: dict[str, int], wand: str
    ) -> tuple[list[list[tuple[str, Query]]], dict[str, Query]]:
        """Split batched members between the executor-side group evaluation
        and the distributed pivot path. Group-eval takes postings-only
        members (no metadata filter anywhere in the fold — group partitions
        carry no doc metadata) on a clean index (no tombstones to anti-join,
        block-max bounds valid); members sharing terms form one group
        (connected components) so a shared term's blobs ship and decode
        once; groups whose estimated decoded volume exceeds
        ``group_eval_max_bytes`` PER SHARD stay on the pivot path (its
        per-doc parallelism is the right shape for monster terms) — with
        doc-range sharding enabled a group may exceed the cap by up to the
        shard budget (``_search_many_groups`` raises its shard count to
        keep each shard under the cap; routing and sharding use the same
        budget so a group admitted here always fits). ``wand="off"``
        forces the pivot full decode — the measured no-pruning baseline."""
        if wand == "off" or not self.wand_safe or self.tombstones is not None:
            return [], dict(batched)
        ge: dict[str, Query] = {}
        pivot: dict[str, Query] = {}
        for qid, q in batched.items():
            if _collect_filter_names(q.root):
                pivot[qid] = q
            else:
                ge[qid] = q
        if not ge:
            return [], pivot
        groups: list[list[tuple[str, Query]]] = []
        cap = self.group_eval_max_bytes * self._max_group_shards()
        for comp in group_members(ge, df_map):
            terms = {t for qid in comp for t in ge[qid].terms() if t in df_map}
            est = sum(df_map[t] for t in terms) * 24
            if est > cap:
                for qid in comp:
                    pivot[qid] = ge[qid]
            else:
                groups.append([(qid, ge[qid]) for qid in comp])
        return groups, pivot

    def _max_group_shards(self) -> int:
        """Upper bound on doc-range shards per group-eval component —
        scales the routing cap: a group is group-eval-eligible iff its
        decoded estimate fits ``group_eval_max_bytes`` in SOME admissible
        shard count."""
        sh_mode = os.environ.get("SPARK_GRAFT_GROUP_EVAL_SHARDS", "auto")
        if sh_mode == "off":
            return 1
        if sh_mode != "auto":
            return max(1, int(sh_mode))
        return max(1, self.spark.sparkContext.defaultParallelism)

    def _search_many_groups(
        self,
        groups: list[list[tuple[str, Query]]],
        df_map: dict[str, int],
        k: int,
    ) -> DataFrame:
        """Executor-side batched evaluation: ONE tb/term-pruned scan of the
        member terms' posting blobs, identity-routed so each group's blobs
        land whole and alone in their shuffle partition (same trick as the
        build's raw-tf exchange, murmur.identity_partition_keys — no
        sampling pass, no balls-in-bins collision), then one Arrow-batched
        pass evaluates every member locally (group_eval.evaluate_group:
        rank-safe block pruning with zero driver bytes, the oracle's NumPy
        fold, exact top-k) and emits k rows per member. Driver cost is one
        plan — no θ probes, no blob fetches, no per-term pivot columns.

        Partition order IS launch order in Spark's scheduler, so tasks are
        keyed largest-estimated-first (LPT): with G skewed groups over C
        cores, an unlucky order that launches the biggest group last
        inflates the makespan by up to its whole runtime — measured 40-query
        ladder batches carry a 10× est spread across 17 components.

        **Doc-range sharding** (r5): a group whose posting estimate exceeds
        an even per-core share splits into S shards by doc-id range — BM25
        is doc-local (a doc's score reads only its own tf/dl + global
        df/avgdl), so each shard returns its exact in-range top-k and a
        k-row window upstream merges them (group_eval.py module docstring
        carries the rank-safety argument). The group's compressed blobs
        replicate to its S shard partitions, EXCEPT rows whose stored
        [min block_first, max block_last] span misses the shard's range —
        a rare term's single-block row ships to exactly one shard. This
        turns the batch's parallelism core-bound instead of
        component-bound: pre-sharding, the 10-query ladder's largest
        component (~3.7M posting rows) WAS the local[4] makespan
        (BENCH/QUERY_DECOMP.json). ``SPARK_GRAFT_GROUP_EVAL_SHARDS``:
        ``auto`` (default), ``off``, or a forced per-group shard count."""

        def _est(comp: list[tuple[str, Query]]) -> int:
            gterms = {t for _qid, q in comp for t in q.terms() if t in df_map}
            return sum(df_map[t] for t in gterms)

        ests = {id(c): _est(c) for c in groups}
        groups = sorted(groups, key=lambda c: ests[id(c)], reverse=True)
        sh_mode = os.environ.get("SPARK_GRAFT_GROUP_EVAL_SHARDS", "auto")
        ncores = self.spark.sparkContext.defaultParallelism
        min_rows = int(os.environ.get("SPARK_GRAFT_GE_MIN_SHARD_ROWS", 200_000))
        total_est = sum(ests.values())
        if sh_mode == "off":
            n_shards = [1] * len(groups)
        elif sh_mode != "auto":
            n_shards = [max(1, int(sh_mode))] * len(groups)
        else:
            # split any group bigger than an even per-core share, but never
            # below min_rows per shard (a shard's fixed cost — blob
            # replication + task launch — must stay amortized); ALSO raise
            # the count until each shard's decoded estimate fits the
            # group-eval byte cap (routing admits over-cap groups on the
            # promise that sharding divides them back under it)
            target = max(total_est / max(ncores, 1), float(min_rows))
            cap_rows = max(self.group_eval_max_bytes // 24, 1)
            n_shards = [
                min(
                    max(
                        1,
                        -(-ests[id(c)] // int(target)),
                        -(-ests[id(c)] // cap_rows),
                    ),
                    ncores,
                )
                for c in groups
            ]
        # shard ranges cover the TRUE live id span [0, max doc_id]: ids are
        # append-assigned and never reused, so n_docs (the live COUNT) can
        # be far below the max id after update()+compact() cycles — sizing
        # by n_docs would funnel every recent doc into the open-ended last
        # shard and regress the batch to component-bound (r5 review). The
        # last shard's bound stays open so a generation appended between
        # the cache fill and this query is still covered (rank-safe either
        # way — spans only route rows, never skip them).
        max_id = max(self._max_live_doc_id() + 1, 1)
        tasks: list[tuple[int, int | None, int | None, float]] = []
        for i, comp in enumerate(groups):
            s = n_shards[i]
            if s == 1:
                tasks.append((i, None, None, float(ests[id(comp)])))
                continue
            share = float(ests[id(comp)]) / s
            step = -(-max_id // s)
            for j in range(s):
                lo = j * step
                hi = (j + 1) * step if j < s - 1 else (1 << 62)
                tasks.append((i, lo, hi, share))
        tasks.sort(key=lambda t: -t[3])  # LPT over (group, shard) tasks
        n = len(tasks)
        keys = identity_partition_keys(n)
        members_by_key: dict[int, tuple[list[tuple[str, Query]], int | None, int | None]] = {}
        term_keys: dict[str, list[int]] = {}
        key_range: dict[int, tuple[int, int]] = {}
        for kidx, (gi, lo, hi, _share) in enumerate(tasks):
            kkey = keys[kidx]
            members_by_key[kkey] = (groups[gi], lo, hi)
            if lo is not None:
                key_range[kkey] = (lo, hi)
            for _qid, q in groups[gi]:
                for t in q.terms():
                    if t in df_map:
                        term_keys.setdefault(t, [])
                        if kkey not in term_keys[t]:
                            term_keys[t].append(kkey)
        terms = sorted(term_keys)
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        pruned = self.postings.filter(
            F.col("tb").isin(buckets) & F.col("term").isin(terms)
        )
        cols = [
            "term", "ids", "tfs", "dls",
            "block_firsts", "block_lens", "ids_offs", "tfs_offs", "dls_offs",
            "block_max",
        ]
        has_lasts = "block_lasts" in pruned.columns
        if has_lasts:
            cols.append("block_lasts")
        case = (
            "CASE "
            + " ".join(
                "WHEN term = {} THEN array({})".format(
                    sql_quote(t), ", ".join(str(kk_) for kk_ in term_keys[t])
                )
                for t in terms
            )
            + " END"
        )
        src = pruned.select(*cols).withColumn("gk", F.explode(F.expr(case)))
        if key_range and has_lasts:
            # drop replicas whose whole row misses the shard's id range —
            # per-block masks inside evaluate_group re-check exactly
            lo_case = (
                "CASE "
                + " ".join(f"WHEN gk = {kk_} THEN {r[0]}L" for kk_, r in key_range.items())
                + " ELSE NULL END"
            )
            hi_case = (
                "CASE "
                + " ".join(f"WHEN gk = {kk_} THEN {r[1]}L" for kk_, r in key_range.items())
                + " ELSE NULL END"
            )
            src = src.filter(
                F.expr(
                    f"({lo_case}) IS NULL OR "
                    f"(array_max(block_lasts) >= ({lo_case}) "
                    f"AND array_min(block_firsts) < ({hi_case}))"
                )
            )
        src = src.repartition(n, "gk")
        idf_map = {t: bm25_idf(self.n_docs, df_map[t]) for t in terms}
        dfm = {t: df_map[t] for t in terms}
        avgdl, kk = self.avgdl, k
        k1, b = BM25_K1, BM25_B
        mbk = members_by_key

        def eval_map(batches):
            rows_by_key: dict[int, dict[str, list]] = {}
            for pdf in batches:
                for r in pdf.itertuples():
                    rows_by_key.setdefault(r.gk, {}).setdefault(r.term, []).append(r)
            recs: list[tuple[str, int, float]] = []
            for gk, rows in rows_by_key.items():
                comp, lo, hi = mbk[gk]
                recs.extend(
                    evaluate_group(
                        comp, rows, dfm, idf_map, kk, avgdl, k1, b, lo, hi
                    )
                )
            if recs:
                yield pd.DataFrame(
                    {
                        "query_id": pd.Series([r[0] for r in recs], dtype=object),
                        "doc_id": pd.Series([r[1] for r in recs], dtype=np.int64),
                        "score": pd.Series([r[2] for r in recs], dtype=np.float64),
                    }
                )

        self.last_group_eval = {
            "groups": len(groups),
            "members": sum(len(c) for c in groups),
            "terms": len(terms),
            "tasks": n,
            "sharded_groups": sum(1 for s in n_shards if s > 1),
        }
        out = src.mapInPandas(eval_map, "query_id string, doc_id long, score double")
        if key_range:
            # merge shard top-ks: tiny input (<= k rows per member-shard),
            # and Spark's InferWindowGroupLimit keeps it map-side partial
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            out = (
                out.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select("query_id", "doc_id", "score")
            )
        return out

    def _search_many_pivot(
        self,
        members: dict[str, Query],
        all_df_map: dict[str, int],
        k: int,
        wand: str,
    ) -> DataFrame | None:
        """Distributed batched evaluation (the per-doc-parallel shape):
        shared scan + decode of the member terms, per-(doc, term) BM25
        pivot, ALL per-query folds in ONE plan — each query contributes a
        conditional score column (null when its gate/candidate pred fails),
        exploded to (query_id, doc_id, score) rows, then a row_number window
        takes top-k per query. Spark's InferWindowGroupLimit turns the
        rn <= k filter into a map-side partial top-k BEFORE the query_id
        shuffle, so this is one job with a k-row-per-query-per-partition
        exchange — not Q sequential driver-launched top-k jobs (the per-job
        overhead was the measured query-scaling bottleneck at local[1] vs
        local[4], VERDICT r3 #4). Folds are SQL strings, ONE F.expr for the
        whole batch — hundreds of py4j round-trips per query otherwise (the
        plan_sec driver constant, BENCH/QUERY_DECOMP.json).

        This path serves the members group-eval cannot: folds referencing
        metadata (doc_dict join), tombstoned indexes (anti-join), groups
        over the decoded-bytes cap, and the ``wand="off"`` full-decode
        baseline."""
        terms = [
            t
            for t in dict.fromkeys(t for q in members.values() for t in q.terms())
            if t in all_df_map
        ]
        if not terms:
            return None
        df_map = {t: all_df_map[t] for t in terms}
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        pruned = self.postings.filter(
            F.col("tb").isin(buckets) & F.col("term").isin(terms)
        )
        t_m = time.time()
        block_masks = self._batch_masks(pruned, members, df_map, k, wand)
        self.last_batch_timings["mask_sec"] += time.time() - t_m
        decoded = self._decode(pruned, None, None, block_masks)
        scored, term_col = self._score(decoded, df_map)
        needs_meta = any(_collect_filter_names(q.root) for q in members.values())
        if needs_meta:
            meta_cols = ["doc_id"] + [
                c for c in ("lang", "repo") if c in self.doc_dict.columns
            ]
            scored = scored.join(self.doc_dict.select(*meta_cols), "doc_id", "left")
        term_cols = {t: f"coalesce({c}, 0.0D)" for t, c in term_col.items()}
        meta_exprs = {n: n for n in ("lang", "repo") if n in scored.columns}
        entries = []
        for qid, q in members.items():
            gate, score = compile_fold(q.root, term_cols, meta_exprs)
            pos_cols = [
                term_col[t]
                for t in dict.fromkeys(q.positive_terms())
                if t in term_col
            ]
            if not pos_cols:
                continue
            pred = " OR ".join(f"({c} > 0.0D)" for c in pos_cols)
            entries.append(
                f"named_struct('query_id', {sql_quote(qid)}, "
                f"'score', CASE WHEN ({pred}) AND {gate} "
                f"THEN {score} END)"
            )
        if not entries:
            return None
        from pyspark.sql import Window

        exploded = (
            scored.select(
                "doc_id",
                F.expr(
                    "explode(array({}))".format(", ".join(entries))
                ).alias("qs"),
            )
            .select("doc_id", "qs.query_id", "qs.score")
            .filter(F.col("score").isNotNull())
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            exploded.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "doc_id", "score")
        )

    # --------------------------------------------------------------------
    def _bmw_masks(self, pruned: DataFrame, df_map: dict[str, int], k: int):
        """Cross-term block-max WAND (classic BMW, driver-coordinated):
        compute ONE global score threshold θ shared by every query term,
        then per-term block keep-masks ``ub >= θ`` shipped into the
        distributed decode.

        θ is established driver-side: blocks are ranked by upper bound
        ``ub = idf_t · block_max`` across ALL terms; blobs of the few
        highest-ub blocks are fetched (partition/term-pruned collect, KBs)
        and decoded until k DISTINCT docs are seen; θ = the k-th best of
        their actual scores. Each decoded score lower-bounds that doc's
        global max-fold score, so θ lower-bounds the true k-th best —
        skipping any block with ub < θ is rank-safe, and a top-k doc's best
        component always survives, keeping its computed score exact (same
        argument as the per-term greedy, SURVEY.md §7.4).

        Returns {term: bool keep-mask} or None when not applicable (a term
        split across multiple postings rows — legacy/mid-compaction layout —
        where row-aligned masks cannot be keyed by term alone; or a term
        whose blob exceeds the driver-fetch cap ``bmw_max_term_df``; or the
        θ probe loop exhausting its block budget — which happens exactly
        when the corpus matches fewer than k distinct docs, where decoding
        every block driver-side AND executor-side would double the work).
        Stats land in ``self.last_bmw`` for plan evidence."""
        by_term = self._collect_block_meta(pruned)
        if by_term is None:
            return None
        out = self._bmw_masks_meta(by_term, df_map, k, {})
        if out is None:
            return None
        masks, theta = out
        total = sum(int(m.size) for m in masks.values())
        kept = sum(int(m.sum()) for m in masks.values())
        self.last_bmw = {"blocks_total": total, "blocks_kept": kept, "theta": theta}
        return masks

    def _collect_block_meta(self, pruned: DataFrame):
        """Per-term block metadata for driver-side mask computation (one
        KB-scale collect for the whole query/batch). None when a term is
        split across rows (legacy/mid-compaction layout — masks cannot be
        keyed by term alone) or the index predates per-block id bounds
        (pre-r2 layout without ``block_lasts`` — callers fall back to the
        per-term greedy, which never reads the bounds)."""
        if "block_lasts" not in pruned.columns:
            return None
        meta = pruned.select(
            "term", "block_max", "block_firsts", "block_lasts"
        ).collect()
        by_term: dict[str, object] = {}
        for r in meta:
            if r["term"] in by_term:
                return None
            by_term[r["term"]] = r
        return by_term

    def _max_live_doc_id(self) -> int:
        """Max doc id in the live dictionary (column-pruned aggregate, one
        KB-scale job, cached until ``refresh()``). -1 on an empty corpus."""
        if self._max_id_cache is None:
            r = self.doc_dict.agg(F.max("doc_id")).collect()[0][0]
            self._max_id_cache = -1 if r is None else int(r)
        return self._max_id_cache

    def _dead_ids_np(self) -> np.ndarray:
        if self._dead_cache is None:
            if self.tombstones is None:
                self._dead_cache = np.empty(0, dtype=np.int64)
            else:
                self._dead_cache = np.array(
                    sorted(int(r["doc_id"]) for r in self.tombstones.collect()),
                    dtype=np.int64,
                )
        return self._dead_cache

    def _live_df_map(self, pruned: DataFrame, df_map: dict[str, int]) -> dict[str, int]:
        """EXACT per-term df while tombstones exist. Stored df counts dead
        generations (update() never reads old postings — that is what makes
        it O(delta)), which drifts idf and can even flip it negative once a
        term's dead postings outnumber the live corpus (df > N ⇒ ln(<1)):
        scores go non-positive and the result gate empties. This pass
        decodes the PRUNED terms' id streams executor-side, counts dead
        hits per term (sorted searchsorted against the driver-pinned
        tombstone set), ships only (term, dead_count) rows back, and
        subtracts: live df = stored sum − dead hits. Runs ONLY in the
        transient tombstoned state — compact() restores the single-pass
        stored-df path — and makes every incremental state float64-exact
        against the live-corpus oracle, not merely rank-bounded."""
        dead = self._dead_ids_np()
        if dead.size == 0 or not df_map:
            return df_map
        _decode_postings = decode_postings

        def count_dead(batches):
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                terms, counts = [], []
                for i in range(n):
                    ids, _tfs, _dls = _decode_postings(
                        pdf["ids"].iat[i], pdf["tfs"].iat[i], pdf["dls"].iat[i],
                        np.asarray(pdf["block_firsts"].iat[i], np.int64),
                        np.asarray(pdf["block_lens"].iat[i], np.int64),
                    )
                    if ids.size:
                        pos = np.searchsorted(dead, ids)
                        pos[pos == dead.size] = dead.size - 1
                        n_dead = int((dead[pos] == ids).sum())
                    else:
                        n_dead = 0
                    terms.append(pdf["term"].iat[i])
                    counts.append(n_dead)
                yield pd.DataFrame({"term": terms, "dead": counts})

        rows = (
            pruned.select("term", "ids", "tfs", "dls", "block_firsts", "block_lens")
            .mapInPandas(count_dead, "term string, dead long")
            .collect()
        )
        dead_by: dict[str, int] = {}
        for r in rows:
            dead_by[r["term"]] = dead_by.get(r["term"], 0) + int(r["dead"])
        return {t: d - dead_by.get(t, 0) for t, d in df_map.items()}

    def _fetch_blob_row(self, term: str):
        """Partition/term-pruned driver fetch of one term's posting blobs."""
        tb = term_bucket(term, self.n_buckets)
        return (
            self.postings.filter((F.col("tb") == tb) & (F.col("term") == term))
            .select("ids", "tfs", "dls", "block_firsts", "block_lens",
                    "ids_offs", "tfs_offs", "dls_offs")
            .collect()[0]
        )

    def _prefetch_blobs(
        self, pruned: DataFrame, terms: list[str], df_map: dict[str, int],
        budget: int = 64 << 20,
    ) -> dict[str, object]:
        """ONE partition/term-pruned collect of many terms' posting blobs
        (driver-side job latency is per-JOB, not per-row — a per-term fetch
        loop serializes ~0.1 s jobs that no executor count can hide).
        Largest-df terms drop out first when the ~6 B/posting estimate
        exceeds the byte budget; misses simply fall back to the per-term
        fetch in the θ probe."""
        if not terms:
            return {}
        keep: list[str] = []
        est = 0
        for t in sorted(terms, key=lambda t: df_map[t]):
            est += df_map[t] * 6
            if est > budget:
                break
            keep.append(t)
        if not keep:
            return {}
        tbs = sorted({term_bucket(t, self.n_buckets) for t in keep})
        rows = (
            self.postings.filter(F.col("tb").isin(tbs) & F.col("term").isin(keep))
            .select("term", "ids", "tfs", "dls", "block_firsts", "block_lens",
                    "ids_offs", "tfs_offs", "dls_offs")
            .collect()
        )
        return {r["term"]: r for r in rows}

    def _bmw_masks_meta(
        self,
        by_term: dict,
        df_map: dict[str, int],
        k: int,
        blob_cache: dict,
        probe_df_cap: int | None = None,
    ) -> tuple[dict[str, np.ndarray], float] | None:
        """Core of cross-term BMW over precollected block metadata; returns
        ({term: keep-mask}, θ) or None. The blob cache is shared by the
        caller so a batch of queries probing the same hot terms fetches each
        blob once.

        With ``probe_df_cap`` set (batched path), θ is established from
        rare/mid-term blocks ONLY (df ≤ cap — small blobs, high actual
        scores); hot blobs are never fetched. Rank-safe: θ over a SUBSET of
        actual scores still lower-bounds the true k-th best. If the capped
        probe cannot reach k distinct docs, returns None so the caller falls
        back to the executor-side per-term greedy."""
        if any(df_map[t] > self.bmw_max_term_df for t in df_map):
            return None
        k1, b, avgdl = BM25_K1, BM25_B, self.avgdl
        idf = {t: bm25_idf(self.n_docs, df_map[t]) for t in by_term if t in df_map}
        flat: list[tuple[float, str, int]] = []  # (ub, term, block_idx)
        ub_by_term: dict[str, np.ndarray] = {}
        for t in df_map:
            r = by_term.get(t)
            if r is None:
                continue
            ub = idf[t] * np.asarray(r["block_max"], dtype=np.float64)
            ub_by_term[t] = ub
            flat.extend((float(u), t, i) for i, u in enumerate(ub))
        if not flat:
            return None
        flat.sort(key=lambda x: (-x[0], x[1], x[2]))
        # establish θ: decode highest-ub blocks until k distinct docs seen.
        # The probe loop is budgeted: a corpus matching fewer than k distinct
        # docs would otherwise decode EVERY block of every term driver-side
        # only to produce all-True masks (ADVICE r4)
        best: dict[int, float] = {}
        theta = -np.inf
        probe_budget = max(64, 4 * k)
        probes = 0
        for ub, t, bi in flat:
            if len(best) >= k:
                break
            if probe_df_cap is not None and df_map[t] > probe_df_cap:
                continue  # batched path: hot blobs never ship driver-side
            probes += 1
            if probes > probe_budget:
                return None
            row = blob_cache.get(t)
            if row is None:
                row = self._fetch_blob_row(t)
                blob_cache[t] = row
            nb = len(row["block_lens"])
            one = np.zeros(nb, dtype=bool)
            one[bi] = True
            ids, tfs, dls = decode_postings(
                row["ids"], row["tfs"], row["dls"], list(row["block_firsts"]),
                list(row["block_lens"]), one, list(row["ids_offs"]),
                list(row["tfs_offs"]), list(row["dls_offs"]),
            )
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            sat = tf / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
            sc = idf[t] * sat
            for d, s in zip(ids.tolist(), sc.tolist()):
                prev = best.get(d)
                if prev is None or s > prev:
                    best[d] = s
        if len(best) >= k:
            theta = float(np.sort(np.fromiter(best.values(), dtype=np.float64))[-k])
        elif probe_df_cap is not None:
            # capped probe could not establish θ (no/too-few rare matches):
            # signal the caller to use the greedy fallback rather than
            # shipping all-True masks
            return None
        return {t: ub >= theta for t, ub in ub_by_term.items()}, theta

    # --------------------------------------------------------------------
    def _query_cand_ids(
        self, q: Query, qdf: dict[str, int], blob_cache: dict | None = None
    ) -> np.ndarray | None:
        """Exact candidate-id superset for conjunctive / n-of-m shapes (the
        driver half of the single-query pruning in ``search``), or None when
        the shape / df caps do not apply. An EMPTY array means no doc can
        match the query at all."""
        req = required_words(q.root)
        if req:
            if req - set(qdf):
                return np.empty(0, np.int64)  # a required word is unindexed
            rare = min(req, key=lambda t: qdf[t])
            if qdf[rare] <= self.and_prune_max_df:
                return self._collect_term_ids(rare, blob_cache)
            return None
        cover = _nofm_cover_words(q.root, qdf)
        if cover is not None:
            if not cover:
                return np.empty(0, np.int64)  # fewer than n children present
            uniq_cover = list(dict.fromkeys(cover))
            if sum(qdf[t] for t in uniq_cover) <= self.and_prune_max_df:
                parts = [self._collect_term_ids(t, blob_cache) for t in uniq_cover]
                return np.unique(np.concatenate(parts))
        return None

    def _cand_fetch_terms(self, q: Query, qdf: dict[str, int]) -> list[str]:
        """The terms ``_query_cand_ids`` would fetch blobs for (its fetch
        PLAN, same caps) — lets the batched path prefetch them in one job."""
        req = required_words(q.root)
        if req:
            if req - set(qdf):
                return []
            rare = min(req, key=lambda t: qdf[t])
            return [rare] if qdf[rare] <= self.and_prune_max_df else []
        cover = _nofm_cover_words(q.root, qdf)
        if cover:
            uniq = list(dict.fromkeys(cover))
            if sum(qdf[t] for t in uniq) <= self.and_prune_max_df:
                return uniq
        return []

    def _batch_masks(
        self,
        pruned: DataFrame,
        batched: dict[str, Query],
        df_map: dict[str, int],
        k: int,
        wand: str,
    ) -> dict[str, np.ndarray] | None:
        """Per-term block keep-masks for the batched decode: the UNION of
        each member query's single-query masks (VERDICT r4 'what's wrong'
        #1 — the batched path used to decode the full union of all terms).
        A block kept for ANY member is decoded. Per-term spec shipped to
        the decode: ``(mask | None, greedy_k | None)`` — the executor ORs
        the driver mask with its own per-term greedy selection; a term
        absent from the spec decodes full.

        Exactness per member is the same argument as the single-query
        paths: BMW masks keep every top-k doc's best component (max-fold
        members — extra unioned blocks only add lower components that the
        max-fold ignores), the per-term greedy keeps ≥ k docs per term
        (rank-safe for max-fold), and id-bound masks keep every block
        containing a candidate (conjunctive / n-of-m members —
        non-candidates cannot pass the fold gate, candidates keep complete
        scores). ORing specs only ADDS blocks, so each member's guarantee
        survives the union. Stats land in ``self.last_batch_prune``.
        Returns None for full decode.

        Cost control (the load-bearing part): driver-side mask latency is
        CONSTANT in executor count, while the decode it saves shrinks — so
        the driver fetches only rare/mid blobs (θ-probes ≤
        ``batch_probe_max_df``, conjunctive rare/cover ≤
        ``and_prune_max_df``) in ONE partition-pruned job; hot and uniform
        max-fold members prune executor-side instead (per-term greedy, zero
        driver bytes). Below ``batch_prune_min_postings`` total volume the
        whole machinery disengages."""
        if wand == "off" or not self.wand_safe:
            return None
        if sum(df_map.values()) < self.batch_prune_min_postings:
            return None
        probe_cap = self.batch_probe_max_df
        # Classify members: driver-side masks only where a BOUNDED driver
        # fetch buys the measured reductions (θ from rare blobs, conjunctive
        # id-bounds); hot/uniform max-fold members prune EXECUTOR-side via
        # the per-term greedy, whose cost shrinks with executors — driver
        # latency must stay constant in batch heat or the batched path
        # stops scaling (the r5 ladder regression this replaces).
        bmw_q: list[tuple[Query, list[str], dict[str, int]]] = []
        cand_q: list[tuple[Query, list[str], dict[str, int]]] = []
        greedy_terms: set[str] = set()
        full_terms: set[str] = set()
        for q in batched.values():
            qterms = [t for t in dict.fromkeys(q.terms()) if t in df_map]
            if not qterms:
                continue
            qdf = {t: df_map[t] for t in qterms}
            if is_max_fold(q.root):
                if any(d <= probe_cap for d in qdf.values()) and all(
                    d <= self.bmw_max_term_df for d in qdf.values()
                ):
                    bmw_q.append((q, qterms, qdf))
                else:
                    greedy_terms.update(qterms)
            elif len(qdf) > 1:
                cand_q.append((q, qterms, qdf))
            else:
                # single positive term under a NOT/filter gate: greedy is
                # not rank-safe (excluded docs may occupy the top-k)
                full_terms.update(qterms)
        by_term = self._collect_block_meta(pruned) if (bmw_q or cand_q) else None
        if by_term is None:
            # legacy/split-row layout (or no member wants driver masks):
            # max-fold members degrade to the executor greedy, conjunctive
            # members to full decode
            for _, qterms, _qdf in bmw_q:
                greedy_terms.update(qterms)
            for _, qterms, _qdf in cand_q:
                full_terms.update(qterms)
            bmw_q, cand_q = [], []
        # ONE bounded prefetch job: θ-probe blobs (df ≤ probe_cap) plus the
        # conjunctive rare/cover blobs (_query_cand_ids' own fetch plan)
        want: set[str] = set()
        for q, qterms, qdf in bmw_q:
            want.update(t for t in qterms if qdf[t] <= probe_cap)
        for q, qterms, qdf in cand_q:
            want.update(self._cand_fetch_terms(q, qdf))
        blob_cache: dict[str, object] = self._prefetch_blobs(
            pruned, sorted(want), df_map
        )
        masks: dict[str, np.ndarray] = {}

        def _or(t: str, m: np.ndarray) -> None:
            masks[t] = (masks[t] | m) if t in masks else m

        for q, qterms, qdf in bmw_q:
            out = self._bmw_masks_meta(
                by_term, qdf, k, blob_cache, probe_df_cap=probe_cap
            )
            if out is None:
                greedy_terms.update(qterms)  # θ not establishable from rare blobs
            else:
                for t, m in out[0].items():
                    _or(t, m)
        for q, qterms, qdf in cand_q:
            cand = self._query_cand_ids(q, qdf, blob_cache)
            if cand is None:
                full_terms.update(qterms)
            else:
                # empty cand → all-False masks: no doc can match the member
                for t in qterms:
                    r = by_term.get(t)
                    if r is None:
                        # stale df_cache: the term is cached but its posting
                        # rows are gone (external compact without refresh());
                        # it has nothing to decode — contributes empty rather
                        # than KeyError-ing the whole batch (engine contract)
                        continue
                    _or(t, _select_blocks_intersect(r, cand))
        # merge into per-term decode specs; a full-decode need overrides
        spec: dict[str, tuple[np.ndarray | None, int | None]] = {}
        for t in set(masks) | greedy_terms:
            if t in full_terms:
                continue
            spec[t] = (masks.get(t), k if t in greedy_terms else None)
        total = sum(int(m.size) for m, gk in spec.values() if m is not None and gk is None)
        kept = sum(int(m.sum()) for m, gk in spec.values() if m is not None and gk is None)
        self.last_batch_prune = {
            "blocks_total": total,
            "blocks_kept": kept,
            "greedy_terms": sum(1 for _m, gk in spec.values() if gk is not None),
            "full_terms": len(full_terms),
            "terms": len(df_map),
        }
        if not spec:
            return None
        return spec

    # --------------------------------------------------------------------
    def _collect_term_ids(self, term: str, blob_cache: dict | None = None) -> np.ndarray:
        """Driver-side decode of ONE term's posting ids (for conjunctive
        pruning): fetch the term's compressed blobs (partition-pruned,
        bounded by its df — or straight from a batch prefetch cache) and
        decode locally. Returns sorted int64 ids."""
        if blob_cache is not None and term in blob_cache:
            rows = [blob_cache[term]]
        else:
            tb = term_bucket(term, self.n_buckets)
            rows = (
                self.postings.filter((F.col("tb") == tb) & (F.col("term") == term))
                .select("ids", "tfs", "dls", "block_firsts", "block_lens",
                        "ids_offs", "tfs_offs", "dls_offs")
                .collect()
            )
        parts = [
            decode_postings(
                r["ids"], r["tfs"], r["dls"], list(r["block_firsts"]),
                list(r["block_lens"]), None,
                list(r["ids_offs"]), list(r["tfs_offs"]), list(r["dls_offs"]),
            )[0]
            for r in rows
        ]
        ids = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.sort(ids)

    # --------------------------------------------------------------------
    def _decode(
        self,
        pruned: DataFrame,
        wand_k: int | None,
        cand_ids: np.ndarray | None = None,
        block_masks: dict[str, np.ndarray] | None = None,
    ) -> DataFrame:
        """Arrow-batched posting decode; the inner loop is NumPy over blocks.

        With ``wand_k`` set (rank-safe only for max-fold queries), blocks are
        visited in descending block-max order and skipped once >= k docs with
        saturation >= the block's upper bound are known — block-max WAND
        specialized to per-term lists (SURVEY.md §4 O12).

        With ``block_masks`` set, each term decodes its precomputed
        keep-mask (cross-term BMW, see ``_bmw_masks``). Batched specs
        (``_batch_masks``) are ``(mask | None, greedy_k | None)`` tuples:
        the executor ORs the driver mask with its own per-term greedy
        selection, so hot terms prune without any driver-side blob fetch.

        With ``cand_ids`` set (conjunctive pruning; mutually exclusive with
        the other two), a block is decoded only when its id range [first_i,
        last_i] intersects the candidate set, and decoded rows outside the
        set are dropped — exact, because every true match is a candidate."""
        cols = [
            "term", "ids", "tfs", "dls",
            "block_firsts", "block_lens", "ids_offs", "tfs_offs", "dls_offs", "block_max",
        ]
        # block_lasts: per-block id upper bounds (r2 schema). Legacy indexes
        # without it decode all blocks; the row filter keeps exactness.
        has_lasts = "block_lasts" in pruned.columns
        if has_lasts:
            cols.append("block_lasts")
        src = pruned.select(*cols)
        k1, b, avgdl = BM25_K1, BM25_B, self.avgdl

        def decode_map(batches):
            cand = None if cand_ids is None else np.asarray(cand_ids, dtype=np.int64)
            for pdf in batches:
                frames = []
                for r in pdf.itertuples():  # one row per term — tiny row count
                    keep = None
                    if wand_k is not None:
                        keep = _select_blocks_topk(r, wand_k, k1, b, avgdl)
                    elif block_masks is not None:
                        bm = block_masks.get(r.term)
                        if isinstance(bm, tuple):
                            # batched spec: (driver mask | None, greedy_k |
                            # None) — OR of both selections (adding blocks
                            # is always rank-safe)
                            m, gk = bm
                            keep = m
                            if gk is not None:
                                g = _select_blocks_topk(r, gk, k1, b, avgdl)
                                keep = g if keep is None else (keep | g)
                        else:
                            keep = bm
                        if keep is not None and keep.all():
                            keep = None  # full decode, skip the gather path
                    elif cand is not None and has_lasts:
                        keep = _select_blocks_intersect(r, cand)
                    ids, tfs, dls = decode_postings(
                        r.ids, r.tfs, r.dls, r.block_firsts, r.block_lens,
                        keep, r.ids_offs, r.tfs_offs, r.dls_offs,
                    )
                    if cand is not None and ids.size:
                        # guard the empty candidate set (stale df_cache or a
                        # corrupt index could hand us one): cand[pos] on an
                        # empty array would raise; the right answer is simply
                        # "no rows survive" (ADVICE r2)
                        if cand.size:
                            pos = np.searchsorted(cand, ids)
                            pos[pos == cand.size] = cand.size - 1
                            m = cand[pos] == ids
                            ids, tfs, dls = ids[m], tfs[m], dls[m]
                        else:
                            ids, tfs, dls = ids[:0], tfs[:0], dls[:0]
                    frames.append(
                        pd.DataFrame(
                            {
                                "term": np.repeat(r.term, ids.size),
                                "doc_id": ids,
                                "tf": tfs,
                                "dl": dls,
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        out = src.mapInPandas(decode_map, "term string, doc_id long, tf long, dl long")
        if self.tombstones is not None:
            out = out.join(F.broadcast(self.tombstones), "doc_id", "left_anti")
        return out

    # --------------------------------------------------------------------
    def _score(self, decoded: DataFrame, df_map: dict[str, int]) -> tuple[DataFrame, dict[str, str]]:
        """Per-(doc, term) BM25 score (JVM-side, pinned float order identical
        to oracle.term_scores), then pivot to per-doc term-score columns via
        conditional aggregation — whole-stage codegen, no Python."""
        # SQL strings, not Column chains: idf injection + the per-term pivot
        # were ~8 py4j round-trips per term — the dominant share of the
        # batched path's driver plan constant (BENCH/QUERY_DECOMP.json).
        # CASE branches are mutually exclusive so branch order can't change
        # the selected idf literal; the arithmetic shape (idf * (tf / (tf +
        # k1*((1-b) + (b*dl)/avgdl)))) is char-for-char the pinned one.
        terms = sorted(df_map)
        idf_sql = (
            "CASE "
            + " ".join(
                f"WHEN term = {sql_quote(t)} THEN {dlit(bm25_idf(self.n_docs, df_map[t]))}"
                for t in terms
            )
            + " ELSE 0.0D END"
        )
        s_sql = (
            f"({idf_sql}) * (CAST(tf AS DOUBLE) / (CAST(tf AS DOUBLE) + "
            f"{dlit(BM25_K1)} * ({dlit(1.0 - BM25_B)} + "
            f"({dlit(BM25_B)} * CAST(dl AS DOUBLE)) / {dlit(self.avgdl)})))"
        )
        s = decoded.withColumn("s", F.expr(s_sql))
        term_col = {t: f"_s_{i}" for i, t in enumerate(terms)}
        aggs = [
            F.expr(
                f"coalesce(max(CASE WHEN term = {sql_quote(t)} THEN s END), 0.0D)"
            ).alias(term_col[t])
            for t in terms
        ]
        return s.groupBy("doc_id").agg(*aggs), term_col

    # --------------------------------------------------------------------
    def _finish(
        self,
        query: Query,
        scored: DataFrame | None,
        term_col: dict[str, str],
        pos_filters,
        k: int,
    ) -> DataFrame:
        # candidate union (M2, matching.rs:70-84): POSITIVE term postings ∪
        # positive filter lists. The pivot table also carries NOT-subtree
        # terms (needed by the fold), so restrict to docs matching at least
        # one positive term.
        pred = None
        if scored is not None:
            pos_cols = [
                term_col[t]
                for t in dict.fromkeys(query.positive_terms())
                if t in term_col
            ]
            for c in pos_cols:
                p = F.col(c) > F.lit(0.0)
                pred = p if pred is None else (pred | p)

        filter_sources = [
            (name, value) for name, value in pos_filters if name in self.doc_dict.columns
        ]
        if scored is not None and pred is not None and not filter_sources:
            # common case: candidates == positive-term pivot rows; keep the
            # pivot single-referenced (a self-join here would recompute the
            # whole scan+decode twice — visible as duplicate postings scans
            # in the physical plan)
            return self._rank(query, scored.filter(pred), term_col, k)

        cand = None
        if scored is not None and pred is not None:
            scored = self._track(scored)  # referenced twice below
            cand = scored.filter(pred).select("doc_id")
        for name, value in filter_sources:
            ids = self.doc_dict.filter(F.col(name) == F.lit(value)).select("doc_id")
            cand = ids if cand is None else cand.unionByName(ids)
        if cand is None:
            return self._empty_result()
        cand = cand.distinct()
        if scored is not None:
            cand = cand.join(scored, "doc_id", "left")
        return self._rank(query, cand, term_col, k)

    # --------------------------------------------------------------------
    def _rank(self, query: Query, cand: DataFrame, term_col: dict[str, str], k: int | None) -> DataFrame:
        """Fold + gate + global top-k + dictionary join over a candidate
        pivot table (doc_id + per-term score columns [+ meta columns])."""
        meta_names = _collect_filter_names(query.root)
        if meta_names:
            meta_cols = ["doc_id"] + [c for c in ("lang", "repo") if c in self.doc_dict.columns]
            cand = cand.join(self.doc_dict.select(*meta_cols), "doc_id", "left")

        term_cols = {t: f"coalesce({c}, 0.0D)" for t, c in term_col.items()}
        meta_exprs = {n: n for n in ("lang", "repo") if n in cand.columns}
        gate, score = compile_fold(query.root, term_cols, meta_exprs)
        topk = (
            cand.withColumn("score", F.expr(score))
            .filter(F.expr(gate))
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        if k is not None:
            # broadcast the k winners into the dictionary join (SURVEY §4
            # O3/O5); with k=None the match set is unbounded, so it flows
            # through a regular join instead of a broadcast
            topk = F.broadcast(topk.limit(k))
        out = self.doc_dict.join(topk, "doc_id")
        return out.select("doc_id", "score", "repo", "path", "commit", "lang").orderBy(
            F.desc("score"), F.asc("doc_id")
        )


def _collect_filter_names(comp: QueryComp) -> set[str]:
    if isinstance(comp, Filter):
        return {comp.name}
    if isinstance(comp, Not):
        return _collect_filter_names(comp.comp)
    if isinstance(comp, NAmong):
        out: set[str] = set()
        for c in comp.among:
            out |= _collect_filter_names(c)
        return out
    return set()


# _select_blocks_intersect / _select_blocks_topk / _nofm_cover_words live in
# group_eval.py (shared by the executor-side group evaluation) and are
# imported above under their historical names.
