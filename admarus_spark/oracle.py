"""Pure NumPy reference oracle for the engine.

This module is the executable definition of "rank-identical" (SURVEY.md §5,
§7.3): the Spark engine must reproduce its top-k (doc ids AND float64 scores,
bit-for-bit) on every fixture query.

Semantics, derived from the reference:

- tokenizer: ``daemon/src/documents.rs:48-52`` (see tokenizer.py),
- candidate generation = union of positive terms' postings + positive
  filters' doc lists: ``daemon/src/query/matching.rs:70-84``,
- boolean match gate per AST fold: ``daemon/src/query/matching.rs:43-66``
  (Word -> present, Filter -> metadata equality, Not -> negation,
  NAmong -> at least n children match),
- retention: a candidate is kept iff the root matches — in the reference the
  boolean score is > 0 exactly when the root matches (``matching.rs:86-88``),
- ranking: pinned BM25 (the reference stores length-normalized tf and ranks
  client-side; the north star mandates BM25, pinned in SURVEY.md §7.3)::

      idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
      K(d)     = k1 * ((1 - b) + b * dl_d / avgdl)
      s(t, d)  = idf(t) * tf / (tf + K(d))          # "saturation" form
      k1 = 1.2, b = 0.75, float64 throughout

  AST score fold: Word -> s(t, d); Filter/Not -> 0.0 (predicates gate, they
  do not score); NAmong{n} -> if gate passes, sum of the n largest matched
  child scores (summed in descending order — pinned float order) divided by
  n, else 0. AND = NAmong{n=len} -> mean of all children; OR = NAmong{n=1}
  -> max.
- ties: (score desc, doc_id asc); reference sort is tie-unstable
  (``matching.rs:87``), we pin doc_id asc.
- doc ids: dense 0-based rank of (repo, path) lexicographic (the reference's
  arrival-order LocalCid counter, ``daemon/src/index/inner_im.rs:69-71``, is
  nondeterministic under parallelism).

Floating-point parity notes: idf is computed once per term with ``np.log``
and injected into both oracle and engine as a float64 constant, so the only
ops performed per posting are IEEE +,*,/ in a pinned order — bit-identical
between NumPy and the JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import BM25_B, BM25_K1
from .query.ast import Filter, NAmong, Not, Query, QueryComp, Word
from .query.parser import parse_query
from .tokenizer import tokenize

META_COLUMNS = ("lang", "repo")  # metadata columns usable as name=value filters


def bm25_idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)))


class OracleIndex:
    """In-memory inverted index + BM25 scorer over a pandas docs table.

    ``docs`` must have columns (repo, path, lang, content); doc ids are dense
    0-based ranks of lexicographic (repo, path).
    """

    def __init__(self, docs: pd.DataFrame):
        docs = docs.sort_values(["repo", "path"], kind="mergesort").reset_index(drop=True)
        self.docs = docs
        self.n_docs = len(docs)
        tokens = [tokenize(t) for t in docs["content"].tolist()]
        self.doc_len = np.array([len(t) for t in tokens], dtype=np.int64)
        self.total_tokens = int(self.doc_len.sum())
        self.avgdl = float(self.doc_len.sum()) / float(self.n_docs) if self.n_docs else 0.0
        # postings: term -> (doc_ids asc, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        acc: dict[str, dict[int, int]] = {}
        for doc_id, toks in enumerate(tokens):
            for t in toks:
                d = acc.setdefault(t, {})
                d[doc_id] = d.get(doc_id, 0) + 1
        for t, d in acc.items():
            ids = np.fromiter(sorted(d.keys()), dtype=np.int64, count=len(d))
            tfs = np.array([d[i] for i in ids], dtype=np.int64)
            self.postings[t] = (ids, tfs)
        self.meta = {
            c: docs[c].to_numpy() for c in META_COLUMNS if c in docs.columns
        }

    # --- golden-table exports (for parity tests) --------------------
    def tf_table(self) -> pd.DataFrame:
        rows = []
        for t in sorted(self.postings):
            ids, tfs = self.postings[t]
            for i, f in zip(ids.tolist(), tfs.tolist()):
                rows.append((i, t, f))
        return pd.DataFrame(rows, columns=["doc_id", "term", "tf"])

    def df_table(self) -> pd.DataFrame:
        return pd.DataFrame(
            sorted((t, len(ids)) for t, (ids, _) in self.postings.items()),
            columns=["term", "df"],
        )

    # --- scoring -----------------------------------------------------
    def term_scores(self, term: str, cand: np.ndarray, dl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(B, S) for a Word leaf over candidate doc ids."""
        tf = np.zeros(cand.size, dtype=np.float64)
        entry = self.postings.get(term)
        if entry is not None:
            ids, tfs = entry
            pos = np.searchsorted(ids, cand)
            pos_c = np.clip(pos, 0, ids.size - 1) if ids.size else pos
            hit = (pos < ids.size) & (ids.size > 0)
            if ids.size:
                hit &= ids[pos_c] == cand
            tf[hit] = tfs[pos_c[hit]].astype(np.float64)
            df = ids.size
        else:
            df = 0
        B = tf > 0
        S = np.zeros(cand.size, dtype=np.float64)
        if df > 0:
            idf = bm25_idf(self.n_docs, df)
            K = BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl.astype(np.float64) / self.avgdl)
            S = np.where(B, idf * (tf / (tf + K)), 0.0)
        return B, S

    def _fold(self, comp: QueryComp, cand: np.ndarray, dl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(comp, Word):
            return self.term_scores(comp.word, cand, dl)
        if isinstance(comp, Filter):
            vals = self.meta.get(comp.name)
            if vals is None:
                B = np.zeros(cand.size, dtype=bool)
            else:
                B = vals[cand] == comp.value
            return B, np.zeros(cand.size, dtype=np.float64)
        if isinstance(comp, Not):
            Bc, _ = self._fold(comp.comp, cand, dl)
            return ~Bc, np.zeros(cand.size, dtype=np.float64)
        if isinstance(comp, NAmong):
            Bs, Ss = [], []
            for ch in comp.among:
                Bc, Sc = self._fold(ch, cand, dl)
                Bs.append(Bc)
                Ss.append(Sc)
            Bm = np.stack(Bs)  # (n_children, n_cand)
            Sm = np.stack(Ss)
            matched = Bm.sum(axis=0)
            gate = matched >= comp.n
            masked = np.where(Bm, Sm, -np.inf)
            desc = -np.sort(-masked, axis=0)  # descending per candidate
            take = min(comp.n, len(comp.among))
            acc = np.zeros(cand.size, dtype=np.float64)
            for i in range(take):  # pinned left-fold in descending order
                row = desc[i]
                acc = acc + np.where(np.isfinite(row), row, 0.0)
            S = np.where(gate, acc / float(comp.n), 0.0)
            return gate, S
        raise TypeError(type(comp))

    def candidates(self, query: Query) -> np.ndarray:
        """M2 candidate generation (matching.rs:70-84), ascending doc ids."""
        cand: set[int] = set()
        for t in query.positive_terms():
            entry = self.postings.get(t)
            if entry is not None:
                cand.update(entry[0].tolist())
        for name, value in query.positive_filters():
            vals = self.meta.get(name)
            if vals is not None:
                cand.update(np.flatnonzero(vals == value).tolist())
        return np.array(sorted(cand), dtype=np.int64)

    def search(self, query: str | Query, k: int = 10) -> list[tuple[int, float]]:
        if isinstance(query, str):
            query = parse_query(query)
        cand = self.candidates(query)
        if cand.size == 0:
            return []
        dl = self.doc_len[cand]
        B, S = self._fold(query.root, cand, dl)
        keep = np.flatnonzero(B)
        if keep.size == 0:
            return []
        ids = cand[keep]
        scores = S[keep]
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def search_df(self, query: str | Query, k: int = 10) -> pd.DataFrame:
        res = self.search(query, k)
        return pd.DataFrame(res, columns=["doc_id", "score"])
