"""Query-time federation over several independently built indexes —
the online dual of ``pipelines/merge.merge_indexes`` (Lucene
``MultiReader`` / Elasticsearch ``dfs_query_then_fetch``: one query
fans out over many indexes, but every member scores under the
COMBINED collection statistics, so ranking is identical to a single
merged index).

Contract (tested in tests/test_federate.py): for indexes whose doc-id
spaces are disjoint (provided ids, or hash mode over disjoint corpora
— the same requirement ``merge_indexes`` enforces),

    FederatedEngine([a, b, ...]).search(...)  ==  QueryEngine(merged).search(...)

BITWISE, for every search mode the members expose.  This holds because
federation only rewrites each member's collection statistics in place:

- ``n_docs`` / ``total_tokens`` combine as exact integer sums, and
  ``avgdl`` is the single float division ``total_tokens / n_docs`` —
  the identical arithmetic ``build_index`` performs over the union
  corpus (pipelines/build_index.py:905);
- per-term ``df`` / ``cf`` combine as exact integer sums over the
  union vocabulary (disjoint doc spaces make the sums exact);
- per-doc accumulation stays ascending-term float64 inside each
  member, and a doc's matching terms are the same terms it would match
  in the merged index, so every per-doc score is the same float;
- members partition the doc space, so the union of exact per-member
  top-k contains the global top-k, and the final (score desc, doc_id
  asc) lexsort is the merged engine's own tie-break.

Reference analogue: the reference searches its per-channel evidence
tables separately and combines them under shared corpus statistics
(horus0.1.5.db.sql:59-109, util.py:947-1016); here the split is
per-index instead of per-channel.

At cluster scale each member engine is itself served by a
shard-partitioned actor pool (serve.py), so federation adds one
scatter level: query -> indexes -> shard actors, with only per-member
top-k rows crossing each level.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from horus_ner_ray.pipelines.query import QueryEngine

__all__ = ["FederatedEngine"]


class FederatedEngine:
    """Search several indexes as one, under combined global statistics.

    Members open eagerly (stats + df tables; shard mmaps stay lazy) and
    their in-memory statistics are REWRITTEN to the federation-combined
    values — every query mode a member supports then automatically
    scores as the merged index would.  Per-member tombstones keep
    working unchanged (live-docs masks are per member).
    """

    def __init__(self, index_dirs: list[str | Path],
                 cache_postings: int = 0):
        if not index_dirs:
            raise ValueError("need at least one index")
        per = cache_postings // len(index_dirs) if cache_postings > 0 else 0
        self.members = [QueryEngine(d, cache_postings=per)
                        for d in index_dirs]
        k1 = {m.k1 for m in self.members}
        b = {m.b for m in self.members}
        if len(k1) != 1 or len(b) != 1:
            raise ValueError(
                f"members disagree on BM25 params (k1={sorted(k1)}, "
                f"b={sorted(b)}) — scores would not be comparable")
        # combined statistics: exact integer sums; ONE float division for
        # avgdl — bitwise the merged index's own stats arithmetic
        self.n_docs = sum(m.n_docs for m in self.members)
        self.total_tokens = sum(m.total_tokens for m in self.members)
        avgdl = self.total_tokens / self.n_docs if self.n_docs else 0.0
        self.avgdl = max(float(avgdl), 1e-9)
        # union vocabulary with summed df/cf (object arrays of strings;
        # np.unique sorts them — the same order every member's sorted
        # vocab already uses)
        allv = np.concatenate([m._vocab for m in self.members])
        uv, inv = np.unique(allv, return_inverse=True)
        df = np.zeros(len(uv), dtype=np.int64)
        cf = np.zeros(len(uv), dtype=np.int64)
        np.add.at(df, inv, np.concatenate([m._df for m in self.members]))
        np.add.at(cf, inv, np.concatenate([m._cf for m in self.members]))
        self._vocab, self._df, self._cf = uv, df, cf
        # rewrite each member's statistics in place: its sorted vocab
        # gathers the combined df/cf (searchsorted — every member term is
        # in the union by construction)
        for m in self.members:
            pos = np.searchsorted(uv, m._vocab)
            m._df = df[pos]
            m._cf = cf[pos]
            m.n_docs = self.n_docs
            m.total_tokens = self.total_tokens
            m.avgdl = self.avgdl

    # -- federated query modes -------------------------------------------

    @staticmethod
    def _merge_topk(parts: list[list[tuple[int, float]]],
                    k: int) -> list[tuple[int, float]]:
        """Exact global top-k from exact per-member top-k (members
        partition the doc space): (score desc, doc_id asc)."""
        rows = [r for p in parts for r in p]
        if not rows:
            return []
        d = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
        s = np.fromiter((r[1] for r in rows), dtype=np.float64,
                        count=len(rows))
        order = np.lexsort((d, -s))[:k]
        return [(int(d[i]), float(s[i])) for i in order]

    def search(self, text: str, k: int = 10, **kw) -> list[tuple[int, float]]:
        """Federated BM25 — accepts every ``QueryEngine.search`` kwarg
        (mode/role/tool/ts bounds/role_weights/exclude/boosts)."""
        return self._merge_topk(
            [m.search(text, k=k, **kw) for m in self.members], k)

    def search_lm(self, text: str, k: int = 10,
                  **kw) -> list[tuple[int, float]]:
        """Federated Dirichlet query likelihood (combined cf /
        total_tokens feed each member's smoothing)."""
        return self._merge_topk(
            [m.search_lm(text, k=k, **kw) for m in self.members], k)

    def match_count(self, text: str, **kw) -> int:
        """Federated total hits: exact sum of member counts."""
        return sum(m.match_count(text, **kw) for m in self.members)

    def global_df(self, term: str) -> int:
        i = int(np.searchsorted(self._vocab, term))
        if i < len(self._vocab) and self._vocab[i] == term:
            return int(self._df[i])
        return 0
