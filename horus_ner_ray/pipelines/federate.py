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

__all__ = ["FederatedEngine", "FederatedQueryService",
           "apply_stats_override", "combine_stats"]


def combine_stats(engines: list[QueryEngine]):
    """Federation-combined collection statistics over member engines:
    exact integer sums for n_docs / total_tokens / per-term df / cf over
    the union vocabulary, ONE float division for avgdl — bitwise the
    arithmetic ``build_index`` performs over the union corpus.  Returns
    (n_docs, total_tokens, avgdl, union_vocab, df, cf)."""
    n_docs = sum(m.n_docs for m in engines)
    total_tokens = sum(m.total_tokens for m in engines)
    avgdl = max(float(total_tokens / n_docs if n_docs else 0.0), 1e-9)
    allv = np.concatenate([m._vocab for m in engines])
    uv, inv = np.unique(allv, return_inverse=True)
    df = np.zeros(len(uv), dtype=np.int64)
    cf = np.zeros(len(uv), dtype=np.int64)
    np.add.at(df, inv, np.concatenate([m._df for m in engines]))
    np.add.at(cf, inv, np.concatenate([m._cf for m in engines]))
    return n_docs, total_tokens, avgdl, uv, df, cf


def apply_stats_override(engine: QueryEngine, n_docs: int,
                         total_tokens: int, avgdl: float,
                         uv: np.ndarray, df: np.ndarray,
                         cf: np.ndarray) -> None:
    """Rewrite ``engine``'s in-memory collection statistics to the
    federation-combined values: its sorted vocab gathers the combined
    df/cf (searchsorted — every member term is in the union by
    construction), and the scalar stats replace outright.  Every query
    mode the engine supports then scores as the merged index would."""
    pos = np.searchsorted(uv, engine._vocab)
    engine._df = df[pos]
    engine._cf = cf[pos]
    engine.n_docs = int(n_docs)
    engine.total_tokens = int(total_tokens)
    engine.avgdl = float(avgdl)


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
        combined = combine_stats(self.members)
        (self.n_docs, self.total_tokens, self.avgdl,
         self._vocab, self._df, self._cf) = combined
        for m in self.members:
            apply_stats_override(m, *combined)

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


from horus_ner_ray.serve import QueryService  # noqa: E402  (no cycle:
# serve.py has no top-level package imports, and pipelines/query.py only
# imports this module inside ScorerActor.__init__)


class FederatedQueryService(QueryService):
    """The serving shape of federation: one warm actor pool spanning ALL
    member indexes, every actor's statistics rewritten to the combined
    values via one ``ray.put`` broadcast — the scatter/gather routes of
    ``QueryService`` then merge partials across indexes exactly as they
    merge across shard subsets (doc spaces are disjoint).

    Every scatter route of ``QueryService`` (search / batch / count /
    explain / histogram / sorted / recency / adjacency / percentiles /
    field_stats / rescore / fused / collapse / grouped / snippets /
    fragments / relaxed) inherits unchanged and stays exact — partials
    merge across indexes exactly as across shard subsets.  Single-actor
    DICTIONARY routes are overridden: member dictionaries differ, so
    suggest/complete scatter to one actor per index and re-rank the
    deduped union under the same contracts (exact — a global winner is a
    local winner in its owning member); term_vector probes each index
    (the owner answers); the corrected rewrite consults the combined
    vocabulary held on the driver."""

    def __init__(self, index_dirs, n_actors_per_index: int = 2,
                 mode: str = "or"):
        import ray

        from horus_ner_ray.pipelines.query import ScorerActor
        from horus_ner_ray.state.shards import IndexPaths
        from horus_ner_ray.util import worker_runtime_env

        # driver-side federation view: combined stats + union vocab (the
        # same O(vocab) state every serving actor already holds)
        self._fed = FederatedEngine(list(index_dirs))
        self._stats_ref = ray.put(
            (self._fed.n_docs, self._fed.total_tokens, self._fed.avgdl,
             self._fed._vocab, self._fed._df, self._fed._cf))
        self.index_dirs = [str(d) for d in index_dirs]
        self.index_dir = None  # multi-index: _fetch_rows probes members
        self._placements: list[tuple[str, list[int]]] = []
        self._index_first_actor: list[int] = []
        for d in self.index_dirs:
            n_shards = len(IndexPaths(d).published_shards())
            na = max(1, min(int(n_actors_per_index), n_shards))
            self._index_first_actor.append(len(self._placements))
            for i in range(na):
                self._placements.append((d, list(range(i, n_shards, na))))
        env = worker_runtime_env()
        acls = ray.remote(num_cpus=1)(ScorerActor)
        if env:
            acls = acls.options(runtime_env=env)
        self._cls = acls
        self.mode = mode
        self.actors = [self._spawn(i) for i in range(len(self._placements))]
        ray.get([a.warm.remote() for a in self.actors])

    def _spawn(self, i: int):
        d, sub = self._placements[i]
        return self._cls.remote(d, self.mode, sub, 8_000_000,
                                self._stats_ref)

    def _fetch_rows(self, doc_ids, columns=None):
        """Each doc lives in exactly one member's docstore — probe all
        members, concat the found rows."""
        import pandas as pd

        from horus_ner_ray.pipelines.query import fetch_docs

        parts = [fetch_docs(d, doc_ids, columns=columns)
                 for d in self.index_dirs]
        parts = [p for p in parts if len(p)]
        if not parts:
            return pd.DataFrame(columns=columns or [])
        return pd.concat(parts, ignore_index=True)

    def _fetch_conv_rows(self, conv_ids):
        """A conversation's turns live in one member's docstore — probe
        all members, concat."""
        import pandas as pd

        from horus_ner_ray.pipelines.query import fetch_conv_docs

        parts = [fetch_conv_docs(d, conv_ids) for d in self.index_dirs]
        parts = [p for p in parts if len(p)]
        if not parts:
            return pd.DataFrame()
        return (pd.concat(parts, ignore_index=True)
                .sort_values("doc_id", kind="stable")
                .reset_index(drop=True))

    def _per_index_call(self, fn):
        """One actor per member index (dictionary routes)."""
        refs = [fn(self.actors[i]) for i in self._index_first_actor]
        return [self._gather_one(i, ref, fn)
                for i, ref in zip(self._index_first_actor, refs)]

    def stats(self) -> dict:
        from horus_ner_ray.pipelines.delete import read_tombstones

        n_del = 0
        for d in self.index_dirs:
            t = read_tombstones(d)
            n_del += 0 if t is None else int(len(t))
        return {"n_docs": self._fed.n_docs,
                "total_tokens": self._fed.total_tokens,
                "avgdl": self._fed.avgdl,
                "n_indexes": len(self.index_dirs),
                "n_deleted": n_del,
                "n_actors": len(self.actors)}

    def suggest(self, word: str, k: int = 5,
                max_dist: int = 2) -> list[dict]:
        """Union of member dictionary scans (combined df rides every
        member), deduped by term, re-ranked under the shared (distance
        asc, df desc, term asc) contract — exact: a global top-k term is
        inside the local top-k of any member whose vocabulary holds it."""
        parts = self._per_index_call(
            lambda a: a.suggest.remote(word, k, max_dist))
        best = {t: (int(d), int(df)) for p in parts for t, d, df in p}
        ranked = sorted(best.items(),
                        key=lambda kv: (kv[1][0], -kv[1][1], kv[0]))[:k]
        return [{"rank": r + 1, "term": t, "dist": d, "df": df}
                for r, (t, (d, df)) in enumerate(ranked)]

    def complete(self, prefix: str, k: int = 10) -> list[dict]:
        """Union of member prefix expansions re-ranked (df desc, term
        asc) — exact by the same local-winner argument."""
        parts = self._per_index_call(lambda a: a.complete.remote(prefix, k))
        best = {t: int(df) for p in parts for t, df in p}
        ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [{"rank": r + 1, "term": t, "df": df}
                for r, (t, df) in enumerate(ranked)]

    def term_vector(self, doc_id: int) -> list[dict]:
        """Probe one actor per index; the member owning the doc returns
        rows, the rest return []."""
        parts = self._per_index_call(
            lambda a: a.term_vector.remote(int(doc_id)))
        rows = next((p for p in parts if p), [])
        return [{"term": t, "tf": int(f), "df": int(df)}
                for t, f, df in rows]

    def search_corrected(self, text: str, k: int = 10,
                         max_dist: int = 2) -> dict:
        """Federated 'did you mean': term presence checks against the
        COMBINED vocabulary (driver-side), absent terms rewrite via the
        federated suggest contract, then the ordinary scatter."""
        from horus_ner_ray.pipelines.query import query_terms

        out: set[str] = set()
        for t in query_terms(text):
            if self._fed.global_df(t) > 0:
                out.add(t)
            else:
                s = self.suggest(t, k=1, max_dist=max_dist)
                if s:
                    out.add(s[0]["term"])
        terms = sorted(out)
        hits = self.search(" ".join(terms), k=k) if terms else []
        return {"corrected": terms, "hits": hits}
