"""BM25 top-k retrieval over the built index.

Reference analogue: the retrieval half PageIndex documents but does not ship
(/root/reference/README.md:176-208 — LLM node selection over the tree). Here:
exact Okapi BM25 with deterministic tie-break (score desc, doc_id asc), at
turn or conversation granularity (the conv_id/turn_idx hierarchy preserved
from the reference's tree model, SURVEY.md §1.2).

Two scorers over the same fetched compressed postings:
  - ``exhaustive``: decode every posting of every query term, vectorized
    contribution arrays, stable-sorted segmented reduction. The float64
    accumulation order (ascending term, then ascending doc) is bit-identical
    to the oracle's.
  - ``block-max WAND`` (wand.py): document-at-a-time with per-block max-score
    pruning; must return the identical top-k (tested property). Used when
    posting volume is large enough to benefit.

Rank-identity guarantee (SURVEY.md §7.3): per-doc scores are pure per-row
functions of (tf, dl, idf, N, avgdl); only the accumulation order of a doc's
per-term contributions could differ across implementations — it is pinned to
ascending-term order everywhere (engine, WAND, oracle).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..stages.codec import decode_consolidated
from ..stages.postings import term_partition
from ..state.shards import PostingShard
from ..tokenizer import tokenize
from .build import load_meta
from .wand import block_max_wand


def _score_arrays(term_data: dict[str, dict], k1: float, b: float, avgdl: float, decoded=None):
    """-> (doc_ids asc-within-term, contribs) concatenated in ascending term order.

    ``decoded``: optional cache dict term -> (ids, contrib) of pre-scored
    arrays (SearchEngine's term cache) — hot Zipf terms repeat across
    queries, so re-decoding them per query would dominate latency."""
    docs_list, contrib_list = [], []
    for t in sorted(term_data):
        if decoded is not None and t in decoded:
            ids, contrib = decoded[t]
        else:
            info = term_data[t]
            ids, tfs, dls = decode_consolidated(info)
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            contrib = info["idf"] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            if decoded is not None:
                decoded[t] = (ids, contrib)
        docs_list.append(ids)
        contrib_list.append(contrib)
    if not docs_list:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return np.concatenate(docs_list), np.concatenate(contrib_list)


def exhaustive_scores(term_data: dict[str, dict], k1: float, b: float, avgdl: float, decoded=None):
    """Exact (doc_ids asc, scores): segmented float64 sum in term order."""
    docs, contribs = _score_arrays(term_data, k1, b, avgdl, decoded)
    if len(docs) == 0:
        return docs, contribs
    order = np.argsort(docs, kind="stable")  # stable: preserves term order per doc
    docs, contribs = docs[order], contribs[order]
    uniq, starts = np.unique(docs, return_index=True)
    scores = np.add.reduceat(contribs, starts)  # sequential left-to-right per segment
    return uniq, scores


def topk_from_scores(docs: np.ndarray, scores: np.ndarray, k: int):
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]


class SearchEngine:
    """Driver-side facade over the PostingShard actor pool.

    Init cost (actor creation + shard load) is paid once; queries then touch
    only the shards owning their terms.
    """

    def __init__(self, index_dir: str, num_shards: int = 8):
        self.meta = load_meta(index_dir)
        self.k1 = self.meta["config"]["k1"]
        self.b = self.meta["config"]["b"]
        self.avgdl = self.meta["avgdl"]
        self.num_partitions = self.meta["config"]["num_partitions"]
        self.num_shards = min(num_shards, self.num_partitions)
        part_of = [[] for _ in range(self.num_shards)]
        for pid in range(self.num_partitions):
            part_of[pid % self.num_shards].append(pid)
        self.shards = [
            PostingShard.remote(index_dir, pids) for pids in part_of
        ]
        # Block until every shard has loaded its partitions: serving latency
        # must reflect steady state, not lazy actor init racing cluster
        # cleanup from a just-finished build.
        ray.get([s.num_terms.remote() for s in self.shards])
        # doc_id -> (conv_id, turn_idx) inverse map from conv offsets.
        off = pq.read_table(os.path.join(index_dir, "conv_offsets.parquet"))
        self.conv_ids = np.asarray(off.column("conv_id").to_pylist(), dtype=object)
        self.conv_bases = off.column("base").to_numpy().astype(np.int64)
        # decoded-term cache: term -> (doc_ids, contribs) | None (absent).
        # Zipfian query streams hit the same hot terms constantly; bounded by
        # element count (~8 GB at the default budget, far less in practice).
        self._decoded: dict[str, tuple | None] = {}
        self._cache_elems = 0
        self._cache_budget = 512_000_000

    def _shard_for_term(self, term: str) -> int:
        return term_partition(term, self.num_partitions) % self.num_shards

    def fetch_terms(self, terms: list[str]) -> dict[str, dict]:
        by_shard: dict[int, list[str]] = defaultdict(list)
        for t in terms:
            by_shard[self._shard_for_term(t)].append(t)
        futures = [self.shards[s].fetch.remote(ts) for s, ts in by_shard.items()]
        out: dict[str, dict] = {}
        for res in ray.get(futures):
            out.update(res)
        return out

    def doc_location(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = np.searchsorted(self.conv_bases, doc_ids, side="right") - 1
        return self.conv_ids[idx], (doc_ids - self.conv_bases[idx]).astype(np.int32)

    def _term_arrays(self, terms: list[str]) -> dict[str, tuple]:
        """Decoded (doc_ids, contribs) per term, via the cache; fetches and
        decodes only terms not yet cached (absent terms negative-cached)."""
        missing = [t for t in terms if t not in self._decoded]
        if missing:
            fetched = self.fetch_terms(missing)
            for t in missing:
                info = fetched.get(t)
                if info is None:
                    self._decoded[t] = None
                    continue
                ids, tfs, dls = decode_consolidated(info)
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                contrib = info["idf"] * tf * (self.k1 + 1.0) / (
                    tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                )
                self._decoded[t] = (ids, contrib)
                self._cache_elems += 2 * len(ids)
        if self._cache_elems > self._cache_budget:
            self._decoded.clear()
            self._cache_elems = 0
        return {t: v for t in terms if (v := self._decoded.get(t)) is not None}

    def _exhaustive(self, arrays: dict[str, tuple]):
        """Exact (doc_ids asc, scores) from cached per-term arrays; float64
        accumulation in ascending (term, doc) order — identical to oracle."""
        docs = np.concatenate([arrays[t][0] for t in sorted(arrays)])
        contribs = np.concatenate([arrays[t][1] for t in sorted(arrays)])
        order = np.argsort(docs, kind="stable")
        docs, contribs = docs[order], contribs[order]
        uniq, starts = np.unique(docs, return_index=True)
        return uniq, np.add.reduceat(contribs, starts)

    def search(
        self, query_text: str, k: int = 10, granularity: str = "turn", use_wand: bool = False
    ) -> list[dict]:
        terms = sorted(set(tokenize(query_text)))
        if use_wand and granularity == "turn":
            term_data = self.fetch_terms(terms)
            if not term_data:
                return []
            if len(term_data) > 1:
                docs, scores = block_max_wand(term_data, k, self.k1, self.b, self.avgdl)
            else:
                d, s = exhaustive_scores(term_data, self.k1, self.b, self.avgdl)
                docs, scores = topk_from_scores(d, s, k)
            convs, turns = self.doc_location(docs)
            return [
                {
                    "rank": r,
                    "doc_id": int(docs[r]),
                    "score": float(scores[r]),
                    "conv_id": str(convs[r]),
                    "turn_idx": int(turns[r]),
                }
                for r in range(len(docs))
            ]
        arrays = self._term_arrays(terms)
        if not arrays:
            return []
        if granularity == "conv":
            docs, scores = self._exhaustive(arrays)
            conv_idx = np.searchsorted(self.conv_bases, docs, side="right") - 1
            # docs ascending => per-conv accumulation in doc order (== oracle)
            uniq, starts = np.unique(conv_idx, return_index=True)
            conv_scores = np.add.reduceat(scores, starts)
            names = self.conv_ids[uniq]
            order = np.lexsort((names, -conv_scores))[:k]
            return [
                {"rank": r, "conv_id": str(names[i]), "score": float(conv_scores[i])}
                for r, i in enumerate(order)
            ]
        d, s = self._exhaustive(arrays)
        docs, scores = topk_from_scores(d, s, k)
        convs, turns = self.doc_location(docs)
        return [
            {
                "rank": r,
                "doc_id": int(docs[r]),
                "score": float(scores[r]),
                "conv_id": str(convs[r]),
                "turn_idx": int(turns[r]),
            }
            for r in range(len(docs))
        ]

    def search_batch(
        self, queries: list[tuple[int, str]], k: int = 10, granularity: str = "turn",
        use_wand: bool = False,
    ) -> pa.Table:
        """Score a query set; one shard round-trip for ALL queries' terms."""
        all_terms = sorted({t for _, q in queries for t in tokenize(q)})
        self._term_arrays(all_terms)  # one bulk fetch+decode warms the cache
        rows = {"query_id": [], "rank": [], "doc_id": [], "score": [], "conv_id": [], "turn_idx": []}
        for qid, qtext in queries:
            terms = sorted(set(tokenize(qtext)))
            if use_wand:
                sub = self.fetch_terms(terms)
                if not sub:
                    continue
                if len(sub) > 1:
                    docs, scores = block_max_wand(sub, k, self.k1, self.b, self.avgdl)
                else:
                    d, s = exhaustive_scores(sub, self.k1, self.b, self.avgdl)
                    docs, scores = topk_from_scores(d, s, k)
            else:
                arrays = self._term_arrays(terms)
                if not arrays:
                    continue
                d, s = self._exhaustive(arrays)
                docs, scores = topk_from_scores(d, s, k)
            convs, turns = self.doc_location(docs)
            n = len(docs)
            rows["query_id"].extend([qid] * n)
            rows["rank"].extend(range(n))
            rows["doc_id"].extend(docs.tolist())
            rows["score"].extend(scores.tolist())
            rows["conv_id"].extend(convs.tolist())
            rows["turn_idx"].extend(turns.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "rank": pa.array(rows["rank"], type=pa.int32()),
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "score": pa.array(rows["score"], type=pa.float64()),
                "conv_id": pa.array(rows["conv_id"], type=pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            }
        )

    def shutdown(self):
        for a in self.shards:
            ray.kill(a)
        self.shards = []
