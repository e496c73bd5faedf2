"""Doc-range scoring actors: the distributed half of query execution.

The index is TERM-partitioned (posting shards), so a document's score for a
multi-term query is spread across shards and cannot be finalized there. The
scorer pool re-partitions query execution by DOC RANGE: scorer r owns docs
[lo_r, hi_r) (ranges aligned to conversation boundaries so conv/segment
rollups never split) and, per query,

    1. pulls the [lo, hi) slice of each term's decoded (doc_ids, factor)
       sub-lists from the posting shards (once — slices are cached per
       scorer, so a Zipfian query stream re-scores hot terms from local
       memory with ZERO shard traffic),
    2. scatter-adds idf * factor into a dense accumulator over its range,
       iterating terms in ascending order — per-doc float64 accumulation
       order is identical to the driver scorer and the oracle,
    3. returns its range-local top-k (score desc, doc_id asc).

The driver merges R tie-broken size-k partials (ranges are disjoint, so the
global top-k is exactly the best k of the union). This removes both driver
ceilings VERDICT.md flagged: the O(n_docs) dense accumulator lives sharded
across scorers, and per-query CPU (decode slices + accumulate + top-k) scales
with the actor pool instead of one driver core.
"""

from __future__ import annotations

import numpy as np
import ray


@ray.remote(num_cpus=0)  # co-resident with the shard pool: scorers burn CPU
# in a different query phase than shards (accumulate vs decode), so they
# don't RESERVE cores — reserving would deadlock actor placement on small
# clusters where the shard pool already holds every CPU slot.
class RangeScorer:
    """Owns doc range [lo, hi) plus the conversation table slice covering it.

    ``shards``: the PostingShard handles (same pool the driver routes to);
    ``index_dir``/``row_lo``/``row_hi``: where to mmap its conv-table slice
    from (rows [row_lo, row_hi) of conv_offsets.arrow — state/convtable.py;
    the slice's first base == lo and every conv in it ends before hi). The
    actor loads the slice itself instead of deserializing a driver-shipped
    object array (round 3's O(#convs/R) per-actor ship, VERDICT.md r3)."""

    # ranges wider than this use sort-based accumulation instead of a dense
    # range-length buffer (same guard as SearchEngine._BINCOUNT_MAX_N: a
    # dense float64 buffer over a 10^12/R-doc range would be hundreds of GB;
    # the sort path is O(postings log postings) and bit-identical because a
    # stable doc-order sort preserves the ascending-term add order per doc)
    _DENSE_MAX_RANGE = 64_000_000

    def __init__(self, shards, lo: int, hi: int, index_dir: str,
                 row_lo: int, row_hi: int,
                 dense_max_range: int | None = None,
                 k1: float = 1.5, b: float = 0.75, avgdl: float = 1.0,
                 attrs_dir: str | None = None, tombstones=None,
                 docvalues_dir: str | None = None):
        from .convtable import ConvTable

        self.shards = list(shards)
        self._dv_dir = docvalues_dir
        self.lo = int(lo)
        self.hi = int(hi)
        # range-local (0-based) tombstoned doc ids: every scoring surface
        # of this range masks them (pipelines/tombstones.py — df/idf still
        # count deleted docs, Lucene semantics)
        if tombstones is not None and len(tombstones):
            t = np.asarray(tombstones, dtype=np.int64)
            a = int(np.searchsorted(t, self.lo, side="left"))
            b_ = int(np.searchsorted(t, self.hi, side="left"))
            self._tomb_local = t[a:b_] - self.lo
        else:
            self._tomb_local = np.empty(0, dtype=np.int64)
        # attribute sidecar (pipelines/attrs.py): each scorer loads ONLY its
        # [lo, hi) slice of a filter clause's doc ids (parquet row-group
        # pruning on the sidecar's lo/hi bound columns) — per-scorer filter
        # state is O(its docs), the 100-TB-safe shape
        self._attrs_dir = attrs_dir
        self._attr_store = None
        self._attr_cache: dict[tuple, np.ndarray] = {}
        # mmap-backed slice of the conv table (zero-copy bases view).
        # cache_names: rollup queries touch most of the slice's convs, so
        # the name boxing amortizes once per actor (O(slice), never
        # driver-shipped) instead of re-boxing per query
        self._convs = ConvTable(
            index_dir, row_range=(int(row_lo), int(row_hi)), cache_names=True
        )
        self.bases = self._convs.bases
        self.n = self.hi - self.lo
        self.k1, self.b, self.avgdl = float(k1), float(b), float(avgdl)
        self.dense = self.n <= (
            dense_max_range if dense_max_range is not None else self._DENSE_MAX_RANGE
        )
        if self.dense:
            self.buf = np.zeros(self.n, dtype=np.float64)
            self.touched = np.zeros(self.n, dtype=bool)
        # term -> list of (ids_slice - lo, contrib_slice) with idf applied
        self._cache: dict[str, list[tuple]] = {}
        self._cache_elems = 0
        self._cache_budget = 64_000_000
        # per-range WAND path: term -> COMPRESSED block-sliced infos
        # (separate cache — WAND wants lazy block decode, not dense arrays)
        self._wand_cache: dict[str, list[dict]] = {}
        self._wand_bytes = 0
        self._wand_budget = 256_000_000

    def _ensure_terms(self, term_idfs: list[tuple[str, float]]) -> dict[str, list[tuple]]:
        """-> {term: [(local_ids, contrib), ...]} for the query, as a LOCAL
        dict — a cache eviction can never drop a term this query still needs
        (the cache is a best-effort store, evicted wholesale over budget)."""
        local: dict[str, list[tuple]] = {}
        missing = []
        for t, _ in term_idfs:
            if t in self._cache:
                local[t] = self._cache[t]
            else:
                missing.append(t)
        if not missing:
            return local
        # shard-side range slicing: only this range's postings leave the
        # shards — R scorers pull 1x the decoded postings in aggregate
        futures = [s.fetch_scored_range.remote(missing, self.lo, self.hi) for s in self.shards]
        fetched: dict[str, list[dict]] = {t: [] for t in missing}
        for res in ray.get(futures):
            for t, infos in res.items():
                fetched[t].extend(infos)
        idf_of = dict(term_idfs)
        for t in missing:
            slices = []
            for info in fetched[t]:
                ids = info["ids"]
                if len(ids):
                    contrib = idf_of[t] * info["factor"]
                    slices.append((ids - self.lo, contrib))
                    self._cache_elems += 2 * len(ids)
            local[t] = slices
            self._cache[t] = slices
        if self._cache_elems > self._cache_budget:
            self._cache.clear()
            self._cache_elems = 0
        return local

    def _accumulate(self, terms: list[str], arrays: dict[str, list[tuple]]):
        if self.dense:
            buf, touched = self.buf, self.touched
            hit = False
            for t in terms:  # ascending term order == oracle accumulation order
                for ids, contrib in arrays.get(t, ()):
                    buf[ids] += contrib
                    touched[ids] = True
                    hit = True
            if not hit:
                return None
            uniq = np.flatnonzero(touched)
            vals = buf[uniq].copy()
            buf[uniq] = 0.0
            touched[uniq] = False
            return uniq, vals
        # sort path: concatenate sub-lists in ascending-term order, stable
        # sort by doc — per-doc contributions keep term order, reduceat sums
        # them exactly as the dense scatter-add does
        id_parts, c_parts = [], []
        for t in terms:
            for ids, contrib in arrays.get(t, ()):
                id_parts.append(ids)
                c_parts.append(contrib)
        if not id_parts:
            return None
        ids = np.concatenate(id_parts)
        contribs = np.concatenate(c_parts)
        order = np.argsort(ids, kind="stable")
        ids, contribs = ids[order], contribs[order]
        uniq, starts = np.unique(ids, return_index=True)
        return uniq, np.add.reduceat(contribs, starts)

    def _ensure_lm_terms(
        self, term_denoms: list[tuple[str, float]], mu: float
    ) -> dict[str, list[tuple]]:
        """LM analogue of _ensure_terms: {term: [(local_ids, contrib)]}
        where contrib = ln(1 + tf/denom) + ln(mu/(dl+mu)) and denom =
        mu*cf_global/T is computed ON THE DRIVER (global cf needs the
        cross-shard sum, exactly like idf's df). Same expression order as
        SearchEngine._term_arrays_lm, so distributed == driver bit-for-bit."""
        cache = getattr(self, "_lm_cache", None)
        if cache is None:
            cache = self._lm_cache = {}
        local: dict[str, list[tuple]] = {}
        missing = []
        for t, _ in term_denoms:
            key = (t, mu)
            if key in cache:
                local[t] = cache[key]
            else:
                missing.append(t)
        if not missing:
            return local
        futures = [s.fetch_lm_range.remote(missing, self.lo, self.hi) for s in self.shards]
        fetched: dict[str, list[dict]] = {t: [] for t in missing}
        for res in ray.get(futures):
            for t, infos in res.items():
                fetched[t].extend(infos)
        denom_of = dict(term_denoms)
        for t in missing:
            slices = []
            for info in sorted(fetched[t], key=lambda i: i["part"]):
                ids = info["ids"]
                if len(ids):
                    contrib = np.log(1.0 + info["tf"] / denom_of[t]) + np.log(
                        mu / (info["dl"] + mu)
                    )
                    slices.append((ids - self.lo, contrib))
                    self._cache_elems += 2 * len(ids)
            local[t] = slices
            cache[(t, mu)] = slices
        if self._cache_elems > self._cache_budget:
            self._cache.clear()
            cache.clear()
            self._cache_elems = 0
        return local

    def lm_score_many(
        self, queries: list[tuple[int, list[tuple[str, float]]]], k: int, mu: float
    ) -> list:
        """Batch Dirichlet-LM scoring for this range (turn granularity;
        always exhaustive — WAND bounds are BM25-specific). One result
        (doc_ids, scores) per query, tombstones masked."""
        union: dict[str, float] = {}
        for _, tds in queries:
            union.update(tds)
        self._ensure_lm_terms(sorted(union.items()), mu)
        from ..pipelines.search import topk_from_scores

        out = []
        for _, tds in queries:
            terms = sorted(t for t, _ in tds)
            arrays = self._ensure_lm_terms(tds, mu)
            acc = self._accumulate(terms, arrays)
            if acc is None:
                out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
                continue
            uniq, vals = acc
            if len(self._tomb_local):
                from ..pipelines.attrs import membership_mask

                alive = ~membership_mask(self._tomb_local, uniq)
                uniq, vals = uniq[alive], vals[alive]
            if not len(uniq):
                out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
                continue
            out.append(topk_from_scores(uniq + self.lo, vals, k))
        return out

    def _dv_slice(self, col: str):
        """Range-local (sorted global doc_ids, vals) slice of the docvalues
        sidecar, loaded lazily and cached per column."""
        cache = getattr(self, "_dv_cache", None)
        if cache is None:
            cache = self._dv_cache = {}
        if col not in cache:
            if self._dv_dir is None:
                raise ValueError("scorer has no docvalues sidecar")
            from ..pipelines.docvalues import DocValueStore

            cache[col] = DocValueStore(self._dv_dir).slice(col, self.lo, self.hi)
        return cache[col]

    def _matching_local(self, tds, arrays, where=()) -> np.ndarray:
        """Range-local candidate set for match-only retrieval: union of the
        query terms' local posting ids, tombstones dropped, where-clauses
        ANDed — shared by sort_many and hist_many."""
        from ..pipelines.attrs import membership_mask

        parts = [ids for t, _ in tds for ids, _ in arrays.get(t, ())]
        if not parts:
            return np.empty(0, dtype=np.int64)
        uniq = np.unique(np.concatenate(parts))
        if len(self._tomb_local):
            uniq = uniq[~membership_mask(self._tomb_local, uniq)]
        if where and len(uniq):
            uniq = uniq[self._where_keep(uniq, where)]
        return uniq

    def sort_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]]]],
        col: str,
        k: int,
        descending: bool,
        where=(),
    ) -> list:
        """Sort-by-field: per query, this range's top-k MATCHING docs
        ordered by the doc-values column (value desc|asc, doc_id asc).
        Term postings come through the same idf-scored cache the scoring
        paths use (contributions ignored — membership only), so a sort
        query warms the same state a scored query reuses."""
        union: dict[str, float] = {}
        for _, tds in queries:
            union.update(tds)
        arrays = self._ensure_terms(sorted(union.items()))
        dv_ids, dv_vals = self._dv_slice(col)
        out = []
        for _, tds in queries:
            uniq = self._matching_local(tds, arrays, where)
            if not len(uniq):
                out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
                continue
            docs = uniq + self.lo
            pos = np.searchsorted(dv_ids, docs)
            vals = dv_vals[pos]
            order = (
                np.lexsort((docs, -vals)) if descending else np.lexsort((docs, vals))
            )[:k]
            out.append((docs[order], vals[order]))
        return out

    def hist_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]]]],
        col: str,
        width: int,
        where=(),
    ) -> list:
        """Histogram aggregation: per query, this range's MATCHING docs
        bucketed by floor-divided doc value (bucket = value // width).
        Returns (bucket_ids, counts) per query; disjoint ranges make the
        driver's element-wise sum the global histogram."""
        union: dict[str, float] = {}
        for _, tds in queries:
            union.update(tds)
        arrays = self._ensure_terms(sorted(union.items()))
        dv_ids, dv_vals = self._dv_slice(col)
        out = []
        for _, tds in queries:
            uniq = self._matching_local(tds, arrays, where)
            if not len(uniq):
                out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
                continue
            pos = np.searchsorted(dv_ids, uniq + self.lo)
            buckets = dv_vals[pos] // width
            b, c = np.unique(buckets, return_counts=True)
            out.append((b, c.astype(np.int64)))
        return out

    def stats_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]]]],
        col: str,
        where=(),
    ) -> list:
        """Field-stats aggregation: per query, (n, min, max) of the
        doc-values column over this range's MATCHING docs — all int64, so
        the driver's combine (sum of counts, min of mins, max of maxes) is
        exact. No sum/avg: an epoch-us sum over a large match set overflows
        int64, and a float mean would break the gate's exact arithmetic.
        Empty ranges return n=0."""
        union: dict[str, float] = {}
        for _, tds in queries:
            union.update(tds)
        arrays = self._ensure_terms(sorted(union.items()))
        dv_ids, dv_vals = self._dv_slice(col)
        out = []
        for _, tds in queries:
            uniq = self._matching_local(tds, arrays, where)
            if not len(uniq):
                out.append((0, 0, 0))
                continue
            vals = dv_vals[np.searchsorted(dv_ids, uniq + self.lo)]
            out.append((int(len(vals)), int(vals.min()), int(vals.max())))
        return out

    def _ensure_wand_terms(self, term_idfs: list[tuple[str, float]]) -> dict[str, list[dict]]:
        """Block-sliced compressed infos for the range ([lo, hi) blocks
        only leave the shards; edge docs are clamped by the traversal)."""
        local: dict[str, list[dict]] = {}
        missing = []
        for t, _ in term_idfs:
            if t in self._wand_cache:
                local[t] = self._wand_cache[t]
            else:
                missing.append(t)
        if not missing:
            return local
        futures = [s.fetch_blocks_range.remote(missing, self.lo, self.hi) for s in self.shards]
        fetched: dict[str, list[dict]] = {t: [] for t in missing}
        for res in ray.get(futures):
            for t, infos in res.items():
                fetched[t].extend(infos)
        for t in missing:
            infos = sorted(fetched[t], key=lambda i: i["part"])
            local[t] = infos
            self._wand_cache[t] = infos
            for info in infos:
                self._wand_bytes += len(info["deltas"]) + len(info["tfs"]) + len(info["dls"])
        if self._wand_bytes > self._wand_budget:
            self._wand_cache.clear()
            self._wand_bytes = 0
        return local

    def _attr_local_ids(self, col: str, values: tuple[str, ...]) -> np.ndarray:
        """Range-local (0-based) sorted doc ids matching one where clause,
        loaded lazily and cached per (col, values)."""
        key = (col, values)
        ids = self._attr_cache.get(key)
        if ids is None:
            if self._attr_store is None:
                from ..pipelines.attrs import AttrStore

                self._attr_store = AttrStore(self._attrs_dir)
            ids = self._attr_store.ids_for(col, values, self.lo, self.hi) - self.lo
            self._attr_cache[key] = ids
        return ids

    def _where_keep(self, uniq: np.ndarray, where_norm) -> np.ndarray:
        """AND of membership masks over range-local candidate ids."""
        from ..pipelines.attrs import membership_mask

        keep = np.ones(len(uniq), dtype=bool)
        for col, values in where_norm:
            keep &= membership_mask(self._attr_local_ids(col, values), uniq)
        return keep

    @staticmethod
    def _member_mask(local_ids: np.ndarray, slices: list[tuple]) -> np.ndarray | None:
        """Boolean membership of ``local_ids`` (sorted) in the union of a
        term's sub-list ids. Sub-lists are disjoint (salted by doc % S) but
        individually sorted, so one sort of the concat restores order."""
        if not slices:
            return None
        parts = [ids for ids, _ in slices]
        ids = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts))
        if not len(ids):
            return None
        pos = np.minimum(np.searchsorted(ids, local_ids), len(ids) - 1)
        return ids[pos] == local_ids

    def boolean_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]], list[str], list[tuple[str, float]]]],
        k: int,
        masks: list[tuple[list, list]] | None = None,
    ) -> list:
        """Batch boolean retrieval over this range: each query is
        (qid, score_idfs, must_terms, mustnot_idfs), with must_terms a
        subset of the score terms. Docs must contain EVERY must term and NO
        must_not term; the score is the BM25 sum over the score terms
        (must + should), accumulated in ascending term order exactly like
        ``score``. Returns the range-local top-k per query (turn
        granularity; ranges disjoint -> driver merge is exact).

        must_not terms ride ``_ensure_terms`` with their TRUE idf so the
        contrib cache stays coherent for later scoring queries — only their
        ids are read here.

        ``masks`` (optional, aligned with ``queries``): per-query
        (include_locals, exclude_locals) — lists of sorted RANGE-LOCAL
        (0-based) doc-id arrays a candidate must / must not belong to.
        This is how phrase constraints from the query-string path ride the
        pool: the driver slices each phrase's global doc set to [lo, hi)
        per scorer (every doc ships to exactly ONE scorer — the same
        shape as the where= sidecar masks, just driver-sliced because the
        phrase sets come from the positional pass, not a sidecar)."""
        from ..pipelines.attrs import membership_mask

        ensure: dict[str, float] = {}
        for _, score_idfs, _, mustnot_idfs in queries:
            ensure.update(score_idfs)
            ensure.update(mustnot_idfs)
        arrays = self._ensure_terms(sorted(ensure.items()))
        out = []
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        for qi, (_, score_idfs, must_terms, mustnot_idfs) in enumerate(queries):
            acc = self._accumulate(sorted(t for t, _ in score_idfs), arrays)
            if acc is None:
                out.append(empty)
                continue
            uniq, vals = acc
            keep = np.ones(len(uniq), dtype=bool)
            if len(self._tomb_local):
                keep &= ~membership_mask(self._tomb_local, uniq)
            dead = False
            for t in must_terms:
                m = self._member_mask(uniq, arrays.get(t, ()))
                if m is None:  # term absent from this RANGE: no candidates here
                    dead = True
                    break
                keep &= m
            if dead:
                out.append(empty)
                continue
            for t, _ in mustnot_idfs:
                m = self._member_mask(uniq, arrays.get(t, ()))
                if m is not None:
                    keep &= ~m
            if masks is not None:
                inc_l, exc_l = masks[qi]
                for ids in inc_l:
                    keep &= membership_mask(np.asarray(ids, dtype=np.int64), uniq)
                for ids in exc_l:
                    keep &= ~membership_mask(np.asarray(ids, dtype=np.int64), uniq)
            uniq, vals = uniq[keep], vals[keep]
            if not len(uniq):
                out.append(empty)
                continue
            from ..pipelines.search import topk_from_scores

            out.append(topk_from_scores(uniq + self.lo, vals, k))
        return out

    def score_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]]]],
        k: int,
        granularity: str = "turn",
        segment_span: int = 4,
        use_wand: bool = False,
        agg: str = "sum",
        where=(),
        cursor=(),
        boost=(),
    ) -> list:
        """Batch form: ONE round-trip scores every query in the set (terms
        are ensured once for the union, then each query accumulates from the
        local slice cache). Returns one ``score`` result per query, in
        order. ``cursor`` (keyset pagination) and ``boost`` apply to EVERY
        query in the batch — callers paginate/boost per call."""
        union: dict[str, float] = {}
        for _, term_idfs in queries:
            union.update(term_idfs)
        if use_wand and granularity == "turn" and not len(self._tomb_local):
            self._ensure_wand_terms(sorted(union.items()))
        else:
            self._ensure_terms(sorted(union.items()))
        return [
            self.score(
                term_idfs, k, granularity, segment_span, use_wand, agg, where, cursor, boost
            )
            for _, term_idfs in queries
        ]

    def facet_many(
        self,
        queries: list[tuple[int, list[tuple[str, float]]]],
        col: str,
        values: list[str],
    ) -> list[np.ndarray]:
        """Per-query counts of this range's MATCHING docs (>= 1 query term)
        per attribute value, aligned to ``values``. Ranges are disjoint, so
        the driver's element-wise sum over scorers is the global histogram."""
        from ..pipelines.attrs import membership_mask

        union: dict[str, float] = {}
        for _, term_idfs in queries:
            union.update(term_idfs)
        arrays = self._ensure_terms(sorted(union.items()))
        value_ids = [self._attr_local_ids(col, (v,)) for v in values]
        out = []
        for _, term_idfs in queries:
            parts = [
                ids
                for t, _ in term_idfs
                for ids, _ in arrays.get(t, ())
            ]
            if not parts:
                out.append(np.zeros(len(values), dtype=np.int64))
                continue
            docs = np.unique(np.concatenate(parts))
            if len(self._tomb_local):
                docs = docs[~membership_mask(self._tomb_local, docs)]
            out.append(
                np.asarray(
                    [int(membership_mask(vi, docs).sum()) for vi in value_ids],
                    dtype=np.int64,
                )
            )
        return out

    def score(
        self,
        term_idfs: list[tuple[str, float]],
        k: int,
        granularity: str = "turn",
        segment_span: int = 4,
        use_wand: bool = False,
        agg: str = "sum",
        where=(),
        cursor=(),
        boost=(),
    ):
        """-> (doc_ids, scores) | (conv_names, scores) | (conv_names,
        seg_starts, scores): this range's top-k under the global tie-break.

        ``cursor`` (turn granularity only): keyset-pagination cursor
        (score, doc_id) — keep only docs strictly AFTER it in the
        (score desc, doc_id asc) total order, applied range-locally before
        top-k selection; disjoint ranges keep the merged page exact.

        ``boost`` (turn granularity only): normalized attribute boosts —
        per-doc value-weight multiply via the range-local attr slices,
        applied BEFORE the cursor (cursors live in boosted score space).

        ``use_wand`` (turn granularity only — rollups need every doc's
        group sum): independent block-max WAND traversal clamped to this
        range; bounds stay valid because idf * max_factor is
        range-independent, and disjoint ranges make the merged top-k
        exact. ``where`` (normalized clauses from pipelines/attrs.py) masks
        candidates range-locally BEFORE top-k / rollup — the engine fences
        the where+WAND combination, so the filter only meets the
        exhaustive path here."""
        from ..pipelines.search import topk_from_scores

        if use_wand and granularity == "turn" and not len(self._tomb_local):
            from ..pipelines.wand import block_max_wand

            infos = self._ensure_wand_terms(term_idfs)
            idf_of = dict(term_idfs)
            specs = []
            for t in sorted(idf_of):
                for info in infos.get(t, ()):  # part-sorted at fetch
                    specs.append((t, idf_of[t], info))
            if not specs:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            return block_max_wand(
                specs, k, self.k1, self.b, self.avgdl, lo=self.lo, hi=self.hi
            )

        terms = sorted(t for t, _ in term_idfs)
        arrays = self._ensure_terms(term_idfs)
        acc = self._accumulate(terms, arrays)
        if acc is None:
            if granularity == "turn":
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if granularity == "conv":
                return np.empty(0, object), np.empty(0, np.float64)
            return np.empty(0, object), np.empty(0, np.int64), np.empty(0, np.float64)
        uniq, vals = acc
        if len(self._tomb_local):
            from ..pipelines.attrs import membership_mask

            alive = ~membership_mask(self._tomb_local, uniq)
            uniq, vals = uniq[alive], vals[alive]
            if not len(uniq):
                if granularity == "turn":
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                if granularity == "conv":
                    return np.empty(0, object), np.empty(0, np.float64)
                return np.empty(0, object), np.empty(0, np.int64), np.empty(0, np.float64)
        if where:
            keep = self._where_keep(uniq, where)
            uniq, vals = uniq[keep], vals[keep]
            if not len(uniq):
                if granularity == "turn":
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                if granularity == "conv":
                    return np.empty(0, object), np.empty(0, np.float64)
                return np.empty(0, object), np.empty(0, np.int64), np.empty(0, np.float64)
        if granularity == "turn":
            docs = uniq + self.lo
            if boost:
                from ..pipelines.attrs import membership_mask

                for col, weights in boost:
                    for value, w in weights:
                        mask = membership_mask(self._attr_local_ids(col, (value,)), uniq)
                        vals = np.where(mask, vals * w, vals)
            if cursor:
                cs, cd = float(cursor[0]), int(cursor[1])
                keep = (vals < cs) | ((vals == cs) & (docs > cd))
                docs, vals = docs[keep], vals[keep]
                if not len(docs):
                    return np.empty(0, np.int64), np.empty(0, np.float64)
            return topk_from_scores(docs, vals, k)
        # rollup aggregation: "sum" (doc-order accumulation, == oracle sum)
        # or "max" (order-independent best-turn score per group)
        red = np.maximum.reduceat if agg == "max" else np.add.reduceat
        conv_idx = np.searchsorted(self.bases, uniq + self.lo, side="right") - 1
        if granularity == "conv":
            cuniq, starts = np.unique(conv_idx, return_index=True)
            cscores = red(vals, starts)
            names = self._convs.names_at(cuniq)
            order = np.lexsort((names, -cscores))[:k]
            return names[order], cscores[order]
        turn = (uniq + self.lo) - self.bases[conv_idx]
        seg_start = (turn // segment_span) * segment_span
        key = conv_idx.astype(np.int64) * (1 << 32) + seg_start
        kuniq, starts = np.unique(key, return_index=True)
        sscores = red(vals, starts)
        u_conv = (kuniq >> 32).astype(np.int64)
        u_seg = (kuniq & ((1 << 32) - 1)).astype(np.int64)
        names = self._convs.names_at(u_conv)
        order = np.lexsort((u_seg, names, -sscores))[:k]
        return names[order], u_seg[order], sscores[order]

    def tree_many(self, queries: list[tuple[int, list[tuple[str, float]]]],
                  k: int, spans, agg: str = "sum", where=()) -> list:
        """Batch multi-level tree rollup for this range (state/rollup.py):
        one result dict (or None) per query — complete conv rows, because
        ranges are conv-aligned; the driver merge is a plain top-k. Always
        exhaustive (every level's group sum needs every matching turn).
        ``where``: normalized attribute clauses masked range-locally BEFORE
        the rollup — a group's score aggregates only filter-surviving
        turns, same semantics as the SQL twin."""
        from .rollup import tree_rollup

        union: dict[str, float] = {}
        for _, tds in queries:
            union.update(tds)
        self._ensure_terms(sorted(union.items()))
        out = []
        for _, tds in queries:
            terms = sorted(t for t, _ in tds)
            arrays = self._ensure_terms(tds)
            acc = self._accumulate(terms, arrays)
            if acc is None:
                out.append(None)
                continue
            uniq, vals = acc
            if len(self._tomb_local):
                from ..pipelines.attrs import membership_mask

                alive = ~membership_mask(self._tomb_local, uniq)
                uniq, vals = uniq[alive], vals[alive]
            if where and len(uniq):
                keep = self._where_keep(uniq, where)
                uniq, vals = uniq[keep], vals[keep]
            if not len(uniq):
                out.append(None)
                continue
            out.append(
                tree_rollup(
                    uniq + self.lo, vals, self.bases, self._convs.names_at, spans, k, agg
                )
            )
        return out


def scorer_ranges(conv_bases: np.ndarray, n_docs: int, num_scorers: int):
    """The conv-aligned (lo, hi, row_lo, row_hi) cuts a scorer pool of this
    size uses — ONE source of truth shared by make_scorer_pool and the
    driver (which needs the doc bounds to slice per-range phrase masks)."""
    n_convs = len(conv_bases)
    num_scorers = max(1, min(num_scorers, n_convs))
    cut_idx = [(j * n_convs) // num_scorers for j in range(num_scorers + 1)]
    out = []
    for j in range(num_scorers):
        ci, cj = cut_idx[j], cut_idx[j + 1]
        if ci == cj:
            continue
        lo = int(conv_bases[ci])
        hi = int(conv_bases[cj]) if cj < n_convs else int(conv_bases[0]) + int(n_docs)
        out.append((lo, hi, ci, cj))
    return out


def make_scorer_pool(shards, index_dir: str, conv_bases: np.ndarray, n_docs: int,
                     num_scorers: int,
                     dense_max_range: int | None = None,
                     k1: float = 1.5, b: float = 0.75, avgdl: float = 1.0,
                     attrs_dir: str | None = None, tombstones=None,
                     docvalues_dir: str | None = None):
    """Create RangeScorer actors over conv-aligned doc ranges of ~equal size.

    Ranges split the conversation table (never a conversation), so every
    rollup granularity stays range-local. Each actor is handed only its
    (row_lo, row_hi) cut of conv_offsets.arrow and mmaps the slice itself —
    the driver ships two ints per actor, not object arrays. k1/b/avgdl feed
    the per-range WAND traversal (its lazy block decode recomputes factors
    locally). Returns the actor list."""
    # conv_bases hold ABSOLUTE doc ids (a wave index starts at doc_base,
    # not 0): the last range ends at first_base + n_docs, not n_docs —
    # using the bare count either made the last range negative (crash at
    # actor init) or silently excluded every doc with id >= n_docs.
    # (range arithmetic lives in scorer_ranges, shared with the driver)
    return [
        RangeScorer.remote(
            shards, lo, hi, index_dir, ci, cj,
            dense_max_range, k1, b, avgdl, attrs_dir, tombstones,
            docvalues_dir,
        )
        for lo, hi, ci, cj in scorer_ranges(conv_bases, n_docs, num_scorers)
    ]
