"""Stateful posting shards: the query-side actor pool.

SURVEY.md §2.4 T5: long-lived actors each owning a disjoint set of
term-hash partitions, loading their compressed posting shards from Parquet
ONCE in __init__ and serving term lookups from memory thereafter — the
canonical "state loaded once per worker" pattern the reference lacks (it
re-creates its OpenAI client per call, /root/reference/pageindex/utils.py:35).

Shard ownership: partition pid is owned by actor ``pid % num_shards``;
``term -> crc32(term) % P -> actor`` is a pure function, so routing needs no
directory service.

Two fetch surfaces:
  - ``fetch``        -> COMPRESSED consolidated blocks (+ df/cf). Used by the
                        WAND scorer, whose lazy block decode must stay at the
                        traversal site.
  - ``fetch_scored`` -> decoded (doc_ids, idf-FREE factor float64) arrays.
                        Varint decode + the BM25 factor expression run INSIDE
                        the shard actor, so the heavy per-query CPU
                        parallelizes across the shard pool and scales with
                        cluster size; the driver only multiplies by idf
                        (query-global, needs the SUMMED df of salted terms)
                        and accumulates. The factor expression is the
                        identical float64 form the driver previously
                        evaluated, so scores stay bit-identical. A bounded
                        per-shard decoded cache exploits Zipfian query
                        streams (same policy as the driver-side cache).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import ray

from ..stages.codec import consolidate_partition_table, decode_consolidated


@ray.remote
class PostingShard:
    """Owns the posting rows of a set of term-hash partitions.

    Block lists are converted to the consolidated numpy/bytes form at load
    time (once), so ``fetch`` ships a handful of arrays + byte strings per
    term instead of thousands of per-block dicts — near-zero-copy through
    the object store."""

    def __init__(self, index_dir: str, part_ids: list[int]):
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        self.k1 = float(meta["config"]["k1"])
        self.b = float(meta["config"]["b"])
        self.avgdl = float(meta["avgdl"])
        # term -> LIST of consolidated sub-lists: a salted hot term can have
        # sub-lists in more than one partition owned by this shard.
        self.terms: dict[str, list[dict]] = {}
        for pid in sorted(part_ids):
            path = os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet")
            if not os.path.exists(path):
                continue  # empty partition (no terms hashed to it; SearchEngine
                # verified committed partitions against meta['parts_present'])
            table = pq.read_table(path)
            # vectorized whole-partition consolidation: per-term infos are
            # zero-copy views/slices of the partition's arrow buffers (the
            # previous per-row to_pylist built a Python dict per block and
            # dominated engine warm-up on multi-million-posting partitions)
            for term, info in consolidate_partition_table(table).items():
                info["part"] = pid  # df/cf are partition-local (partial for salted terms)
                self.terms.setdefault(term, []).append(info)
        # decoded (ids, factor) cache, bounded by element count
        self._scored: dict[str, list[dict]] = {}
        # decoded raw-stat cache for language-model scoring (ids, tf, dl)
        self._lm: dict[str, list[dict]] = {}
        self._cache_elems = 0
        self._cache_budget = 256_000_000
        # lazy vocabulary-scan structures (prefix / fuzzy expansion)
        self._vocab_sorted: list[str] | None = None
        self._vocab_arr = None  # Arrow copy of the vocab for regex kernels
        self._edit_buckets: dict[int, tuple] | None = None
        self._edit_odd: list[str] = []

    def num_terms(self) -> int:
        return len(self.terms)

    # ------------------------------------------------------- term expansion

    def _local_df(self, t: str) -> int:
        return int(sum(i["df"] for i in self.terms[t]))

    def _vocab(self) -> list[str]:
        if self._vocab_sorted is None:
            self._vocab_sorted = sorted(self.terms)
        return self._vocab_sorted

    def expand_prefix(self, prefixes: list[str]) -> list[dict[str, int]]:
        """Per prefix: this shard's dictionary terms starting with it ->
        shard-local df (caller sums across shards for the global df). A
        binary search over the sorted vocabulary + a contiguous scan of the
        match range — O(log V + matches) per prefix, built once per actor."""
        import bisect

        vocab = self._vocab()
        out = []
        for p in prefixes:
            i = bisect.bisect_left(vocab, p)
            hits: dict[str, int] = {}
            while i < len(vocab) and vocab[i].startswith(p):
                hits[vocab[i]] = self._local_df(vocab[i])
                i += 1
            out.append(hits)
        return out

    def expand_regex(self, patterns: list[str]) -> list[dict[str, int]]:
        """Per RE2 pattern: this shard's dictionary terms FULLY matching it
        -> shard-local df. Anchored wrap (^(?:p)$) gives Lucene
        RegexpQuery's whole-term semantics; matching is one vectorized
        Arrow kernel call over the cached vocabulary array per pattern (RE2
        under the hood — the same engine DuckDB's regexp_full_match uses,
        so the SQL twin shares pattern syntax exactly)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        vocab = self._vocab()
        if self._vocab_arr is None:
            self._vocab_arr = pa.array(vocab, type=pa.string())
        out = []
        for p in patterns:
            mask = pc.match_substring_regex(self._vocab_arr, f"^(?:{p})$")
            idxs = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            out.append({vocab[i]: self._local_df(vocab[i]) for i in idxs})
        return out

    def _ensure_edit_buckets(self):
        """Length-bucketed byte matrices over the vocabulary (single-byte
        terms only; multi-byte UTF-8 terms fall back to the scalar check).
        Built once per actor on first fuzzy query. Scale note: this is a
        full-vocabulary structure — at 10^8+ terms/shard the deletion-
        neighborhood (SymSpell) index would replace the linear bucket scan;
        the bucket scan is the vectorized baseline."""
        if self._edit_buckets is None:
            by_len: dict[int, list[str]] = {}
            odd: list[str] = []
            for t in self.terms:
                if len(t.encode("utf-8")) != len(t):
                    odd.append(t)
                elif len(t):
                    by_len.setdefault(len(t), []).append(t)
            self._edit_buckets = {
                L: (
                    # 1-byte-per-char terms are pure ASCII by construction
                    np.frombuffer("".join(ts).encode(), dtype=np.uint8).reshape(len(ts), L),
                    ts,
                )
                for L, ts in by_len.items()
            }
            self._edit_odd = odd
        return self._edit_buckets, self._edit_odd

    @staticmethod
    def _lev1(a: str, b: str) -> bool:
        """levenshtein(a, b) <= 1 (substitution/insert/delete), scalar."""
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # lb == la + 1: b has one extra char
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    def expand_edit1(self, queries: list[str]) -> list[dict[str, int]]:
        """Per query term: dictionary terms within Levenshtein distance 1
        (including the term itself) -> shard-local df. Vectorized over
        length buckets: equal length = <=1 byte mismatch; length +-1 = the
        lcp+lcs >= shorter-length identity (one pass each way, no DP)."""
        buckets, odd = self._ensure_edit_buckets()
        out = []
        for q in queries:
            hits: dict[str, int] = {}
            M = len(q)
            if M and len(q.encode("utf-8")) == M:
                qb = np.frombuffer(q.encode(), dtype=np.uint8)
                for L in (M - 1, M, M + 1):
                    entry = buckets.get(L)
                    if entry is None:
                        continue
                    mat, ts = entry
                    if L == M:
                        sel = (mat != qb).sum(axis=1) <= 1
                    elif L == M + 1:  # delete one char of the candidate
                        lcp = np.cumprod(mat[:, :M] == qb, axis=1).sum(axis=1)
                        lcs = np.cumprod((mat[:, 1:] == qb)[:, ::-1], axis=1).sum(axis=1)
                        sel = (lcp + lcs) >= M
                    else:  # L == M - 1: delete one char of the query
                        lcp = np.cumprod(mat == qb[:L], axis=1).sum(axis=1)
                        lcs = np.cumprod((mat == qb[1:])[:, ::-1], axis=1).sum(axis=1)
                        sel = (lcp + lcs) >= L
                    for i in np.flatnonzero(sel):
                        hits[ts[i]] = self._local_df(ts[i])
                cand_odd = odd
            else:  # non-single-byte query: scalar scan of the whole vocab
                cand_odd = list(self.terms)
            for t in cand_odd:
                if self._lev1(q, t):
                    hits[t] = self._local_df(t)
            out.append(hits)
        return out

    def fetch_dfs(self, terms: list[str]) -> dict[str, int]:
        """Shard-local df per term (sum over this shard's sub-lists; the
        caller sums across shards for a salted term's global df). A few ints
        per term — the light first round-trip of distributed scoring."""
        out = {}
        for t in terms:
            infos = self.terms.get(t)
            if infos:
                out[t] = int(sum(i["df"] for i in infos))
        return out

    def fetch(self, terms: list[str]) -> dict[str, list[dict]]:
        """Consolidated posting sub-lists for the requested terms (missing
        terms are simply absent from the result)."""
        return {t: self.terms[t] for t in terms if t in self.terms}

    def fetch_scored(self, terms: list[str]) -> dict[str, list[dict]]:
        """term -> list of {part, df, ids, factor} sub-lists, decoded and
        factor-scored in the shard (idf applied by the caller)."""
        out: dict[str, list[dict]] = {}
        for t in terms:
            if (cached := self._scored_term(t)) is not None:
                out[t] = cached
        return out

    def fetch_scored_range(self, terms: list[str], lo: int, hi: int) -> dict[str, list[dict]]:
        """Range-sliced form for the doc-range scorer pool: only postings
        with lo <= doc_id < hi leave the shard, so R scorers pull 1x the
        decoded postings in aggregate instead of R copies each (the decode
        cache still holds whole terms — slicing is two searchsorted + a
        zero-copy view per sub-list)."""
        out: dict[str, list[dict]] = {}
        for t in terms:
            cached = self._scored_term(t)
            if cached is None:
                continue
            slices = []
            for info in cached:
                ids = info["ids"]
                a = int(np.searchsorted(ids, lo, side="left"))
                b = int(np.searchsorted(ids, hi, side="left"))
                if b > a:
                    slices.append(
                        {
                            "part": info["part"],
                            "df": info["df"],
                            "ids": ids[a:b],
                            "factor": info["factor"][a:b],
                        }
                    )
            if slices:
                out[t] = slices
        return out

    def fetch_cfs(self, terms: list[str]) -> dict[str, int]:
        """Shard-local collection frequency per term (summed over this
        shard's sub-lists; caller sums across shards — the LM analogue of
        fetch_dfs)."""
        out = {}
        for t in terms:
            infos = self.terms.get(t)
            if infos:
                out[t] = int(sum(i["cf"] for i in infos))
        return out

    def fetch_lm_range(self, terms: list[str], lo: int, hi: int) -> dict[str, list[dict]]:
        """Range-sliced raw-stat form for distributed LM scoring: only
        postings with lo <= doc_id < hi leave the shard, as float64
        (ids, tf, dl) views of the decoded LM cache."""
        out: dict[str, list[dict]] = {}
        lm = self.fetch_lm(terms)
        for t, cached in lm.items():
            slices = []
            for info in cached:
                ids = info["ids"]
                a = int(np.searchsorted(ids, lo, side="left"))
                b = int(np.searchsorted(ids, hi, side="left"))
                if b > a:
                    slices.append(
                        {
                            "part": info["part"],
                            "ids": ids[a:b],
                            "tf": info["tf"][a:b],
                            "dl": info["dl"][a:b],
                        }
                    )
            if slices:
                out[t] = slices
        return out

    def fetch_blocks_range(self, terms: list[str], lo: int, hi: int) -> dict[str, list[dict]]:
        """COMPRESSED block-granular range slice for the per-range WAND
        path: only blocks that can contain docs in [lo, hi) leave the shard
        (zero-copy array views + payload byte slices of the consolidated
        form — no decode here; WAND's lazy per-block decode stays at the
        traversal site in the RangeScorer). Edge blocks may carry a few
        out-of-range docs; the traversal clamps them."""
        out: dict[str, list[dict]] = {}
        for t in terms:
            infos = self.terms.get(t)
            if infos is None:
                continue
            slices = []
            for info in infos:
                firsts = info["firsts"]
                bi = max(int(np.searchsorted(firsts, lo, side="right")) - 1, 0)
                bj = int(np.searchsorted(firsts, hi, side="left"))
                if bj <= bi:
                    continue
                d_off = info["deltas_off"]
                t_off = info["tfs_off"]
                l_off = info["dls_off"]
                slices.append(
                    {
                        "part": info["part"],
                        "df": info["df"],
                        "firsts": firsts[bi:bj],
                        "counts": info["counts"][bi:bj],
                        "max_factors": info["max_factors"][bi:bj],
                        "deltas": info["deltas"][d_off[bi] : d_off[bj]],
                        "tfs": info["tfs"][t_off[bi] : t_off[bj]],
                        "dls": info["dls"][l_off[bi] : l_off[bj]],
                        "deltas_off": d_off[bi : bj + 1] - d_off[bi],
                        "tfs_off": t_off[bi : bj + 1] - t_off[bi],
                        "dls_off": l_off[bi : bj + 1] - l_off[bi],
                    }
                )
            if slices:
                out[t] = slices
        return out

    def fetch_lm(self, terms: list[str]) -> dict[str, list[dict]]:
        """term -> list of {part, df, cf, ids, tf, dl} sub-lists with
        float64 tf/dl, decoded in the shard. Raw statistics (not a baked
        factor) because language-model similarities combine tf with the
        term's GLOBAL collection frequency — for a salted hot term that is
        the sum of per-sub-list cf across shards, so only the caller can
        finalize the score. One decode per term, cached alongside BM25's
        factor cache under the same element budget."""
        out: dict[str, list[dict]] = {}
        for t in terms:
            infos = self.terms.get(t)
            if infos is None:
                continue
            cached = self._lm.get(t)
            if cached is None:
                cached = []
                for info in infos:
                    ids, tfs, dls = decode_consolidated(info)
                    cached.append(
                        {
                            "part": info["part"],
                            "df": info["df"],
                            "cf": info["cf"],
                            "ids": ids,
                            "tf": tfs.astype(np.float64),
                            "dl": dls.astype(np.float64),
                        }
                    )
                    self._cache_elems += 3 * len(ids)
                if self._cache_elems > self._cache_budget:
                    self._scored.clear()
                    self._lm.clear()
                    self._cache_elems = 0
                self._lm[t] = cached
            out[t] = cached
        return out

    def _scored_term(self, t: str) -> list[dict] | None:
        infos = self.terms.get(t)
        if infos is None:
            return None
        cached = self._scored.get(t)
        if cached is None:
            cached = []
            for info in infos:
                ids, tfs, dls = decode_consolidated(info)
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                # identical float64 expression order as the oracle/driver
                factor = tf * (self.k1 + 1.0) / (
                    tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                )
                cached.append(
                    {"part": info["part"], "df": info["df"], "ids": ids, "factor": factor}
                )
                self._cache_elems += 2 * len(ids)
            if self._cache_elems > self._cache_budget:
                # the element budget covers BOTH decode caches: clearing
                # only _scored here left _lm resident and unaccounted, so
                # alternating BM25/LM streams could hold ~2x the budget
                self._scored.clear()
                self._lm.clear()
                self._cache_elems = 0
            self._scored[t] = cached
        return cached
