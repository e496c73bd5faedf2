"""Block-max WAND top-k (Ding & Suel style) over compressed posting blocks.

Document-at-a-time traversal with two pruning levels:
  - term-level upper bounds (suffix max of per-block max_score over the
    remaining blocks of each term's list);
  - block-level max_score for the aligned pivot set, enabling shallow
    advances that skip whole blocks without decoding them.

Exactness / rank-identity invariants (tested against exhaustive scoring):
  - a doc is only skipped when a true upper bound of its score is <= the
    current threshold; ties at the threshold are safe because DAAT visits
    docs in ascending doc_id order and the tie-break is (score desc,
    doc_id asc) — an equal-score later doc loses anyway;
  - shallow advances are capped at the first non-aligned iterator's current
    doc, so no doc containing a term outside the aligned set is ever skipped;
  - full scores accumulate per-term contributions in ascending term order
    with the identical float64 expression as the exhaustive scorer.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..stages.codec import decode_consolidated_block


class TermIterator:
    """Cursor over one term's consolidated block list; lazy per-block decode."""

    __slots__ = (
        "term", "idf", "info", "nblocks", "firsts", "suffix_ub", "bi", "pos",
        "ids", "contribs", "exhausted", "k1", "b", "avgdl", "hi",
    )

    def __init__(
        self,
        term: str,
        idf: float,
        info: dict,
        k1: float,
        b: float,
        avgdl: float,
        lo: int | None = None,
        hi: int | None = None,
    ):
        self.term = term
        self.idf = float(idf)
        self.info = info
        self.firsts = info["firsts"]
        self.nblocks = len(self.firsts)
        # suffix max of idf * max_factor: upper bound over the *remaining*
        # list from block i on (idf > 0 so the multiply preserves the max)
        self.suffix_ub = self.idf * np.maximum.accumulate(info["max_factors"][::-1])[::-1]
        self.k1, self.b, self.avgdl = k1, b, avgdl
        # [lo, hi) clamp for the per-range distributed WAND path: docs below
        # lo are skipped at init, reaching a doc >= hi exhausts the iterator.
        # Bounds stay true upper bounds — clamping only narrows the doc set.
        self.hi = (1 << 62) if hi is None else int(hi)
        self.bi = 0
        self.exhausted = False
        self._decode_block(0)
        self.pos = 0
        if lo is not None and not self.exhausted and self.cur_doc < lo:
            self.advance_to(int(lo))
        self._check_hi()

    def _check_hi(self) -> None:
        if not self.exhausted and int(self.ids[self.pos]) >= self.hi:
            self.exhausted = True

    def _decode_block(self, bi: int) -> None:
        ids, tfs, dls = decode_consolidated_block(self.info, bi)
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        # identical float64 expression order as the exhaustive scorer:
        # factor first, then * idf
        factor = tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )
        self.contribs = self.idf * factor
        self.ids = ids
        self.bi = bi

    @property
    def cur_doc(self) -> int:
        return int(self.ids[self.pos])

    @property
    def cur_contrib(self) -> float:
        return float(self.contribs[self.pos])

    @property
    def term_ub(self) -> float:
        return float(self.suffix_ub[self.bi])

    @property
    def cur_block_max(self) -> float:
        return self.idf * float(self.info["max_factors"][self.bi])

    @property
    def cur_block_boundary(self) -> int:
        """Inclusive upper bound on the docs of the current block."""
        if self.bi + 1 < len(self.firsts):
            return int(self.firsts[self.bi + 1]) - 1
        return int(self.ids[-1]) if self.bi == self.nblocks - 1 else 1 << 62

    def advance(self) -> None:
        """Move to the next posting."""
        self.pos += 1
        if self.pos >= len(self.ids):
            if self.bi + 1 < self.nblocks:
                self._decode_block(self.bi + 1)
                self.pos = 0
            else:
                self.exhausted = True
        self._check_hi()

    def advance_to(self, target: int) -> None:
        """Move to the first posting with doc_id >= target (block skip)."""
        if self.exhausted or self.cur_doc >= target:
            return
        # rightmost block whose first_doc_id <= target
        bj = int(np.searchsorted(self.firsts, target, side="right")) - 1
        bj = max(bj, self.bi)
        if bj != self.bi:
            self._decode_block(bj)
            self.pos = 0
        pos = int(np.searchsorted(self.ids[self.pos :], target)) + self.pos
        if pos < len(self.ids):
            self.pos = pos
        elif self.bi + 1 < self.nblocks:
            self._decode_block(self.bi + 1)
            self.pos = 0
        else:
            self.exhausted = True
        self._check_hi()


def block_max_wand(
    specs: list[tuple[str, float, dict]],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    lo: int | None = None,
    hi: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids, scores) top-k, ordered (score desc, doc_id asc).

    ``specs``: (term, idf, consolidated-info) in ascending term order; a
    salted hot term contributes several specs (disjoint doc_id sub-lists),
    each its own iterator — a doc is scored by at most one of them, so
    per-doc accumulation order across TERMS is still ascending-term.

    ``lo``/``hi`` restrict the traversal to docs in [lo, hi) — the
    per-range distributed WAND path (state/scorers.py): each RangeScorer
    runs an independent clamped traversal over block-sliced lists, and the
    per-range top-k partials merge exactly because ranges are disjoint."""
    iters = [TermIterator(t, idf, info, k1, b, avgdl, lo, hi) for t, idf, info in specs]
    iters = [it for it in iters if not it.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap; worst on top

    while True:
        live = [it for it in iters if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda it: it.cur_doc)
        theta = heap[0][0] if len(heap) >= k else float("-inf")

        # pivot: first prefix whose term-ub sum beats theta
        acc = 0.0
        pivot_idx = -1
        for i, it in enumerate(live):
            acc += it.term_ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot_doc = live[pivot_idx].cur_doc

        if live[0].cur_doc == pivot_doc:
            # aligned set: every iterator currently at pivot_doc
            aligned = [it for it in live if it.cur_doc == pivot_doc]
            non_aligned_next = min(
                (it.cur_doc for it in live if it.cur_doc > pivot_doc), default=1 << 62
            )
            block_ub = sum(it.cur_block_max for it in aligned)
            if block_ub > theta:
                # exact score: aligned list is already in ascending term order
                score = 0.0
                for it in aligned:
                    score += it.cur_contrib
                if score > theta:
                    entry = (score, -pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    else:
                        heapq.heappushpop(heap, entry)
                for it in aligned:
                    it.advance()
            else:
                # shallow advance: skip to past the tightest aligned block,
                # never past a doc another iterator is sitting on
                d_next = min(it.cur_block_boundary for it in aligned) + 1
                d_next = min(d_next, non_aligned_next)
                d_next = max(d_next, pivot_doc + 1)
                for it in aligned:
                    it.advance_to(d_next)
        else:
            # move the earliest iterator up to the pivot
            live[0].advance_to(pivot_doc)

    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    entries = sorted(heap, key=lambda e: (-e[0], -e[1]))
    docs = np.asarray([-e[1] for e in entries], dtype=np.int64)
    scores = np.asarray([e[0] for e in entries], dtype=np.float64)
    return docs, scores
