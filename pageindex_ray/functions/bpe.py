"""True merge-table BPE token accounting.

Reference analogue: ``count_tokens`` resolves a tiktoken BPE encoding per
call (/root/reference/pageindex/utils.py:23-31). Round 2 shipped only a
regex pre-tokenizer PIECE count; this module applies a real merge-table BPE
(Sennrich et al. 2016, the public bottom-up pair-merge algorithm) so token
budgets are counted against an actual vocabulary:

- ``bpe_merges.txt`` is a COMMITTED artifact: trained once by ``train_bpe``
  over the deterministic sf0.001 documents text (no seed, pure counting
  with a lexicographic tie-break — regenerate with
  ``python -m pageindex_ray.functions.bpe``), one merge per line.
- Encoding is per-PIECE (the same RE2 pre-tokenizer pattern the piece-count
  pipeline and the DuckDB twin share), cached per actor: pieces are Zipfian,
  so each unique piece pays the merge loop once per worker process and every
  later occurrence is a dict hit.
- The driver oracle is sidecar-based like the sketch pipelines: the
  (piece -> n_tokens) map is materialized once with THIS encoder and the SQL
  twin reproduces the whole distributed pipeline (piece extraction, join,
  per-doc sum) in DuckDB against it.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import numpy as np

# shared verbatim with pipelines/textstats.py BPE_PIECE_PATTERN and the
# DuckDB regexp_extract_all twin (RE2-safe: no lookarounds)
PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
PIECE_RE = re.compile(PIECE_PATTERN)

_MERGES_PATH = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")


def train_bpe(texts, n_merges: int = 1000) -> list[tuple[str, str]]:
    """Classic BPE training: repeatedly merge the most frequent adjacent
    symbol pair across the piece-frequency table. Deterministic: ties break
    to the lexicographically smallest pair; stops when no pair repeats."""
    piece_freq: Counter = Counter()
    for t in texts:
        piece_freq.update(PIECE_RE.findall(t or ""))
    symbols = {p: tuple(p) for p in piece_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for p, freq in piece_freq.items():
            syms = symbols[p]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += freq
        if not pair_counts:
            break
        mx = max(pair_counts.values())
        if mx < 2:
            break
        best = min(p for p, c in pair_counts.items() if c == mx)
        merges.append(best)
        a, b = best
        ab = a + b
        for p, syms in symbols.items():
            if a not in syms:  # cheap pre-filter
                continue
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[p] = tuple(out)
    return merges


def save_merges(merges: list[tuple[str, str]], path: str = _MERGES_PATH) -> None:
    with open(path, "w") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")


def load_merges(path: str = _MERGES_PATH) -> list[tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            a, b = line.rstrip("\n").split("\t")
            out.append((a, b))
    return out


class BPE:
    """Merge-table encoder with a per-instance piece cache (construct once
    per actor — the load-once pattern of every stateful stage here)."""

    def __init__(self, merges: list[tuple[str, str]] | None = None):
        if merges is None:
            merges = load_merges()
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._cache: dict[str, int] = {}

    def encode(self, piece: str) -> tuple[str, ...]:
        syms = tuple(piece)
        ranks = self.ranks
        while len(syms) > 1:
            best = None
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best = (syms[i], syms[i + 1])
            if best is None:
                break
            a, b = best
            ab = a + b
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
        return syms

    def n_tokens(self, piece: str) -> int:
        v = self._cache.get(piece)
        if v is None:
            v = len(self.encode(piece))
            self._cache[piece] = v
        return v

    def count_batch(self, texts) -> np.ndarray:
        """Per-text BPE token counts: findall pieces per row (the shared
        pre-tokenizer), then ONE encode per unique piece in the batch (all
        repeats are cache hits) and a scatter-add back to rows."""
        findall = PIECE_RE.findall
        pieces_per_row = [findall(t or "") for t in texts]
        lengths = np.fromiter(
            (len(p) for p in pieces_per_row), dtype=np.int64, count=len(pieces_per_row)
        )
        total = int(lengths.sum())
        counts = np.zeros(len(pieces_per_row), dtype=np.int64)
        if total == 0:
            return counts
        flat = np.empty(total, dtype=object)
        pos = 0
        for p in pieces_per_row:
            if p:
                flat[pos : pos + len(p)] = p
                pos += len(p)
        uniq, inv = np.unique(flat, return_inverse=True)
        per_uniq = np.fromiter((self.n_tokens(p) for p in uniq), dtype=np.int64, count=len(uniq))
        rows = np.repeat(np.arange(len(pieces_per_row), dtype=np.int64), lengths)
        np.add.at(counts, rows, per_uniq[inv])
        return counts


class BpeRaritySummaryModel:
    """A REAL loaded artifact riding the enrichment model slot
    (pipelines/conversations.py ExtractiveSummarizer ``model_factory``):
    construction loads the committed merge table from disk; inference picks,
    per text, the 3 distinct pre-tokenizer pieces that the vocabulary
    compresses WORST (highest BPE token count — the rarest, least-merged
    vocabulary; ties break piece-ascending) and joins them in that rank
    order. The output depends on the artifact: retrain the merge table and
    the summaries change. The reference's analogue is the model-backed
    ``generate_node_summary`` (/root/reference/pageindex/utils.py:580-598);
    here the "what is this about" signal is compression rarity instead of an
    LLM. SQL twin: the bpe_pieces sidecar join (oracle/sidecars.py) ranks
    the same pieces with the same tie-break."""

    def __init__(self, top_n: int = 3):
        self.bpe = BPE()  # loads bpe_merges.txt ONCE per actor
        self.top_n = top_n

    def __call__(self, texts) -> list[str]:
        out = []
        n_tokens = self.bpe.n_tokens
        for t in texts:
            # (-n_tokens, piece) is a total order over the distinct set, so
            # no pre-sort is needed for determinism
            distinct = set(PIECE_RE.findall(t or ""))
            ranked = sorted(distinct, key=lambda p: (-n_tokens(p), p))[: self.top_n]
            out.append(" ".join(ranked))
        return out


def main():  # pragma: no cover - artifact regeneration entry point
    """Regenerate the committed merge table from the sf0.001 documents."""
    import pyarrow.parquet as pq

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    merges = train_bpe(texts, n_merges=1000)
    save_merges(merges)
    print(f"wrote {len(merges)} merges to {_MERGES_PATH}")


if __name__ == "__main__":  # pragma: no cover
    main()
