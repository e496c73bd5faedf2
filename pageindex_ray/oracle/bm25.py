"""Single-process golden BM25 oracle.

Plays the role ``results-original/*.json`` plays for the reference
(/root/reference/results-original/ — committed golden outputs used as the
de-facto conformance corpus, SURVEY.md §5.1): the distributed engine must be
rank-identical (doc_ids) with scores equal to 1e-9 rel tol against this
implementation on the fixed query set.

Okapi BM25:
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(d, q) = sum over unique terms t of q, in ascending term order:
                    idf(t) * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl)))

All arithmetic float64. Per-doc accumulation is in ascending unique-term
order; the engine uses the identical order so equal inputs give bit-equal
sums. Ties broken (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..tokenizer import tokenize


@dataclass
class OracleIndex:
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc_ids, tfs)
    doclens: np.ndarray  # doc_id -> token count
    doc_conv: np.ndarray  # doc_id -> conv index (into conv_ids)
    conv_ids: list[str]
    turn_idx: np.ndarray  # doc_id -> turn_idx
    N: int
    avgdl: float
    k1: float
    b: float

    def idf(self, term: str) -> float:
        df = len(self.postings[term][0]) if term in self.postings else 0
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)


def build_oracle_index(table: pa.Table, k1: float = 1.5, b: float = 0.75) -> OracleIndex:
    """Exhaustive dict-based inverted index over a transcripts table.

    doc_id = dense rank in (conv_id asc, turn_idx asc) order — the same
    contract the engine's docmap stage guarantees (FIXTURES.md F2; the
    analogue of the reference's pre-order node numbering,
    /root/reference/pageindex/utils.py:162-172).
    """
    conv = np.asarray(table.column("conv_id").to_pylist(), dtype=object)
    turn = np.asarray(table.column("turn_idx").to_pylist(), dtype=np.int64)
    text = table.column("text").to_pylist()
    order = np.lexsort((turn, conv))
    conv, turn = conv[order], turn[order]
    texts = [text[i] for i in order]

    postings: dict[str, tuple[list[int], list[int]]] = {}
    N = len(texts)
    doclens = np.zeros(N, dtype=np.int64)
    for doc_id, t in enumerate(texts):
        toks = tokenize(t)
        doclens[doc_id] = len(toks)
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            postings.setdefault(w, ([], []))
            postings[w][0].append(doc_id)
            postings[w][1].append(c)

    final = {
        t: (np.asarray(d, dtype=np.int64), np.asarray(f, dtype=np.int64))
        for t, (d, f) in postings.items()
    }
    uniq_convs, conv_codes = np.unique(conv, return_inverse=True)
    return OracleIndex(
        postings=final,
        doclens=doclens,
        doc_conv=conv_codes,
        conv_ids=[str(c) for c in uniq_convs],
        turn_idx=turn,
        N=N,
        avgdl=float(doclens.sum()) / N if N else 0.0,
        k1=k1,
        b=b,
    )


def score_all(index: OracleIndex, query_text: str) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive scores for every doc matching >=1 query term.

    Returns (doc_ids, scores), doc_ids ascending. Accumulation over unique
    query terms in ascending term order, float64.
    """
    terms = sorted(set(tokenize(query_text)))
    acc: dict[int, float] = {}
    for t in terms:
        if t not in index.postings:
            continue
        doc_ids, tfs = index.postings[t]
        idf = index.idf(t)
        dl = index.doclens[doc_ids]
        tf = tfs.astype(np.float64)
        denom = tf + index.k1 * (1.0 - index.b + index.b * dl / index.avgdl)
        # factor-first, then * idf: the engine stores the idf-free factor and
        # multiplies by query-time idf — the oracle mirrors that float64
        # expression order exactly (bit-identity requirement)
        factor = tf * (index.k1 + 1.0) / denom
        contrib = idf * factor
        for d, s in zip(doc_ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + s
    if not acc:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.asarray(sorted(acc), dtype=np.int64)
    scores = np.asarray([acc[int(d)] for d in docs], dtype=np.float64)
    return docs, scores


def topk(index: OracleIndex, query_text: str, k: int = 10) -> list[tuple[int, int, float]]:
    """Golden top-k: [(rank, doc_id, score)], tie-break (score desc, doc_id asc)."""
    docs, scores = score_all(index, query_text)
    if len(docs) == 0:
        return []
    order = np.lexsort((docs, -scores))[:k]
    return [(r, int(docs[i]), float(scores[i])) for r, i in enumerate(order)]


def topk_conversations(index: OracleIndex, query_text: str, k: int = 10) -> list[tuple[int, str, float]]:
    """Conversation-granularity golden top-k: conv score = sum of its turn
    scores (the hierarchy-preservation requirement: rolling leaves up into
    parents, the analogue of /root/reference/pageindex/utils.py:354-400).
    Tie-break (score desc, conv_id asc)."""
    docs, scores = score_all(index, query_text)
    if len(docs) == 0:
        return []
    convs = index.doc_conv[docs]
    agg: dict[int, float] = {}
    # doc_id-ascending iteration => deterministic float accumulation order
    for c, s in zip(convs.tolist(), scores.tolist()):
        agg[c] = agg.get(c, 0.0) + s
    codes = sorted(agg)
    vals = np.asarray([agg[c] for c in codes], dtype=np.float64)
    names = np.asarray([index.conv_ids[c] for c in codes], dtype=object)
    order = np.lexsort((names, -vals))[:k]
    return [(r, str(names[i]), float(vals[i])) for r, i in enumerate(order)]
