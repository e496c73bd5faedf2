"""More-like-this: per-document tf-idf term extraction + BM25 expansion.

Reference analogue: ``generate_doc_description`` / node summaries
(/root/reference/pageindex/utils.py:580-610) distill a document into the
text an LLM can route queries with; here the distillation is the classic
deterministic form — the source document's top-m terms by tf x idf
(tie-break: salience desc, term asc) — and "similar documents" are the
BM25 top-k for that m-term expansion query with the source excluded.

Every step is mirrored exactly by the DuckDB twin in __ray_entry__:

* salience = idf(df) * tf with idf = ln((N - df + 0.5)/(df + 0.5) + 1.0)
  — the same double-precision expression on both sides, so term
  selection order is bit-identical;
* scoring = the engine's standard BM25 (the golden-oracle-verified path);
  the engine fetches top-(k+1), drops the source doc, keeps k — set-equal
  to SQL's "exclude source, then rank" because the true top-k of
  (all \\ {src}) is contained in the top-(k+1) of all.

100 TB shape: source-doc text is a point lookup (parquet row-group
pushdown on conv_id); dfs are one light shard round-trip; the expansion
query runs through the ordinary (distributed-capable) scoring path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pageindex_ray.tokenizer import tokenize

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
    ]
)


def mlt_source_docs(tpath: str, n: int = 6) -> list[tuple[int, int]]:
    """Deterministic (query_id, source doc_id) set: n strided doc ids over
    the corpus (doc ids are dense 0..N-1 in (conv_id, turn_idx) order).
    Footer-only count; handles single-file and sharded corpus layouts."""
    from .build import count_input_rows

    n_docs = count_input_rows(tpath)
    return [(j, ((j + 1) * n_docs) // (n + 1)) for j in range(n)]


def _source_texts(engine, tpath: str, doc_ids: list[int]) -> dict[int, str]:
    """Point-lookup the source docs' text: conv_id pushdown prunes row
    groups at the read; the residual rows are filtered by turn_idx."""
    ids = np.asarray(sorted(set(doc_ids)), dtype=np.int64)
    conv_ids, turn_idx = engine.doc_location(ids)
    wanted = {(str(c), int(t)): int(d) for c, t, d in zip(conv_ids, turn_idx, ids)}
    t = pq.read_table(
        tpath,
        columns=["conv_id", "turn_idx", "text"],
        filters=[("conv_id", "in", sorted({str(c) for c in conv_ids}))],
    )
    out: dict[int, str] = {}
    for c, ti, tx in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        d = wanted.get((c, int(ti)))
        if d is not None:
            out[d] = tx or ""
    return out


def salient_terms(engine, text: str, m: int) -> list[str]:
    """Top-m terms of ``text`` by tf x idf against the engine's corpus
    stats; ties broken by term ascending. Terms absent from the index
    (df unknown) are skipped — they cannot retrieve anything."""
    toks = getattr(engine, "tokenize", tokenize)(text)
    if not toks:
        return []
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    dfs = engine.term_dfs([str(t) for t in uniq])
    scored = [
        (engine.idf(dfs[str(t)]) * int(c), str(t))
        for t, c in zip(uniq, counts)
        if str(t) in dfs
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:m]]


def more_like_this(
    engine, tpath: str, sources: list[tuple[int, int]], m: int = 5, k: int = 10
) -> pa.Table:
    """(query_id, rank, doc_id) of the k most similar docs per source doc."""
    texts = _source_texts(engine, tpath, [d for _, d in sources])
    qids, ranks, docs = [], [], []
    for qid, src in sources:
        terms = salient_terms(engine, texts.get(src, ""), m)
        if not terms:
            continue
        hits = engine.search(" ".join(terms), k=k + 1)
        rank = 0
        for h in hits:
            if h["doc_id"] == src:
                continue
            if rank >= k:
                break
            qids.append(qid)
            ranks.append(rank)
            docs.append(h["doc_id"])
            rank += 1
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int32()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )
