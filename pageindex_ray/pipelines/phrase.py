"""Exact phrase search: index-pruned candidates + distributed text verify.

Reference analogue: ``check_title_appearance``
(/root/reference/pageindex/page_index.py:13-46) verifies that an extracted
section title literally appears in a page's text — the same
candidate-then-verify shape, done there with an LLM yes/no call per
(title, page). Here the candidate set comes from the inverted index (the
intersection of the phrase terms' posting lists — docs that cannot contain
the phrase never leave the index), and the verify step is a streaming Ray
Data pass over ONLY the candidate conversations (parquet filter pushdown
prunes row groups at the read), counting exact token-adjacency occurrences.

Semantics (mirrored bit-for-bit by the DuckDB twin in __ray_entry__):

* the phrase and every document are tokenized with the ONE shared
  tokenizer (pageindex_ray/tokenizer.py) — matching is on normalized
  token adjacency, not raw bytes;
* ``n_occ`` is the non-overlapping left-to-right count of the
  space-joined phrase inside the space-joined document (with sentinel
  spaces on both ends), i.e. ``(' '+' '.join(doc_toks)+' ').count(' '+' '.join(phrase_toks)+' ')``
  — identical to SQL's ``(length(jt) - length(replace(jt, p, ''))) // length(p)``;
* docs with zero occurrences produce no row; output is sorted by
  (query_id, doc_id).

100 TB shape: the wide work is the per-term posting fetch (already
sharded) and the verify scan, which reads only candidate conversations'
row groups and ships a small (conv_id, turn_idx) -> phrases map via one
``ray.put`` broadcast. The per-row Python loop in the verifier touches
candidate rows ONLY — a set already pruned to docs containing every
phrase term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from pageindex_ray.sources.readers import read_parquet_clean
from pageindex_ray.tokenizer import resolve_tokenizer, tokenize

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("n_occ", pa.int64()),
    ]
)


def phrase_key(toks: list[str]) -> str:
    """Space-joined phrase with sentinel spaces — the exact needle counted
    in the space-joined document."""
    return " " + " ".join(toks) + " "


def phrase_queries(tpath: str, n: int = 12) -> list[tuple[int, str]]:
    """Deterministic phrase set drawn from the corpus itself: for the j-th
    of ``n`` strided rows (file order — the corpus parquet is written
    deterministically), a 2- or 3-token window starting at token 1.
    Rows with fewer than 4 tokens fall back to their first two tokens and
    rows with fewer than 2 are skipped, so every emitted phrase has at
    least one guaranteed occurrence. Works over a single parquet file OR a
    sharded corpus directory (shards in sorted-name order = writer order,
    so global row indexes are the same as the monolithic layout's)."""
    from ..sources.readers import input_files

    pfs = [pq.ParquetFile(f) for f in input_files(tpath)]
    n_rows = sum(pf.metadata.num_rows for pf in pfs)
    wanted = sorted({(j * n_rows) // n for j in range(n)})
    # map each global row index to (file, row group, local offset) and read
    # ONLY those row groups — O(12 rows), not an O(corpus) materialization
    texts: dict[int, str] = {}
    rg_start = 0
    it = iter(wanted)
    nxt = next(it, None)
    for pf in pfs:
        for rg in range(pf.metadata.num_row_groups):
            rg_rows = pf.metadata.row_group(rg).num_rows
            locals_ = []
            while nxt is not None and nxt < rg_start + rg_rows:
                locals_.append(nxt - rg_start)
                nxt = next(it, None)
            if locals_:
                col = pf.read_row_group(rg, columns=["text"]).column("text")
                for loc in locals_:
                    texts[rg_start + loc] = col[loc].as_py()
            rg_start += rg_rows
    out: list[tuple[int, str]] = []
    for j in range(n):
        toks = tokenize(texts[(j * n_rows) // n] or "")
        if len(toks) >= 4:
            w = 2 + (j % 2)
            phrase = toks[1 : 1 + w]
        elif len(toks) >= 2:
            phrase = toks[:2]
        else:
            continue
        out.append((j, " ".join(phrase)))
    return out


class _PhraseVerifier:
    """Actor-pool verify stage: holds the broadcast candidate map
    ((conv_id, turn_idx) -> [(query_id, needle)]) for its lifetime; per
    batch, a C-kernel membership mask selects candidate rows and only
    those are tokenized and counted."""

    def __init__(self, cand_ref, tokenizer: str = "alnum-lower-v1"):
        cand = ray.get(cand_ref) if isinstance(cand_ref, ray.ObjectRef) else cand_ref
        # keys as 'conv:turn' strings for the vectorized is_in mask
        self.cand: dict[str, list[tuple[int, str, int]]] = cand
        self.keyset = pa.array(sorted(cand.keys()), type=pa.string())
        self.tokenize = resolve_tokenizer(tokenizer).tokenize

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            batch.column("conv_id"),
            pc.cast(batch.column("turn_idx"), pa.string()),
            ":",
        )
        mask = pc.is_in(keys, value_set=self.keyset)
        if not pc.any(mask).as_py():
            return RESULT_SCHEMA.empty_table()
        sel_keys = keys.filter(mask).to_pylist()
        texts = batch.column("text").filter(mask).to_pylist()
        qids, docs, occs = [], [], []
        for key, text in zip(sel_keys, texts):
            joined = phrase_key(self.tokenize(text or ""))
            for qid, needle, doc_id in self.cand[key]:
                c = joined.count(needle)
                if c:
                    qids.append(qid)
                    docs.append(doc_id)
                    occs.append(c)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_occ": pa.array(occs, type=pa.int64()),
            }
        )


def phrase_search(
    engine,
    corpus_path: str,
    phrases: list[tuple[int, str]],
    max_candidates: int = 2_000_000,
    pushdown_max_convs: int = 100_000,
) -> pa.Table:
    """Exact-phrase match over an indexed corpus.

    ``engine`` is a warm SearchEngine (the shard pool supplies the posting
    intersections); ``corpus_path`` is the transcripts parquet the index
    was built from. Returns (query_id, doc_id, n_occ) for every document
    containing each phrase at least once.

    Scale guards: the candidate map is a DRIVER-side broadcast, so its
    size is bounded by ``max_candidates`` total (query, doc) pairs — a
    stopword-only phrase ("of the") intersects to a huge candidate set
    and raises a clear error instead of silently building a multi-GB
    broadcast; add a rarer term to the phrase or raise the bound. The
    conv_id parquet-filter pushdown is applied only while the candidate
    conversation list stays under ``pushdown_max_convs`` (a pyarrow
    expression with millions of strings costs more than it prunes);
    beyond it the verify pass streams the corpus and relies on the
    per-batch membership mask alone.
    """
    tok = getattr(engine, "tokenize", tokenize)
    qtoks = {qid: tok(text) for qid, text in phrases}
    all_terms = sorted({t for toks in qtoks.values() for t in toks})
    if not all_terms:
        return RESULT_SCHEMA.empty_table()
    ids_by_term = engine.term_doc_ids(all_terms)

    # per-phrase candidates: intersect posting doc-id lists, smallest first
    cand_by_q: dict[int, np.ndarray] = {}
    for qid, toks in qtoks.items():
        uniq = sorted(set(toks))
        if not uniq or any(t not in ids_by_term for t in uniq):
            continue
        uniq.sort(key=lambda t: len(ids_by_term[t]))
        cur = ids_by_term[uniq[0]]
        for t in uniq[1:]:
            if not len(cur):
                break
            cur = np.intersect1d(cur, ids_by_term[t], assume_unique=True)
        if len(cur):
            cand_by_q[qid] = cur
    if not cand_by_q:
        return RESULT_SCHEMA.empty_table()
    n_cand = sum(len(v) for v in cand_by_q.values())
    if n_cand > max_candidates:
        worst = max(cand_by_q, key=lambda q: len(cand_by_q[q]))
        raise ValueError(
            f"phrase candidate set too large to broadcast: {n_cand} (query, doc) "
            f"pairs (limit {max_candidates}); least selective query_id={worst} with "
            f"{len(cand_by_q[worst])} candidates — add a rarer term to the phrase "
            "or raise max_candidates"
        )

    # candidate map keyed by 'conv:turn' (the verify stage's mask key)
    cand: dict[str, list[tuple[int, str, int]]] = {}
    convs_needed: set[str] = set()
    for qid, doc_ids in sorted(cand_by_q.items()):
        needle = phrase_key(qtoks[qid])
        conv_ids, turn_idx = engine.doc_location(doc_ids)
        for c, t, d in zip(conv_ids, turn_idx, doc_ids):
            key = f"{c}:{int(t)}"
            cand.setdefault(key, []).append((qid, needle, int(d)))
            convs_needed.add(str(c))

    read_kw = {}
    if len(convs_needed) <= pushdown_max_convs:
        read_kw["filter"] = pc.field("conv_id").isin(sorted(convs_needed))
    ds = read_parquet_clean(
        corpus_path, columns=["conv_id", "turn_idx", "text"], **read_kw
    )
    cand_ref = ray.put(cand)
    out = ds.map_batches(
        _PhraseVerifier,
        fn_constructor_args=(cand_ref, getattr(engine, "tokenizer_spec", "alnum-lower-v1")),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    tables = [t for t in out.iter_batches(batch_format="pyarrow")]
    table = pa.concat_tables(tables) if tables else RESULT_SCHEMA.empty_table()
    return table.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])
