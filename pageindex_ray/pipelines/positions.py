"""Positional postings sidecar: build-once/probe-many phrase search.

`pipelines/phrase.py` verifies phrase candidates by re-reading the CORPUS
text (candidate-then-verify, the reference's ``check_title_appearance``
shape — /root/reference/pageindex/page_index.py:13-46). That is the right
call for a one-off phrase, but a serving workload that answers phrase
queries continuously should not pay a corpus scan per query batch. The
classic engine answer is Lucene's positions file (.prx): store, next to the
doc-id postings, the TOKEN POSITIONS of every (term, doc) occurrence, so a
phrase query is answered entirely inside the index — intersect the phrase
terms' (doc, position) sets with the k-th term shifted by k.

Layout (``index_dir/positions/``)::

    parts/*.parquet   rows (block, term, doc_ids list<int64>,
                      positions list<int32>) — one row per (input block,
                      term); within a row the (doc, position) pairs are in
                      corpus order and parallel (one entry per OCCURRENCE).
                      Rows are term-sorted inside each part file so the
                      query-time ``term isin`` parquet filter prunes row
                      groups.
    meta.json         {"n_docs", "fingerprint", "tokenizer"} — bound to the
                      index fingerprint like the attrs sidecar.
    _SUCCESS          atomic-commit marker (tmp-dir + os.replace).

``block`` is an opaque deterministic id (md5 of the block's doc-id buffer).
Every corpus row — hence every doc's full token stream — lives in exactly
ONE input block, so all of a doc's (term, position) rows share one block id
and phrase matching is embarrassingly parallel per block: query time is a
``read_parquet(filter=term isin phrase_terms)`` (only the phrase terms'
rows leave storage) + ``groupby(block).map_groups`` (the shuffle moves only
those rows, never the corpus), with a tiny driver-side concat of matches.
This holds under arbitrarily row-shuffled corpora — nothing assumes blocks
cover contiguous doc-id ranges.

Semantics are bit-identical to pipelines/phrase.py (and therefore to the
shared DuckDB twin): ``n_occ`` is the non-overlapping left-to-right count
of the space-joined phrase inside the space-joined document. In token
space that is a greedy scan accepting a start ``s`` only when
``s > last_accepted + len(phrase)`` — note the *strict* inequality: two
occurrences exactly adjacent (s == last + L) SHARE the boundary space in
the joined string, which the string count consumes, so the second one does
not match ("a a a a" contains "a a" once under this convention, not
twice). Pinned by tests against both the string count and the SQL twin.

100 TB shape: positions roughly double the index footprint (one int64 doc
ref + int32 position per occurrence, before parquet encoding) — the same
trade every Lucene deployment makes to turn phrase queries from scans into
seeks. Build is one streaming tokenize pass (identical addressing to the
docmap stage); queries touch O(phrase-term occurrences) bytes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pageindex_ray.tokenizer import get_tokenizer, resolve_tokenizer

POS_SCHEMA = pa.schema(
    [
        ("block", pa.string()),
        ("term", pa.string()),
        ("doc_ids", pa.list_(pa.int64())),
        ("positions", pa.list_(pa.int32())),
    ]
)

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("n_occ", pa.int64()),
    ]
)

_FORMAT_VERSION = 1


def positions_dir_of(index_dir: str) -> str:
    return os.path.join(index_dir, "positions")


def _position_rows(batch: pa.Table, offsets_ref, spec) -> pa.Table:
    """One input block -> (block, term, doc_ids, positions) rows.

    Tokenization is the ONE shared spec; doc addressing is the identical
    broadcast searchsorted join the docmap/attrs stages use."""
    from ..stages.postings import cached_conv_bases, conv_bases_for_batch

    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = conv_bases_for_batch(offsets_ref, batch.column("conv_id"))
    if base is None:  # non-ASCII conv ids: per-row dict lookups
        base_by_conv = cached_conv_bases(offsets_ref)
        conv = batch.column("conv_id").to_pylist()
        base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    doc_id = base + turn

    texts = batch.column("text").to_pylist()
    tok = spec.tokenize
    toks_per_row = [tok(t) if t else [] for t in texts]
    lengths = np.fromiter((len(t) for t in toks_per_row), dtype=np.int64, count=len(toks_per_row))
    total = int(lengths.sum())
    if total == 0:
        return POS_SCHEMA.empty_table()
    flat = np.empty(total, dtype=object)
    w = 0
    for toks in toks_per_row:
        n = len(toks)
        if n:
            flat[w : w + n] = toks
            w += n
    row_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    pos = (np.arange(total, dtype=np.int64) - np.repeat(row_starts, lengths)).astype(np.int32)
    docs_flat = np.repeat(doc_id, lengths)

    # group occurrences by term: one stable sort of the unique-inverse keeps
    # corpus (doc, position) order inside each term's row
    uniq, inv = np.unique(flat, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    docs_s = docs_flat[order]
    pos_s = pos[order]
    counts = np.bincount(inv, minlength=len(uniq))
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    block_id = hashlib.md5(doc_id.tobytes()).hexdigest()
    return pa.table(
        {
            "block": pa.array([block_id] * len(uniq), type=pa.string()),
            "term": pa.array(uniq.tolist(), type=pa.string()),
            "doc_ids": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(docs_s, type=pa.int64())
            ),
            "positions": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(pos_s, type=pa.int32())
            ),
        }
    )


def build_positions(index_dir: str, source_path: str, tokenizer=None) -> dict:
    """Build (or resume) the positional sidecar for a committed index.

    One pruned (conv_id, turn_idx, text) streaming pass; committed via
    tmp-dir + os.replace (the attrs/curation discipline). Idempotent: a
    committed sidecar carrying the index's current fingerprint is reused.
    ``tokenizer`` defaults to the index's own spec from meta.json — passing
    a different one would silently break parity with the term index, so it
    is resolved and its NAME must match unless explicitly overridden.
    """
    import pyarrow.parquet as pq

    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    meta = load_meta(index_dir)
    index_tok = meta["config"].get("tokenizer", "alnum-lower-v1")
    spec = resolve_tokenizer(tokenizer if tokenizer is not None else index_tok)
    out_dir = positions_dir_of(index_dir)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        existing = load_positions_meta(out_dir)
        if (
            existing["fingerprint"] == meta["fingerprint"]
            and existing["tokenizer"] == spec.name
        ):
            return {**existing, "resumed": True}
        shutil.rmtree(out_dir)

    from ..state.convtable import ensure_arrow_sidecar

    offsets_ref = {"offsets_path": ensure_arrow_sidecar(index_dir)}

    tmp_dir = os.path.join(index_dir, ".positions.tmp")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "parts"))

    ds = read_parquet_clean(source_path, columns=["conv_id", "turn_idx", "text"])
    ds.map_batches(
        _position_rows,
        fn_args=(offsets_ref, spec),
        batch_format="pyarrow",
        batch_size=8192,
    ).write_parquet(os.path.join(tmp_dir, "parts"))

    out_meta = {
        "format_version": _FORMAT_VERSION,
        "n_docs": int(meta["n_docs"]),
        "fingerprint": meta["fingerprint"],
        "tokenizer": spec.name,
    }
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(out_meta, f, indent=1)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    return {**out_meta, "resumed": False}


def load_positions_meta(pos_dir: str) -> dict:
    with open(os.path.join(pos_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"positions sidecar format_version {meta.get('format_version')} "
            f"not supported (engine speaks {_FORMAT_VERSION})"
        )
    return meta


def greedy_occurrences(starts: np.ndarray, phrase_len: int) -> int:
    """Non-overlapping count over sorted candidate start positions, with
    the shared-boundary-space rule: accept ``s`` only when
    ``s > last_accepted + phrase_len`` (strict — see module docstring)."""
    last = -(phrase_len + 1)
    n = 0
    for s in starts:
        if s > last + phrase_len:
            n += 1
            last = int(s)
    return n


def _match_block(group: pa.Table, qtoks: list[tuple[int, list[str]]]) -> pa.Table:
    """Phrase matching inside one input block: intersect the k-th term's
    (doc, pos - k) key sets. Keys pack as doc * P + shifted_pos with P >
    the block's max position — no assumption on doc-id magnitude."""
    group = group.combine_chunks()
    terms = group.column("term").to_pylist()
    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    max_pos = 0
    for i, t in enumerate(terms):
        docs = np.asarray(group.column("doc_ids")[i].values.to_numpy(), dtype=np.int64)
        poss = np.asarray(
            group.column("positions")[i].values.to_numpy(), dtype=np.int64
        )
        by_term[t] = (docs, poss)
        if len(poss):
            max_pos = max(max_pos, int(poss.max()))
    P = max_pos + 2

    out_q: list[int] = []
    out_d: list[int] = []
    out_n: list[int] = []
    for qid, toks in qtoks:
        if not toks or any(t not in by_term for t in toks):
            continue
        keys: np.ndarray | None = None
        for k, t in enumerate(toks):
            docs, poss = by_term[t]
            m = poss >= k
            kk = docs[m] * P + (poss[m] - k)
            keys = kk if keys is None else np.intersect1d(keys, kk, assume_unique=True)
            if keys.size == 0:
                break
        if keys is None or keys.size == 0:
            continue
        keys.sort()
        doc = keys // P
        start = keys % P
        L = len(toks)
        i = 0
        n = len(keys)
        while i < n:
            j = i
            d = doc[i]
            while j < n and doc[j] == d:
                j += 1
            c = greedy_occurrences(start[i:j], L)
            if c:
                out_q.append(qid)
                out_d.append(int(d))
                out_n.append(c)
            i = j
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "n_occ": pa.array(out_n, type=pa.int64()),
        }
    )


def _min_span(pos_lists: list[np.ndarray]) -> int:
    """Minimal ``max - min`` over tuples choosing one position per list —
    the classic k-pointer smallest-covering-range merge, equal to the SQL
    twin's MIN(GREATEST(..) - LEAST(..)) over the occurrence cross product
    without materializing it."""
    k = len(pos_lists)
    labels = np.concatenate([np.full(len(p), i, dtype=np.int64) for i, p in enumerate(pos_lists)])
    merged = np.concatenate(pos_lists)
    order = np.argsort(merged, kind="stable")
    merged = merged[order]
    labels = labels[order]
    counts = np.zeros(k, dtype=np.int64)
    covered = 0
    best = np.iinfo(np.int64).max
    lo = 0
    for hi in range(len(merged)):
        if counts[labels[hi]] == 0:
            covered += 1
        counts[labels[hi]] += 1
        while covered == k:
            best = min(best, int(merged[hi] - merged[lo]))
            counts[labels[lo]] -= 1
            if counts[labels[lo]] == 0:
                covered -= 1
            lo += 1
    return int(best)


def _proximity_block(
    group: pa.Table, qterms: list[tuple[int, list[str]]], slop: int
) -> pa.Table:
    """Proximity matching inside one input block: per query, docs whose
    DISTINCT terms all co-occur within a token window of span <= slop;
    emits the minimal span."""
    group = group.combine_chunks()
    terms = group.column("term").to_pylist()
    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for i, t in enumerate(terms):
        docs = np.asarray(group.column("doc_ids")[i].values.to_numpy(), dtype=np.int64)
        poss = np.asarray(group.column("positions")[i].values.to_numpy(), dtype=np.int64)
        order = np.lexsort((poss, docs))
        by_term[t] = (docs[order], poss[order])

    out_q: list[int] = []
    out_d: list[int] = []
    out_s: list[int] = []
    for qid, toks in qterms:
        if not toks or any(t not in by_term for t in toks):
            continue
        cand: np.ndarray | None = None
        for t in toks:
            docs = np.unique(by_term[t][0])
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if cand.size == 0:
                break
        if cand is None or cand.size == 0:
            continue
        for d in cand:
            lists = []
            for t in toks:
                docs, poss = by_term[t]
                a = np.searchsorted(docs, d, side="left")
                b = np.searchsorted(docs, d, side="right")
                lists.append(poss[a:b])
            span = _min_span(lists)
            if span <= slop:
                out_q.append(qid)
                out_d.append(int(d))
                out_s.append(span)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "span": pa.array(out_s, type=pa.int64()),
        }
    )


def _ordered_min_span(pos_lists: list[np.ndarray]) -> int:
    """Minimal ``p_k - p_1`` over STRICTLY-INCREASING tuples choosing one
    position per list in list order (Lucene SpanNearQuery's in_order
    semantics). For a fixed first position the greedy chain — always the
    smallest next position that still exceeds the previous pick — minimizes
    the last position (any larger intermediate pick only shrinks later
    choices), so min over first positions is the global minimum; equal to
    the SQL twin's MIN over the order-constrained join without
    materializing it. Returns int64 max when no valid chain exists."""
    best = np.iinfo(np.int64).max
    rest = pos_lists[1:]
    for p1 in pos_lists[0]:
        cur = int(p1)
        for lst in rest:
            i = int(np.searchsorted(lst, cur, side="right"))
            if i == len(lst):
                cur = -1
                break
            cur = int(lst[i])
        if cur >= 0:
            best = min(best, cur - int(p1))
    return int(best)


def _span_near_block(
    group: pa.Table, qterms: list[tuple[int, list[str], int]]
) -> pa.Table:
    """Ordered span matching inside one input block: per (query, slop)
    request, docs where the query's tokens appear IN ORDER at strictly
    increasing positions with span = p_last - p_first - (k-1) <= slop;
    emits the minimal span. The slop rides PER REQUEST, so one sidecar
    pass answers a batch mixing slop values. Duplicate query tokens are
    legitimate (each consumes its own position)."""
    group = group.combine_chunks()
    terms = group.column("term").to_pylist()
    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for i, t in enumerate(terms):
        docs = np.asarray(group.column("doc_ids")[i].values.to_numpy(), dtype=np.int64)
        poss = np.asarray(group.column("positions")[i].values.to_numpy(), dtype=np.int64)
        order = np.lexsort((poss, docs))
        by_term[t] = (docs[order], poss[order])

    out_q: list[int] = []
    out_d: list[int] = []
    out_s: list[int] = []
    for qid, toks, slop in qterms:
        if not toks or any(t not in by_term for t in toks):
            continue
        cand: np.ndarray | None = None
        for t in dict.fromkeys(toks):
            docs = np.unique(by_term[t][0])
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if cand.size == 0:
                break
        if cand is None or cand.size == 0:
            continue
        extra = len(toks) - 1
        for d in cand:
            lists = []
            for t in toks:
                docs, poss = by_term[t]
                a = np.searchsorted(docs, d, side="left")
                b = np.searchsorted(docs, d, side="right")
                lists.append(poss[a:b])
            raw = _ordered_min_span(lists)
            if raw == np.iinfo(np.int64).max:
                continue
            span = raw - extra
            if span <= slop:
                out_q.append(qid)
                out_d.append(int(d))
                out_s.append(span)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "span": pa.array(out_s, type=pa.int64()),
        }
    )


def span_near_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    slop: int = 3,
    tokenizer=None,
) -> pa.Table:
    """ORDERED span-near from the positional sidecar (Lucene SpanNearQuery
    with in_order=True): a doc matches when the query's token sequence
    occurs at strictly increasing positions with at most ``slop`` extra
    tokens interleaved (span = p_last - p_first - (k-1); slop=0 is exactly
    the phrase query). Emits the minimal span per (query, doc).

    Same distribution shape as proximity_search: term-filtered sidecar read
    + groupby(block); per-block work is a greedy position chain per
    candidate doc. Unlike proximity, token ORDER matters and duplicate
    query tokens each consume their own position."""
    return span_near_search_multi(
        index_dir, [(qid, text, int(slop)) for qid, text in queries], tokenizer
    )


def span_near_search_multi(
    index_dir: str,
    queries: list[tuple[int, str, int]],
    tokenizer=None,
) -> pa.Table:
    """Per-request-slop form of ``span_near_search``: each item is
    (query_id, text, slop). ONE sidecar read + groupby answers the whole
    batch even when slop values differ (the query-string path mixes "a
    b"~1 and "c d"~3 clauses in one batch — a pass per distinct slop paid
    a corpus-wide shuffle each)."""
    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    pos_dir = positions_dir_of(index_dir)
    if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
        raise FileNotFoundError(
            f"positional sidecar at {pos_dir} has no _SUCCESS marker: run "
            "build_positions() (or `python -m pageindex_ray positions`) first"
        )
    pmeta = load_positions_meta(pos_dir)
    imeta = load_meta(index_dir)
    if pmeta["fingerprint"] != imeta["fingerprint"]:
        raise ValueError(
            "positions sidecar was built for a different index (fingerprint "
            "mismatch): rebuild it with build_positions()"
        )
    spec = resolve_tokenizer(tokenizer if tokenizer is not None else pmeta["tokenizer"])

    qterms = [
        (int(qid), list(spec.tokenize(text)), int(slop)) for qid, text, slop in queries
    ]
    all_terms = sorted({t for _, toks, _ in qterms for t in toks})
    if not all_terms:
        return PROX_SCHEMA.empty_table()

    ds = read_parquet_clean(
        os.path.join(pos_dir, "parts"),
        columns=["block", "term", "doc_ids", "positions"],
        filter=pc.field("term").isin(all_terms),
    )
    out = ds.groupby("block").map_groups(
        _span_near_block, fn_args=(qterms,), batch_format="pyarrow"
    )
    tables = list(out.iter_batches(batch_format="pyarrow"))
    tables = [t.select(PROX_SCHEMA.names) for t in tables if t.num_rows]
    table = pa.concat_tables(tables) if tables else PROX_SCHEMA.empty_table()
    return table.cast(PROX_SCHEMA).sort_by(
        [("query_id", "ascending"), ("doc_id", "ascending")]
    )


PROX_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("span", pa.int64()),
    ]
)


def proximity_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    slop: int = 7,
    tokenizer=None,
) -> pa.Table:
    """Unordered proximity match from the positional sidecar: a doc matches
    when all the query's DISTINCT terms co-occur inside a token window of
    span <= ``slop`` (span = max position - min position of one chosen
    occurrence per term, minimized over choices — Lucene's sloppy-phrase
    cousin with order-free semantics so the SQL twin is a plain k-way
    position join). Duplicate query tokens are deduplicated (first
    occurrence order is irrelevant — the window is unordered).

    Same distribution shape as phrase_search_positional: term-filtered
    sidecar read + groupby(block); per-block work is a k-pointer merge per
    candidate doc (candidates already pruned to docs containing every
    term)."""
    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    pos_dir = positions_dir_of(index_dir)
    if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
        raise FileNotFoundError(
            f"positional sidecar at {pos_dir} has no _SUCCESS marker: run "
            "build_positions() (or `python -m pageindex_ray positions`) first"
        )
    pmeta = load_positions_meta(pos_dir)
    imeta = load_meta(index_dir)
    if pmeta["fingerprint"] != imeta["fingerprint"]:
        raise ValueError(
            "positions sidecar was built for a different index (fingerprint "
            "mismatch): rebuild it with build_positions()"
        )
    spec = resolve_tokenizer(tokenizer if tokenizer is not None else pmeta["tokenizer"])

    qterms = [
        (int(qid), sorted(set(spec.tokenize(text)))) for qid, text in queries
    ]
    all_terms = sorted({t for _, toks in qterms for t in toks})
    if not all_terms:
        return PROX_SCHEMA.empty_table()

    ds = read_parquet_clean(
        os.path.join(pos_dir, "parts"),
        columns=["block", "term", "doc_ids", "positions"],
        filter=pc.field("term").isin(all_terms),
    )
    out = ds.groupby("block").map_groups(
        _proximity_block, fn_args=(qterms, int(slop)), batch_format="pyarrow"
    )
    tables = list(out.iter_batches(batch_format="pyarrow"))
    tables = [t.select(PROX_SCHEMA.names) for t in tables if t.num_rows]
    table = pa.concat_tables(tables) if tables else PROX_SCHEMA.empty_table()
    return table.cast(PROX_SCHEMA).sort_by(
        [("query_id", "ascending"), ("doc_id", "ascending")]
    )


def proximity_queries(tpath: str, n: int = 10) -> list[tuple[int, str]]:
    """Deterministic proximity query set drawn from the corpus: for the
    j-th strided row, 2 terms (every other j: 3) sampled from distinct
    token positions so each query has at least one co-occurring doc."""
    from .phrase import phrase_queries  # reuse the strided row reader

    base = phrase_queries(tpath, n=n)
    out: list[tuple[int, str]] = []
    for qid, text in base:
        toks = text.split()
        # spread the terms: first + last token of the sampled window, plus
        # the middle one for odd qids when available
        terms = [toks[0], toks[-1]] if len(toks) >= 2 else toks
        if qid % 2 and len(toks) >= 3:
            terms = toks[:3]
        out.append((qid, " ".join(terms)))
    return out


def span_near_queries(tpath: str, n: int = 10) -> list[tuple[int, str]]:
    """Deterministic ordered-span query set: even qids keep the full
    corpus-window token sequence (the source doc matches at span 0); odd
    qids drop the window's middle tokens (first + last only — the source
    doc matches at span = number of dropped tokens, exercising slop > 0)."""
    from .phrase import phrase_queries  # reuse the strided row reader

    base = phrase_queries(tpath, n=n)
    out: list[tuple[int, str]] = []
    for qid, text in base:
        toks = text.split()
        if qid % 2 and len(toks) >= 3:
            toks = [toks[0], toks[-1]]
        out.append((qid, " ".join(toks)))
    return out


def phrase_search_positional(
    index_dir: str, phrases: list[tuple[int, str]], tokenizer=None
) -> pa.Table:
    """Exact-phrase match answered entirely from the positional sidecar —
    the corpus is never read. Same (query_id, doc_id, n_occ) contract and
    occurrence semantics as pipelines/phrase.py.

    Wide work: a parquet read FILTERED to the phrase terms' rows (term-sorted
    part files make the filter a row-group prune) and a groupby(block)
    shuffle of only those rows. No driver-side broadcast of candidates, no
    per-query corpus scan — the trade is the sidecar's build-time footprint.
    """
    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    pos_dir = positions_dir_of(index_dir)
    if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
        raise FileNotFoundError(
            f"positional sidecar at {pos_dir} has no _SUCCESS marker: run "
            "build_positions() (or `python -m pageindex_ray positions`) first"
        )
    pmeta = load_positions_meta(pos_dir)
    imeta = load_meta(index_dir)
    if pmeta["fingerprint"] != imeta["fingerprint"]:
        raise ValueError(
            "positions sidecar was built for a different index (fingerprint "
            "mismatch): rebuild it with build_positions()"
        )
    spec = resolve_tokenizer(tokenizer if tokenizer is not None else pmeta["tokenizer"])

    qtoks = [(int(qid), spec.tokenize(text)) for qid, text in phrases]
    all_terms = sorted({t for _, toks in qtoks for t in toks})
    if not all_terms:
        return RESULT_SCHEMA.empty_table()

    ds = read_parquet_clean(
        os.path.join(pos_dir, "parts"),
        columns=["block", "term", "doc_ids", "positions"],
        filter=pc.field("term").isin(all_terms),
    )
    out = ds.groupby("block").map_groups(
        _match_block, fn_args=(qtoks,), batch_format="pyarrow"
    )
    tables = list(out.iter_batches(batch_format="pyarrow"))
    tables = [t.select(RESULT_SCHEMA.names) for t in tables if t.num_rows]
    table = pa.concat_tables(tables) if tables else RESULT_SCHEMA.empty_table()
    return table.cast(RESULT_SCHEMA).sort_by(
        [("query_id", "ascending"), ("doc_id", "ascending")]
    )
