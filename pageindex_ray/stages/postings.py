"""Posting emission + term-partitioned posting-list assembly.

This is THE central shuffle of the engine (SURVEY.md §2.6 A6) — the analogue
of the reference's sequential TOC accumulation chain
(/root/reference/pageindex/page_index.py:578-581, driver-local list mutated
group by group, SURVEY.md §2.4 T4), made stateless + distributed:

    transcripts --map_batches(PostingEmitter)--> (term, doc_id, tf, dl, part)
                --groupby("part").map_groups(assemble)--> compressed shards

Partitioning is by ``part = crc32(term) % P`` — every posting of a term lands
in exactly one partition, so per-term df/cf are complete within their group
and no cross-partition state exists (the single biggest architectural
divergence from the reference, SURVEY.md §4.1 row 2). P balanced hash keys
also keep the shuffle's group sizes even under the Zipfian term distribution:
the unit of shuffle is the partition (many terms), not the term, so a hot
term can never produce a pathological single-term group by itself.

Resume support: the emitter drops postings destined for partitions whose
lineage already validates, so a resumed build does not even shuffle completed
work (FIXTURES.md F5).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..tokenizer import tokenize_batch
from .codec import varint_encode_with_lengths

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        (
            "blocks",
            pa.list_(
                pa.struct(
                    [
                        ("first_doc_id", pa.int64()),
                        ("count", pa.int32()),
                        ("max_factor", pa.float64()),
                        ("deltas", pa.binary()),
                        ("tfs", pa.binary()),
                        ("dls", pa.binary()),
                    ]
                )
            ),
        ),
    ]
)


def term_partition(term: str, num_partitions: int) -> int:
    """Deterministic, process-independent term->partition hash (crc32)."""
    return zlib.crc32(term.encode("utf-8")) % num_partitions


def salted_partitions(term: str, num_partitions: int, salt_factor: int) -> list[int]:
    """The partitions a HOT term's postings are spread across: sub-key
    ``(term, doc_id % salt_factor)`` — Zipf-head terms would otherwise pile
    their entire posting list onto one reducer (SURVEY.md §4.1 skew row).
    Deterministic; the query side re-derives the same list."""
    return [
        zlib.crc32(f"{term}\x00{s}".encode("utf-8")) % num_partitions
        for s in range(salt_factor)
    ]


# Per-worker-process caches for task-based stages: Ray reuses worker
# processes across map_batches tasks, so a module-level cache gives the same
# load-once amortization as an actor pool without actor-pool spin-up latency
# (an autoscaling pool starts at 1 actor and ramps reactively — a serial
# bottleneck at the head of every stage).
_BROADCAST_CACHE: dict[str, object] = {}


def cached_conv_bases(offsets_ref) -> dict:
    if isinstance(offsets_ref, dict):  # local/test path
        off = offsets_ref
        key = str(id(off))
    else:
        key = offsets_ref.hex()
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        off = ray.get(offsets_ref) if not isinstance(offsets_ref, dict) else offsets_ref
        hit = dict(zip(off["conv_ids"].tolist(), off["bases"].tolist()))
        _BROADCAST_CACHE[key] = hit
    return hit


_PART_CACHE: dict[int, dict[str, int]] = {}


def cached_term_parts(terms: np.ndarray, num_partitions: int) -> np.ndarray:
    cache = _PART_CACHE.setdefault(num_partitions, {})
    out = np.empty(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        p = cache.get(t)
        if p is None:
            p = zlib.crc32(t.encode("utf-8")) % num_partitions
            cache[t] = p
        out[i] = p
    return out


_EMPTY_POSTINGS = pa.table(
    {
        "term": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
        "tf": pa.array([], type=pa.int32()),
        "dl": pa.array([], type=pa.int32()),
        "part": pa.array([], type=pa.int32()),
    }
)


def emit_postings_batch(
    batch: pa.Table,
    offsets_ref,
    num_partitions: int,
    completed=frozenset(),
    hot_terms=frozenset(),
    salt_factor: int = 1,
) -> pa.Table:
    """Task-based map_batches stage: transcripts batch -> posting rows.

    Broadcast conv->base offsets and the term->partition hash are cached per
    worker process (load-once amortization without actor-pool ramp-up).
    tf per (doc, term) is counted with factorize + a single int64-key
    np.unique — one C pass, no pandas two-key groupby.

    Row expansion is ~ (unique terms per turn) x input rows; batch_size is
    sized accordingly by the caller (SURVEY.md §4.1 memory row).
    """
    import pyarrow.compute as pc

    base_by_conv = cached_conv_bases(offsets_ref)
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    doc_id = base + turn

    # Arrow-native tokenization: lower + regex split + flatten + dictionary
    # encode — all C kernels, no Python token objects. Identical semantics to
    # tokenizer.tokenize (split on non-alnum, drop empties — the DuckDB-parity
    # contract tested in test_tokenize_matches_duckdb).
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    lists = pc.split_pattern_regex(pc.utf8_lower(text_col), "[^a-z0-9]+")
    flat = lists.flatten()
    parents = lists.value_parent_indices().to_numpy()
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    parents = parents[nonempty.to_numpy(zero_copy_only=False)]
    if len(flat) == 0:
        return _EMPTY_POSTINGS
    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy().astype(np.int64)
    uniques = dict_arr.dictionary  # Arrow StringArray of this batch's terms
    nuniq = len(uniques)

    # doc_len per row = surviving tokens per row
    lengths = np.bincount(parents, minlength=len(doc_id)).astype(np.int64)

    # tf per (row, term): single int64-key unique
    key = parents.astype(np.int64) * nuniq + codes
    uk, counts = np.unique(key, return_counts=True)
    u_local = uk // nuniq
    u_code = uk % nuniq

    uniq_np = np.asarray(uniques.to_pylist(), dtype=object)  # per-batch uniques only
    # plain-string term column via Arrow take (no Python row strings).
    # (A dictionary-encoded column was tried: per-block dictionaries force a
    # many-chunk unification in the reducer that costs more than it saves.)
    terms = uniques.take(pa.array(u_code))
    out_doc_ids = doc_id[u_local]
    parts = cached_term_parts(uniq_np, num_partitions)[u_code]
    if hot_terms and salt_factor > 1:
        # hot terms: route by (term, doc_id % S) so no single reducer gets a
        # whole Zipf-head posting list
        hot_codes = np.flatnonzero(np.asarray([t in hot_terms for t in uniq_np]))
        if len(hot_codes):
            hot_mask = np.isin(u_code, hot_codes)
            if hot_mask.any():
                salt_tables = {
                    int(c): np.asarray(
                        salted_partitions(str(uniq_np[c]), num_partitions, salt_factor),
                        dtype=np.int32,
                    )
                    for c in hot_codes
                }
                salts = (out_doc_ids[hot_mask] % salt_factor).astype(np.int64)
                hcodes = u_code[hot_mask]
                parts = parts.copy()
                parts[hot_mask] = np.asarray(
                    [salt_tables[int(c)][s] for c, s in zip(hcodes, salts)],
                    dtype=np.int32,
                )
    out = pa.table(
        {
            "term": terms.cast(pa.string()),
            "doc_id": pa.array(out_doc_ids, type=pa.int64()),
            "tf": pa.array(counts.astype(np.int32), type=pa.int32()),
            "dl": pa.array(lengths[u_local].astype(np.int32), type=pa.int32()),
            "part": pa.array(parts, type=pa.int32()),
        }
    )
    if completed:
        keep = ~np.isin(parts, list(completed))
        out = out.filter(pa.array(keep))
    return out


class PostingEmitter:
    """Callable-class form of ``emit_postings_batch`` (actor-pool API)."""

    def __init__(self, offsets_ref, num_partitions: int, completed_parts=frozenset(),
                 hot_terms=frozenset(), salt_factor: int = 1):
        self.offsets_ref = offsets_ref
        self.num_partitions = num_partitions
        self.completed = frozenset(completed_parts)
        self.hot_terms = frozenset(hot_terms)
        self.salt_factor = salt_factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        return emit_postings_batch(
            batch, self.offsets_ref, self.num_partitions, self.completed,
            self.hot_terms, self.salt_factor,
        )


def stats_fingerprint(n_docs: int, avgdl: float, cfg, hot_terms=()) -> str:
    """Lineage fingerprint: any change to corpus stats, scoring config or the
    hot-term routing invalidates previously committed partitions."""
    payload = json.dumps(
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "k1": cfg.k1,
            "b": cfg.b,
            "block_size": cfg.block_size,
            "num_partitions": cfg.num_partitions,
            "salt_factor": cfg.salt_factor,
            "hot_terms": sorted(hot_terms),
            "tokenizer": "alnum-lower-v1",
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def assemble_partition(
    group: pd.DataFrame,
    index_dir: str,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    fingerprint: str,
) -> pd.DataFrame:
    """map_groups body: one term-hash partition -> one committed shard file.

    Sorts postings by (term, doc_id), builds delta+varint blocks per term with
    exact per-block max_score, writes ``postings/part-{pid:05d}.parquet``
    atomically (tmp + rename) and a lineage sidecar
    ``_meta/part-{pid:05d}.json`` — the analogue of the reference's JsonLogger
    observability (/root/reference/pageindex/utils.py:313-349) upgraded to a
    resume contract: a partition either commits (checksummed) or it does not
    exist (no silent partial output, unlike the reference's poison-value
    "Error" flow, utils.py:61).
    """
    t0 = time.perf_counter()
    if isinstance(group, pd.DataFrame):  # tolerate pandas-format callers
        group = pa.Table.from_pandas(group, preserve_index=False)
    pid = int(group.column("part")[0].as_py())

    # term codes WITHOUT materializing row strings: the emit stage shipped a
    # dictionary-encoded term column; combine_chunks unifies the per-block
    # dictionaries into one (C kernel). Object-string handling here was
    # memory-bandwidth-bound and throttled multi-core scaling.
    term_col = group.column("term")
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    if not pa.types.is_dictionary(term_col.type):
        term_col = term_col.dictionary_encode()
    codes = term_col.indices.to_numpy().astype(np.int64)
    uniq_np = np.asarray(term_col.dictionary.to_pylist(), dtype=object)

    doc_ids = group.column("doc_id").to_numpy().astype(np.int64)
    tfs = group.column("tf").to_numpy().astype(np.int64)
    dls = group.column("dl").to_numpy().astype(np.int64)
    n = len(codes)

    # sort by (term-rank, doc_id): one int64 lexsort; only |unique terms|
    # string comparisons happen (ranking the dictionary)
    term_order = np.argsort(uniq_np)
    rank = np.empty(len(uniq_np), dtype=np.int64)
    rank[term_order] = np.arange(len(uniq_np))
    sort_keys = rank[codes]
    order = np.lexsort((doc_ids, sort_keys))
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]

    uniq = uniq_np[term_order]
    tcounts = np.bincount(sort_keys, minlength=len(uniq_np)).astype(np.int64)
    keep_terms = tcounts > 0  # unified dictionary may contain terms not in this part
    if not keep_terms.all():
        uniq = uniq[keep_terms]
        tcounts = tcounts[keep_terms]
    tstarts = np.concatenate([[0], np.cumsum(tcounts)[:-1]])
    tbounds = np.append(tstarts, n)

    # per-term stats; df is PARTITION-LOCAL: global for unsalted terms (a
    # term's postings all hash to one partition), partial for salted hot
    # terms (the query side sums partials; idf is computed at query time
    # from the summed df, which is why nothing here needs it)
    df_arr = tcounts.astype(np.int64)
    tf_cum = np.concatenate([[0], np.cumsum(tfs)])
    cf_arr = tf_cum[tbounds[1:]] - tf_cum[tbounds[:-1]]

    # ---- fully vectorized block layout over the whole partition ----------
    pos_in_term = np.arange(n) - np.repeat(tstarts, tcounts)
    is_block_start = (pos_in_term % block_size) == 0
    bstarts = np.flatnonzero(is_block_start)
    term_end_per_block = np.repeat(tbounds[1:], np.ceil(tcounts / block_size).astype(np.int64))
    bends = np.minimum(bstarts + block_size, term_end_per_block)
    bcounts = bends - bstarts
    nb = len(bstarts)

    # exact per-block max of the idf-free BM25 factor (x idf at query time
    # = true WAND upper bound)
    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    factors = tf_f * (k1 + 1.0) / (tf_f + k1 * (1.0 - b + b * dl_f / avgdl))
    max_factors = np.maximum.reduceat(factors, bstarts)

    # one varint encode per payload kind for the WHOLE partition, then slice
    deltas_all = np.diff(doc_ids, prepend=np.int64(0))  # invalid at block starts (unused there)
    d_vals = deltas_all[~is_block_start]
    d_bytes, d_lens = varint_encode_with_lengths(d_vals)
    t_bytes, t_lens = varint_encode_with_lengths(tfs)
    l_bytes, l_lens = varint_encode_with_lengths(dls)

    # byte offsets: position i -> index into d_vals (positions minus the
    # block-starts before them); block j's deltas are positions bs+1..be-1
    d_idx = np.cumsum(~is_block_start)  # 1-based count of delta values up to pos i
    d_cum = np.concatenate([[0], np.cumsum(d_lens)])
    t_cum = np.concatenate([[0], np.cumsum(t_lens)])
    l_cum = np.concatenate([[0], np.cumsum(l_lens)])
    d_off = np.empty(nb + 1, dtype=np.int64)
    d_off[:-1] = d_cum[d_idx[bstarts]]  # deltas of block j start after its head position
    d_off[-1] = d_cum[-1]
    t_off = np.empty(nb + 1, dtype=np.int64)
    t_off[:-1] = t_cum[bstarts]
    t_off[-1] = t_cum[-1]
    l_off = np.empty(nb + 1, dtype=np.int64)
    l_off[:-1] = l_cum[bstarts]
    l_off[-1] = l_cum[-1]

    def _binary_array(payload: bytes, offsets: np.ndarray) -> pa.Array:
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            nb,
            [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(payload)],
        )

    struct = pa.StructArray.from_arrays(
        [
            pa.array(doc_ids[bstarts], type=pa.int64()),
            pa.array(bcounts.astype(np.int32), type=pa.int32()),
            pa.array(max_factors, type=pa.float64()),
            _binary_array(d_bytes, d_off),
            _binary_array(t_bytes, t_off),
            _binary_array(l_bytes, l_off),
        ],
        names=["first_doc_id", "count", "max_factor", "deltas", "tfs", "dls"],
    )
    blocks_per_term = np.ceil(tcounts / block_size).astype(np.int64)
    list_offsets = np.concatenate([[0], np.cumsum(blocks_per_term)]).astype(np.int32)
    blocks_col = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)

    table = pa.table(
        {
            "term": pa.array(uniq, type=pa.string()),
            "df": pa.array(df_arr, type=pa.int64()),
            "cf": pa.array(cf_arr, type=pa.int64()),
            "blocks": blocks_col,
        }
    )

    postings_dir = os.path.join(index_dir, "postings")
    meta_dir = os.path.join(index_dir, "_meta")
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    final_path = os.path.join(postings_dir, f"part-{pid:05d}.parquet")
    tmp_path = os.path.join(postings_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp_path)
    os.replace(tmp_path, final_path)
    with open(final_path, "rb") as f:
        file_md5 = hashlib.md5(f.read()).hexdigest()

    wall = time.perf_counter() - t0
    lineage = {
        "part": pid,
        "n_terms": len(uniq),
        "n_postings": int(n),
        "file_md5": file_md5,
        "fingerprint": fingerprint,
        "wall_s": wall,
    }
    meta_tmp = os.path.join(meta_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(meta_tmp, "w") as f:
        json.dump(lineage, f)
    os.replace(meta_tmp, os.path.join(meta_dir, f"part-{pid:05d}.json"))

    return pd.DataFrame([lineage])


def scan_completed_partitions(index_dir: str, fingerprint: str) -> set[int]:
    """Partitions whose lineage sidecar + shard file validate (resume path)."""
    meta_dir = os.path.join(index_dir, "_meta")
    done: set[int] = set()
    if not os.path.isdir(meta_dir):
        return done
    for name in os.listdir(meta_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(meta_dir, name)) as f:
                lineage = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if lineage.get("fingerprint") != fingerprint:
            continue
        shard = os.path.join(index_dir, "postings", f"part-{lineage['part']:05d}.parquet")
        if not os.path.exists(shard):
            continue
        with open(shard, "rb") as f:
            if hashlib.md5(f.read()).hexdigest() != lineage.get("file_md5"):
                continue
        done.add(int(lineage["part"]))
    return done
