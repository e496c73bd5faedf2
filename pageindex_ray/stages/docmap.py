"""Docmap: stable global addressing of turns.

Reference analogue: pre-order DFS node numbering ``write_node_id``
(/root/reference/pageindex/utils.py:162-172) plus the per-page
``physical_index`` address space (page_index.py:571-574) — every unit carries
a stable global address through every transform.

doc_id contract (FIXTURES.md F2): dense rank 0..N-1 in
``(conv_id asc, turn_idx asc)`` order, reproducible across runs, parallelism
levels and resumes. Because ``turn_idx`` is dense 0..len(conv)-1 within a
conversation (validated here — the analogue of the reference's
``validate_and_truncate_physical_indices`` bounds guard,
page_index.py:1112-1142), the rank factors into

    doc_id = conv_base[conv_id] + turn_idx

where conv_base is the exclusive prefix sum of conversation lengths in
conv_id order. This derives the global order FROM THE DATA instead of from a
global sort of the full table: the only shuffle is a per-conversation count
aggregate whose output is #convs rows (tiny relative to #turns), and the
base-offset table is broadcast once via ray.put. At 10^12 turns / 10^10+
conversations the broadcast table itself would shard hierarchically
(range-partitioned prefix sums); the sandbox keeps it as one array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data



def compute_conv_offsets(
    ds: "ray.data.Dataset",
    with_tokens: bool = True,
    driver_merge_max_rows: int = 8_000_000,
    tokenizer="alnum-lower-v1",
) -> dict[str, np.ndarray]:
    """Per-conversation (count, min, max of turn_idx) -> validated dense-turn
    contract + exclusive prefix-sum base offsets.

    Returns {"conv_ids": sorted conv ids, "bases": int64 offsets, "n_docs": N}
    plus "total_tokens" when ``with_tokens`` (the build's direct-reduce path
    instead recovers total_tokens from the packed docmap runs, skipping a
    full tokenize pass here).

    Shape: ONE streaming pass does the per-batch combine (bounded partials —
    at most #distinct-convs rows per 128k-turn batch, never ships `text`
    rows). The merge of those partials is size-adaptive:

    * <= ``driver_merge_max_rows`` partial rows: one driver-side Arrow
      group_by + sort. A single fixed cost, no extra Dataset execution; the
      driver must hold O(#convs) for the final broadcast table anyway, and
      the threshold (8M rows, a few hundred MB) keeps the driver table in
      that same order of magnitude. Measured at sf4 (7.6M partial rows —
      the row-shuffled corpus makes per-batch combine nearly
      reduction-free): driver merge 3.0 s vs distributed 4.2 s.
    * above: hash-bucket the partial rows and ``groupby("bucket")`` so each
      merge task receives ONLY its own rows (a tiny shuffle of the partial
      aggregates — round-2's version instead shipped every partial table to
      every bucket task, a 32x read amplification and ~2.4s of fixed
      overhead at sf0.1). Bucket outputs are internally conv-sorted; the
      driver concatenates in bucket-boundary order.

    Beyond driver memory for the offsets table itself, the table would
    become a dataset and doc_id assignment a broadcast-join per conv range.
    """
    # All grouping below runs on Arrow's multithreaded C++ group_by (the
    # pandas groupby it replaced measured ~1.7x slower per batch and paid a
    # to_pandas conversion each side). Aggregate output columns are selected
    # BY NAME (turn_idx_count etc.) so engine-version column order can't
    # silently reorder fields. UTF-8 byte order == code-point order, so
    # Arrow's sort_by matches the Python string ordering the doc_id
    # contract is defined in.
    out_names = ["conv_id", "n_turns", "min_turn", "max_turn"] + (
        ["sum_tokens"] if with_tokens else []
    )

    def _select(g: pa.Table, mapping: list[tuple[str, str]]) -> pa.Table:
        return pa.table({out: g.column(src) for out, src in mapping})

    part_aggs = [("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max")]
    part_map = [
        ("conv_id", "conv_id"),
        ("n_turns", "turn_idx_count"),
        ("min_turn", "turn_idx_min"),
        ("max_turn", "turn_idx_max"),
    ]
    merge_aggs = [("n_turns", "sum"), ("min_turn", "min"), ("max_turn", "max")]
    merge_map = [
        ("conv_id", "conv_id"),
        ("n_turns", "n_turns_sum"),
        ("min_turn", "min_turn_min"),
        ("max_turn", "max_turn_max"),
    ]
    if with_tokens:
        part_aggs.append(("n_tok", "sum"))
        part_map.append(("sum_tokens", "n_tok_sum"))
        merge_aggs.append(("sum_tokens", "sum"))
        merge_map.append(("sum_tokens", "sum_tokens_sum"))

    from ..tokenizer import resolve_tokenizer

    tok_spec = resolve_tokenizer(tokenizer)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
        }
        if with_tokens:
            cols["n_tok"] = tok_spec.arrow_token_count(batch.column("text")).cast(pa.int64())
        g = pa.table(cols).group_by("conv_id").aggregate(part_aggs)
        return _select(g, part_map)

    def _merge(tbl: pa.Table) -> pa.Table:
        return _select(tbl.group_by("conv_id").aggregate(merge_aggs), merge_map)

    src_ds = ds if with_tokens else ds.select_columns(["conv_id", "turn_idx"])
    partials = src_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).materialize()

    if partials.count() <= driver_merge_max_rows:
        # single fixed-cost merge: partial rows are already aggregates
        tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
        if tables:
            agg = _merge(pa.concat_tables(tables))
        else:
            agg = pa.table({c: [] for c in out_names})
    else:
        N_BUCKETS = 256

        def add_bucket(batch: pa.Table) -> pa.Table:
            # deterministic hash bucket (not range): no boundary-sampling
            # pre-pass needed, and crc32 (NOT builtin hash, which is
            # per-process randomized) keeps a conv's rows in one bucket
            # across workers; global order is restored by a driver sort of
            # the already-merged conv rows
            import zlib

            h = np.fromiter(
                (zlib.crc32(c.encode("utf-8")) for c in batch.column("conv_id").to_pylist()),
                dtype=np.int64,
                count=batch.num_rows,
            )
            return batch.append_column("bucket", pa.array(h % N_BUCKETS, type=pa.int64()))

        merged = (
            partials.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda t: _merge(t.drop_columns(["bucket"])), batch_format="pyarrow"
            )
            .materialize()
        )
        agg = pa.concat_tables(t for t in ray.get(merged.to_arrow_refs()) if t.num_rows)
    del partials
    agg = agg.sort_by("conv_id") if agg.num_rows else agg

    n = agg.column("n_turns").to_numpy().astype(np.int64) if agg.num_rows else np.empty(0, np.int64)
    min_turn = agg.column("min_turn").to_numpy() if agg.num_rows else np.empty(0, np.int64)
    max_turn = agg.column("max_turn").to_numpy() if agg.num_rows else np.empty(0, np.int64)
    bad = np.flatnonzero((min_turn != 0) | (max_turn != n - 1))
    if len(bad):
        first = {c: agg.column(c)[int(bad[0])].as_py() for c in agg.column_names}
        raise ValueError(
            f"{len(bad)} conversations violate the dense turn_idx contract (first: {first})"
        )
    bases = np.concatenate([[0], np.cumsum(n)[:-1]])
    out = {
        "conv_ids": np.asarray(agg.column("conv_id").to_pylist(), dtype=object),
        "bases": bases,
        "n_docs": int(n.sum()),
    }
    if with_tokens:
        tok = agg.column("sum_tokens").to_numpy() if agg.num_rows else np.empty(0, np.int64)
        out["total_tokens"] = int(tok.sum())
    return out


def docmap_batch(batch: pa.Table, offsets_ref, tokenizer="alnum-lower-v1") -> pa.Table:
    """Task-based map_batches stage: transcripts batch -> docmap batch.

    The conv->base lookup is a broadcast join: put once on the driver,
    fetched + built once per worker process (module-level cache in
    stages.postings — SURVEY.md §2.5 J1), reused by every task the worker
    runs. Tasks, not an actor pool: no spin-up ramp at stage head.
    """
    from .postings import cached_conv_bases, conv_bases_for_batch

    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = conv_bases_for_batch(offsets_ref, batch.column("conv_id"))
    if base is None:  # non-ASCII conv ids: per-row dict lookups
        base_by_conv = cached_conv_bases(offsets_ref)
        conv = batch.column("conv_id").to_pylist()
        base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    doc_id = base + turn
    # doc_len == len(tokenize(text)): count of non-overlapping token-regex
    # matches on the lowercased text — identical to the shared tokenizer.
    # Null text tokenizes to [] everywhere else (posting emission, oracle);
    # coalesce the propagated null count to 0 so the docmap agrees.
    from ..tokenizer import resolve_tokenizer

    doc_len = resolve_tokenizer(tokenizer).arrow_token_count(batch.column("text"))
    return pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "doc_id": pa.array(doc_id, type=pa.int64()),
            "doc_len": doc_len.cast(pa.int32()),
        }
    )


class DocMapper:
    """Callable-class form of ``docmap_batch`` (actor-pool API)."""

    def __init__(self, offsets_ref, tokenizer="alnum-lower-v1"):
        self.offsets_ref = offsets_ref
        self.tokenizer = tokenizer

    def __call__(self, batch: pa.Table) -> pa.Table:
        return docmap_batch(batch, self.offsets_ref, self.tokenizer)


def docmap_dataset(ds: "ray.data.Dataset", offsets_ref) -> "ray.data.Dataset":
    from functools import partial

    return ds.map_batches(
        partial(docmap_batch, offsets_ref=offsets_ref),
        batch_format="pyarrow",
        batch_size=8192,
    )
