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

TOKEN_PATTERN = "[a-z0-9]+"  # must stay in sync with tokenizer.TOKEN_RE


def compute_conv_offsets(ds: "ray.data.Dataset", with_tokens: bool = True) -> dict[str, np.ndarray]:
    """Per-conversation (count, min, max of turn_idx) -> validated dense-turn
    contract + exclusive prefix-sum base offsets.

    Returns {"conv_ids": sorted conv ids, "bases": int64 offsets, "n_docs": N}
    plus "total_tokens" when ``with_tokens`` (the build's direct-reduce path
    instead recovers total_tokens from the packed docmap runs, skipping a
    full tokenize pass here).

    Shape: per-batch combine (bounded partials, never ships `text` rows) ->
    RANGE-bucketed parallel merge (sample-sort: boundaries from a sampled
    block, so bucket outputs are globally ordered and the driver only
    concatenates and prefix-sums — no driver-side groupby or sort of the
    conversation set). At any scale the driver work is O(#convs) memory for
    the final offsets table, which is also what the broadcast to emitters
    requires; beyond that the offsets table itself would become a dataset
    and doc_id assignment a broadcast-join per conv range.
    """
    import pandas as pd

    N_BUCKETS = 32

    # --- boundaries from one sampled block (deterministic: first block) ----
    head = ds.select_columns(["conv_id"]).limit(65536).to_pandas()
    sample_ids = np.sort(head["conv_id"].to_numpy(dtype=object))
    if len(sample_ids):
        qpos = (np.arange(1, N_BUCKETS) * len(sample_ids)) // N_BUCKETS
        boundaries = sample_ids[qpos]
    else:
        boundaries = np.empty(0, dtype=object)

    agg_spec = {
        "n_turns": ("turn_idx", "size"),
        "min_turn": ("turn_idx", "min"),
        "max_turn": ("turn_idx", "max"),
    }
    if with_tokens:
        agg_spec["sum_tokens"] = ("n_tok", "sum")
    merge_spec = {k: (k, k2) for k, (_, k2) in zip(agg_spec, agg_spec.values())}
    merge_spec["n_turns"] = ("n_turns", "sum")

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
        }
        if with_tokens:
            cols["n_tok"] = pc.fill_null(
                pc.count_substring_regex(pc.utf8_lower(batch.column("text")), TOKEN_PATTERN), 0
            ).cast(pa.int64())
        df = pa.table(cols).to_pandas()
        g = df.groupby("conv_id", sort=False).agg(**agg_spec).reset_index()
        g["bucket"] = np.searchsorted(
            boundaries, g["conv_id"].to_numpy(dtype=object), side="right"
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    src_ds = ds if with_tokens else ds.select_columns(["conv_id", "turn_idx"])
    partials = src_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).materialize()
    refs = partials.to_arrow_refs()

    def merge_bucket(batch: pa.Table) -> pa.Table:
        tables = [ray.get(r) for r in refs]
        outs = []
        for b in batch.column("bucket").to_pylist():
            rows = [t.filter(pc.equal(t.column("bucket"), b)) for t in tables if t.num_rows]
            rows = [r for r in rows if r.num_rows]
            if not rows:
                continue
            df = pa.concat_tables(rows).to_pandas()
            g = df.groupby("conv_id", sort=False).agg(**merge_spec).reset_index()
            g = g.sort_values("conv_id", kind="stable")
            g["bucket"] = b
            outs.append(g)
        if not outs:
            return pa.table({c: [] for c in ["conv_id", *merge_spec, "bucket"]})
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    import ray.data as _rd

    merged = (
        _rd.from_items([{"bucket": b} for b in range(N_BUCKETS)])
        .map_batches(merge_bucket, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    del refs, partials
    # bucket outputs are internally sorted and bucket ranges are ordered ->
    # a bucket-ordered concat is globally conv_id-sorted
    agg = merged.sort_values("bucket", kind="stable").reset_index(drop=True)

    bad = agg[(agg["min_turn"] != 0) | (agg["max_turn"] != agg["n_turns"] - 1)]
    if len(bad):
        raise ValueError(
            f"{len(bad)} conversations violate the dense turn_idx contract "
            f"(first: {bad.iloc[0].to_dict()})"
        )
    n = agg["n_turns"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(n)[:-1]])
    out = {
        "conv_ids": agg["conv_id"].to_numpy(dtype=object),
        "bases": bases,
        "n_docs": int(n.sum()),
    }
    if with_tokens:
        out["total_tokens"] = int(agg["sum_tokens"].sum())
    return out


def docmap_batch(batch: pa.Table, offsets_ref) -> pa.Table:
    """Task-based map_batches stage: transcripts batch -> docmap batch.

    The conv->base lookup is a broadcast join: put once on the driver,
    fetched + built once per worker process (module-level cache in
    stages.postings — SURVEY.md §2.5 J1), reused by every task the worker
    runs. Tasks, not an actor pool: no spin-up ramp at stage head.
    """
    from .postings import cached_conv_bases

    base_by_conv = cached_conv_bases(offsets_ref)
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    doc_id = base + turn
    # doc_len == len(tokenize(text)): count of non-overlapping token-regex
    # matches on the lowercased text — identical to the shared tokenizer.
    # Null text tokenizes to [] everywhere else (posting emission, oracle);
    # coalesce the propagated null count to 0 so the docmap agrees.
    lower = pc.utf8_lower(batch.column("text"))
    doc_len = pc.fill_null(pc.count_substring_regex(lower, TOKEN_PATTERN), 0)
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

    def __init__(self, offsets_ref):
        self.offsets_ref = offsets_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return docmap_batch(batch, self.offsets_ref)


def docmap_dataset(ds: "ray.data.Dataset", offsets_ref) -> "ray.data.Dataset":
    from functools import partial

    return ds.map_batches(
        partial(docmap_batch, offsets_ref=offsets_ref),
        batch_format="pyarrow",
        batch_size=8192,
    )
