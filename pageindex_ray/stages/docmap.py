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


def compute_conv_offsets(ds: "ray.data.Dataset") -> dict[str, np.ndarray]:
    """One small shuffle: per-conversation (count, min, max of turn_idx) ->
    validated dense-turn contract + exclusive prefix-sum base offsets.

    Returns {"conv_ids": sorted conv ids, "bases": int64 offsets, "n_docs": N}.
    """
    import pandas as pd

    # Pre-aggregate per batch (combiner) and prune to the two key columns,
    # then merge the partials on the driver. The partial stream is bounded
    # by (#convs per batch) x (#batches) — a ~30x reduction versus shuffling
    # rows, and the driver merge is one C-speed hash groupby. (A Ray
    # groupby().aggregate() over the same partials measured ~17x slower:
    # sort-based shuffle on ~1e5 string keys is the wrong tool for a
    # combine-then-reduce this small.) At 10^10+ conversations the final
    # merge becomes a hash-partitioned tree reduce over conv_id ranges
    # instead of one driver step; the per-batch combine half is unchanged.
    def partial(batch: pa.Table) -> pa.Table:
        doc_len = pc.count_substring_regex(
            pc.utf8_lower(batch.column("text")), TOKEN_PATTERN
        ).cast(pa.int64())
        df = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "n_tok": doc_len,
            }
        ).to_pandas()
        g = (
            df.groupby("conv_id", sort=False)
            .agg(
                n_turns=("turn_idx", "size"),
                min_turn=("turn_idx", "min"),
                max_turn=("turn_idx", "max"),
                sum_tokens=("n_tok", "sum"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .to_pandas()
    )
    agg = (
        partials.groupby("conv_id", sort=False)
        .agg(
            n_turns=("n_turns", "sum"),
            min_turn=("min_turn", "min"),
            max_turn=("max_turn", "max"),
            sum_tokens=("sum_tokens", "sum"),
        )
        .reset_index()
    )
    agg = agg.sort_values("conv_id").reset_index(drop=True)
    bad = agg[(agg["min_turn"] != 0) | (agg["max_turn"] != agg["n_turns"] - 1)]
    if len(bad):
        raise ValueError(
            f"{len(bad)} conversations violate the dense turn_idx contract "
            f"(first: {bad.iloc[0].to_dict()})"
        )
    n = agg["n_turns"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(n)[:-1]])
    return {
        "conv_ids": agg["conv_id"].to_numpy(dtype=object),
        "bases": bases,
        "n_docs": int(n.sum()),
        "total_tokens": int(agg["sum_tokens"].sum()),
    }


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
    lower = pc.utf8_lower(batch.column("text"))
    doc_len = pc.count_substring_regex(lower, TOKEN_PATTERN)
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
