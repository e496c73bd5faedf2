"""Engine configuration.

Reference analogue: pageindex/config.yaml + ConfigLoader
(/root/reference/pageindex/utils.py:613-644) — YAML defaults merged with user
overrides, unknown keys rejected. Here a frozen dataclass plays that role;
``BuildConfig.with_overrides`` raises on unknown keys just like the
reference's ConfigLoader (utils.py:624-627).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class BuildConfig:
    # BM25 parameters (Okapi; idf = ln((N - df + 0.5)/(df + 0.5) + 1))
    k1: float = 1.5
    b: float = 0.75

    # Number of term-hash partitions for the posting shuffle. The analogue of
    # the reference's token-budget grouping (page_index.py:418-451): it bounds
    # the unit of parallel work. Scaled with CPU count by the caller.
    num_partitions: int = 32

    # Posting-block size (docs per compressed block, per-block max-score).
    block_size: int = 128

    # Terms whose df exceeds this fraction of N are salted across
    # ``salt_factor`` sub-partitions during the shuffle (Zipf hot terms).
    hot_df_ratio: float = 0.10
    salt_factor: int = 8

    # Tokenizer map_batches sizing: posting emission expands rows ~10-60x,
    # so the input batch is kept moderate (SURVEY.md §4.1 memory row) — but
    # not tiny: the per-(batch, partition) packing loop amortizes with batch
    # size (measured ~11% emit throughput from 4096 -> 16384 at P=512).
    tokenize_batch_size: int = 16384

    # Reduce-side transport for the posting shuffle.
    #   "auto":        (default) pick per build: the packed-intermediate size
    #                  is ESTIMATED by running the real emit kernel over the
    #                  hot-term sample and extrapolating bytes/turn; if the
    #                  estimate (x safety margin) fits the configured budget
    #                  (``packed_budget_bytes`` or ``object_store_fraction``
    #                  of the cluster object store), use "direct", else fall
    #                  back to "sort_groupby". The chosen strategy is
    #                  recorded in the build report.
    #   "direct":      materialize the PACKED emit output (the compressed
    #                  intermediate, ~bytes-of-index sized) and let each
    #                  partition's assemble task take its rows straight from
    #                  the object-store blocks — a manual hash shuffle with
    #                  few large zero-copy reads. Optimal while one build
    #                  wave's intermediate fits the cluster object store; at
    #                  10^12 turns builds run as resumable doc-range waves
    #                  (the lineage/resume layout), keeping each wave inside
    #                  this envelope.
    #   "sort_groupby": Ray Data's groupby(part).map_groups sort shuffle —
    #                  streaming, never materializes the intermediate; the
    #                  fallback when a single wave must exceed object-store
    #                  capacity. Identical logical postings either way
    #                  (test_sort_groupby_reduce_matches_direct).
    reduce_strategy: str = "auto"

    # Budget for the "auto" decision: absolute bytes, or (when None) this
    # fraction of the cluster's object-store capacity.
    packed_budget_bytes: int | None = None
    object_store_fraction: float = 0.5

    # Tokenizer spec name (pageindex_ray/tokenizer.py registry — the
    # reference's string-keyed backend choice, utils.py:417,427). Persisted
    # in meta.json; the query engine resolves the SAME spec at serving time.
    tokenizer: str = "alnum-lower-v1"

    # Query engine
    top_k: int = 10
    num_query_shards: int = 8

    def with_overrides(self, **kw) -> "BuildConfig":
        known = {f.name for f in dataclasses.fields(self)}
        unknown = set(kw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return dataclasses.replace(self, **kw)


DEFAULT = BuildConfig()
