"""Build-path robustness: the size-adaptive conv-offsets merge and the
stratified (strided row-group) sampling behind hot-term salting.

Reference analogue: the reference derives page addressing from a single
sequential pass (/root/reference/pageindex/page_index.py:571-574) — here the
same contract must hold across merge strategies and input row orders.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _offsets_equal(a, b):
    assert list(a["conv_ids"]) == list(b["conv_ids"])
    np.testing.assert_array_equal(a["bases"], b["bases"])
    assert a["n_docs"] == b["n_docs"]
    if "total_tokens" in a or "total_tokens" in b:
        assert a["total_tokens"] == b["total_tokens"]


@pytest.mark.parametrize("with_tokens", [True, False])
def test_conv_offsets_distributed_matches_driver(ray_session, with_tokens):
    """Forcing the groupby("bucket") merge (driver_merge_max_rows=0) must
    reproduce the driver-merge result exactly — conv order, bases, totals."""
    import ray.data

    from pageindex_ray.sources.transcripts import synth_transcripts
    from pageindex_ray.stages.docmap import compute_conv_offsets

    table = synth_transcripts(1500)
    ds = ray.data.from_arrow(table).repartition(6)
    driver = compute_conv_offsets(ds, with_tokens=with_tokens)
    dist = compute_conv_offsets(ds, with_tokens=with_tokens, driver_merge_max_rows=0)
    _offsets_equal(driver, dist)


def _skewed_sorted_table(n_convs=120, seed=7):
    """Conv-SORTED corpus whose Zipf head is unevenly distributed: the first
    half of the file barely uses the hot terms; the second half is saturated
    with them. Head-of-file sampling sees a biased df for exactly the terms
    salting cares about."""
    rng = np.random.default_rng(seed)
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    hot = ["the", "of", "and", "to"]
    cold = [f"w{i:04d}" for i in range(400)]
    for c in range(n_convs):
        n_turns = int(rng.integers(3, 12))
        hot_rate = 0.02 if c < n_convs // 2 else 0.9
        for t in range(n_turns):
            toks = []
            for _ in range(int(rng.integers(5, 30))):
                if rng.random() < hot_rate:
                    toks.append(hot[int(rng.integers(0, len(hot)))])
                else:
                    toks.append(cold[int(rng.integers(0, len(cold)))])
            rows["conv_id"].append(f"conv-{c:05d}")
            rows["turn_idx"].append(t)
            rows["text"].append(" ".join(toks))
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "text": pa.array(rows["text"], type=pa.string()),
        }
    )


def test_stratified_hot_terms_and_bit_identical_postings(ray_session, tmp_path):
    """Building from the conv-sorted file and from a row-shuffled copy of the
    same data must (a) estimate the same hot-term set — the round-2
    head-of-file sampler was order-sensitive — and (b) produce bit-identical
    posting partitions (doc addressing comes from the data, not file order)."""
    import os

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, estimate_hot_terms

    table = _skewed_sorted_table()
    sorted_path = str(tmp_path / "sorted.parquet")
    pq.write_table(table, sorted_path, row_group_size=128)  # many row groups to stride
    rng = np.random.default_rng(0)
    shuffled = table.take(pa.array(rng.permutation(table.num_rows)))
    shuffled_path = str(tmp_path / "shuffled.parquet")
    pq.write_table(shuffled, shuffled_path, row_group_size=128)

    cfg = BuildConfig(num_partitions=8)
    hot_sorted = estimate_hot_terms(sorted_path, cfg, sample_rows=400)
    hot_shuffled = estimate_hot_terms(shuffled_path, cfg, sample_rows=400)
    assert hot_sorted == hot_shuffled
    # the globally-hot terms must be caught despite head-of-file scarcity
    assert {"the", "of", "and", "to"} <= set(hot_sorted)

    idx_a = str(tmp_path / "idx_sorted")
    idx_b = str(tmp_path / "idx_shuffled")
    build_index(sorted_path, idx_a, cfg)
    build_index(shuffled_path, idx_b, cfg)
    parts = sorted(f for f in os.listdir(os.path.join(idx_a, "postings")))
    assert parts == sorted(f for f in os.listdir(os.path.join(idx_b, "postings")))
    for f in parts:
        ta = pq.read_table(os.path.join(idx_a, "postings", f))
        tb = pq.read_table(os.path.join(idx_b, "postings", f))
        assert ta.equals(tb), f"partition {f} differs between sorted/shuffled builds"


def test_reduce_strategy_network_crossover(ray_session, tmp_path):
    """The auto chooser must report the nodes x intermediate vs shuffle
    network terms and flip to sort_groupby when direct's per-node fetch
    amplification dominates — a single box keeps direct, a wide cluster
    must not pull N full copies of the intermediate."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import (
        DIRECT_FETCH_CROSSOVER_FACTOR,
        resolve_reduce_strategy,
    )
    from pageindex_ray.sources.transcripts import synth_transcripts

    src = str(tmp_path / "t.parquet")
    pq.write_table(synth_transcripts(500), src)
    cfg = BuildConfig()  # reduce_strategy="auto"

    s1, rep1 = resolve_reduce_strategy(src, cfg, n_nodes=1)
    assert s1 == "direct"
    for key in ("n_nodes", "direct_fetch_bytes", "shuffle_bytes", "crossover_factor"):
        assert key in rep1
    assert rep1["direct_fetch_bytes"] == rep1["shuffle_bytes"] // 2

    wide = int(2 * DIRECT_FETCH_CROSSOVER_FACTOR) + 1  # first amplified width
    s2, rep2 = resolve_reduce_strategy(src, cfg, n_nodes=wide)
    assert s2 == "sort_groupby"
    assert rep2["switched_by"] == "fetch_amplification"
    # explicit strategy is never second-guessed
    s3, _ = resolve_reduce_strategy(src, cfg.with_overrides(reduce_strategy="direct"), n_nodes=wide)
    assert s3 == "direct"
