"""Input-contract validation (SURVEY.md §2 M8 — the analogue of
validate_and_truncate_physical_indices bounds guarding)."""

import numpy as np
import pyarrow as pa
import pytest


def test_non_dense_turn_idx_rejected(ray_session):
    import ray.data

    from pageindex_ray.stages.docmap import compute_conv_offsets

    table = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b"], type=pa.string()),
            "turn_idx": pa.array([0, 2, 0, 1], type=pa.int32()),  # gap in conv a
            "text": pa.array(["x", "y", "z", "w"], type=pa.string()),
        }
    )
    with pytest.raises(ValueError, match="dense turn_idx"):
        compute_conv_offsets(ray.data.from_arrow(table))


def test_negative_turn_idx_rejected(ray_session):
    import ray.data

    from pageindex_ray.stages.docmap import compute_conv_offsets

    table = pa.table(
        {
            "conv_id": pa.array(["a", "a"], type=pa.string()),
            "turn_idx": pa.array([-1, 0], type=pa.int32()),
            "text": pa.array(["x", "y"], type=pa.string()),
        }
    )
    with pytest.raises(ValueError, match="dense turn_idx"):
        compute_conv_offsets(ray.data.from_arrow(table))


def test_config_rejects_unknown_keys():
    from pageindex_ray.config import DEFAULT

    with pytest.raises(ValueError, match="unknown config keys"):
        DEFAULT.with_overrides(nonsense=1)
    assert DEFAULT.with_overrides(k1=1.2).k1 == 1.2


def test_empty_partition_handling(ray_session, tmp_path):
    """A build whose partition count exceeds the term count leaves some
    partitions empty; query engine must treat them as absent, not missing."""
    import pyarrow.parquet as pq
    import ray.data

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine

    table = pa.table(
        {
            "conv_id": pa.array(["c"] * 3, type=pa.string()),
            "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
            "text": pa.array(["alpha beta", "beta gamma", "alpha"], type=pa.string()),
        }
    )
    src = str(tmp_path / "t.parquet")
    pq.write_table(table, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(num_partitions=32))
    eng = SearchEngine(idx, num_shards=4)
    hits = eng.search("alpha", k=10)
    assert [h["doc_id"] for h in hits] == [2, 0]  # doc 2 shorter -> higher score
    assert eng.search("delta", k=10) == []
    eng.shutdown()
