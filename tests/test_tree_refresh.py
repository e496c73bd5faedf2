"""Round-4 surfaces: configurable multi-level tree rollup (state/rollup.py +
SearchEngine.search_tree), the incremental-refresh flow, and the real-model
enrichment artifact (functions/bpe.py BpeRaritySummaryModel)."""

import os

import numpy as np
import pytest


# ------------------------------------------------------------- tree rollup

def test_validate_spans_rejects_non_nesting():
    from pageindex_ray.state.rollup import validate_spans

    assert validate_spans((16, 4)) == (16, 4)
    assert validate_spans([8]) == (8,)
    for bad in [(), (0,), (-4,), (4, 3), (4, 8), (16, 16), (16, 8, 3)]:
        with pytest.raises(ValueError):
            validate_spans(bad)


def test_tree_rollup_hand_case():
    """Two conversations, hand-checkable drill-down. conv A (base 0, turns
    0..7) scores: turn1=1.0, turn5=2.0, turn6=0.5; conv B (base 8, turns
    0..3) scores: turn0=3.0. spans=(4,2):
      A: conv=3.5; best 4-seg = [4,8) (2.5) over [0,4) (1.0); best 2-seg
         inside = [4,6) (2.0) over [6,8) (0.5); best turn = 5.
      B: conv=3.0; segments [0,4) -> [0,2) -> turn 0.
    Top-2 by conv score: A (3.5) then B (3.0)."""
    from pageindex_ray.state.rollup import tree_rollup

    bases = np.array([0, 8], dtype=np.int64)
    names = np.array(["convA", "convB"], dtype=object)
    docs = np.array([1, 5, 6, 8], dtype=np.int64)
    scores = np.array([1.0, 2.0, 0.5, 3.0])
    out = tree_rollup(docs, scores, bases, lambda idx: names[idx], (4, 2), k=2)
    assert list(out["conv_id"]) == ["convA", "convB"]
    assert out["conv_score"].tolist() == [3.5, 3.0]
    assert out["l1_start"].tolist() == [4, 0]
    assert out["l1_score"].tolist() == [2.5, 3.0]
    assert out["l2_start"].tolist() == [4, 0]
    assert out["l2_score"].tolist() == [2.0, 3.0]
    assert out["turn_idx"].tolist() == [5, 0]
    assert out["turn_score"].tolist() == [2.0, 3.0]


def test_tree_rollup_tie_breaks_prefer_smallest_key():
    """Equal conv scores break conv_id asc; equal segment scores break
    seg_start asc; equal turn scores break turn_idx asc."""
    from pageindex_ray.state.rollup import tree_rollup

    bases = np.array([0, 8], dtype=np.int64)
    names = np.array(["z_conv", "a_conv"], dtype=object)
    # both convs score 1.0; within z_conv both 2-segments score 0.5 each
    docs = np.array([0, 2, 8], dtype=np.int64)
    scores = np.array([0.5, 0.5, 1.0])
    out = tree_rollup(docs, scores, bases, lambda idx: names[idx], (4, 2), k=2)
    assert list(out["conv_id"]) == ["a_conv", "z_conv"]  # tie -> conv_id asc
    # z_conv row: l1 covers [0,4) (only seg), l2 tie 0.5 at starts 0 and 2 -> 0
    zrow = list(out["conv_id"]).index("z_conv")
    assert out["l2_start"][zrow] == 0
    assert out["turn_idx"][zrow] == 0


def test_search_tree_driver_matches_distributed(ray_session, built_index):
    """The scorer-pool tree path must be bit-identical to the driver path
    (conv-aligned ranges -> complete per-range conv rows)."""
    from pageindex_ray.pipelines.search import SearchEngine

    e_drv = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=0)
    e_dist = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        import pyarrow.parquet as pq

        qs = pq.read_table(built_index["queries"])
        queries = list(
            zip(qs.column("query_id").to_pylist(), qs.column("text").to_pylist())
        )
        for spans in [(16, 4), (8,), (16, 8, 2)]:
            for agg in ("sum", "max"):
                a = e_drv.search_tree_batch(queries, k=5, spans=spans, agg=agg)
                b = e_dist.search_tree_batch(queries, k=5, spans=spans, agg=agg)
                assert a.equals(b), (spans, agg)
        assert a.num_rows > 0
        # level scores nest: conv_score >= l1_score >= l2_score >= turn_score
        # under sum aggregation (children aggregate subsets of the parent)
        t = e_drv.search_tree_batch(queries, k=5, spans=(16, 4)).to_pandas()
        assert (t["conv_score"] >= t["l1_score"] - 1e-12).all()
        assert (t["l1_score"] >= t["l2_score"] - 1e-12).all()
        assert (t["l2_score"] >= t["turn_score"] - 1e-12).all()
        # the drilled turn lies inside the innermost segment
        assert ((t["turn_idx"] >= t["l2_start"]) & (t["turn_idx"] < t["l2_start"] + 4)).all()
        assert ((t["l2_start"] >= t["l1_start"]) & (t["l2_start"] < t["l1_start"] + 16)).all()
    finally:
        e_drv.shutdown()
        e_dist.shutdown()


def test_search_tree_rejects_bad_spans(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    e = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=0)
    try:
        with pytest.raises(ValueError):
            e.search_tree("anything", spans=(4, 3))
    finally:
        e.shutdown()


# ----------------------------------------------------- incremental refresh

def test_append_tombstone_compact_matches_monolithic(ray_session, tiny_corpus, tmp_path):
    """Wave A + append_wave(B) + tombstones + compact must answer queries
    exactly like ONE monolithic build over the surviving corpus with
    compacted statistics — the lifecycle equivalence the index_refresh gate
    checks at the driver."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.pipelines.compact import compact_index
    from pageindex_ray.pipelines.merge import append_wave
    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.pipelines.tombstones import add_tombstones

    t = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(t.column("conv_id").to_pylist()))
    cut = convs[len(convs) // 2]
    mask = pc.less(t.column("conv_id"), cut)
    wave_a, wave_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.filter(mask), wave_a)
    pq.write_table(t.filter(pc.invert(mask)), wave_b)
    cfg = BuildConfig(num_partitions=4)

    idx_a = str(tmp_path / "idxA")
    build_index(wave_a, idx_a, cfg)
    idx_ab = str(tmp_path / "idxAB")
    append_wave(idx_a, wave_b, idx_ab)
    n_docs = load_meta(idx_ab)["n_docs"]
    deleted = np.arange(0, n_docs, 7)
    add_tombstones(idx_ab, deleted)
    idx_r = str(tmp_path / "idxR")
    compact_index(idx_ab, idx_r)

    # monolithic rebuild of the SURVIVING corpus, compacted the same way
    # (sparse original doc ids preserved on both sides)
    idx_m = str(tmp_path / "idxM")
    build_index(tiny_corpus["transcripts"], idx_m, cfg)
    add_tombstones(idx_m, deleted)
    idx_mc = str(tmp_path / "idxMC")
    compact_index(idx_m, idx_mc)

    e_r = SearchEngine(idx_r, num_shards=2)
    e_m = SearchEngine(idx_mc, num_shards=2)
    try:
        qs = pq.read_table(tiny_corpus["queries"])
        queries = list(
            zip(qs.column("query_id").to_pylist(), qs.column("text").to_pylist())
        )
        a = e_r.search_batch(queries, k=10)
        b = e_m.search_batch(queries, k=10)
        assert a.equals(b)
        assert a.num_rows > 0
    finally:
        e_r.shutdown()
        e_m.shutdown()


# ------------------------------------------------------- real-model artifact

def test_bpe_rarity_model_output_depends_on_artifact():
    """The enrichment model's output must be a function of the LOADED merge
    table: the committed artifact ranks differently than a merge-free BPE
    (every piece falls back to character count), so at least one summary
    changes when the artifact changes."""
    from pageindex_ray.functions.bpe import BPE, PIECE_RE, BpeRaritySummaryModel

    model = BpeRaritySummaryModel()
    assert len(model.bpe.ranks) > 0  # artifact actually loaded from disk

    texts = [
        "the compression of the rare zyxwvu token",
        "hello world and again hello",
        "",
    ]
    out = model(texts)
    assert out[2] == ""
    # independent recomputation of the rule over the same artifact
    bpe = BPE()
    for t, s in zip(texts, out):
        distinct = sorted(set(PIECE_RE.findall(t)))
        want = " ".join(sorted(distinct, key=lambda p: (-bpe.n_tokens(p), p))[:3])
        assert s == want

    class NoMergeModel(BpeRaritySummaryModel):
        def __init__(self):
            self.bpe = BPE(merges=[])
            self.top_n = 3

    assert NoMergeModel()(texts) != out  # artifact-dependent, not rule-only


def test_search_tree_where_filters_before_rollup(ray_session, built_index):
    """where= on the tree rollup: every level aggregates only
    filter-surviving turns; driver and scorer-pool paths identical; the
    drilled winning turn is itself a filter-surviving doc."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.attrs import AttrStore, attrs_dir_of, build_attrs
    from pageindex_ray.pipelines.search import SearchEngine

    idx = built_index["index_dir"]
    build_attrs(idx, built_index["transcripts"], columns=("role",))
    e_drv = SearchEngine(idx, num_shards=2, num_scorers=0)
    e_dist = SearchEngine(idx, num_shards=2, num_scorers=3)
    try:
        qs = pq.read_table(built_index["queries"])
        queries = list(
            zip(qs.column("query_id").to_pylist(), qs.column("text").to_pylist())
        )
        a = e_drv.search_tree_batch(queries, k=5, spans=(16, 4), where={"role": "user"})
        b = e_dist.search_tree_batch(queries, k=5, spans=(16, 4), where={"role": "user"})
        assert a.equals(b)
        assert a.num_rows > 0

        # winning turns must be user turns: doc = conv_base + turn_idx
        off = pq.read_table(os.path.join(idx, "conv_offsets.parquet"))
        base_of = dict(
            zip(off.column("conv_id").to_pylist(), off.column("base").to_pylist())
        )
        user_ids = set(
            AttrStore(attrs_dir_of(idx)).ids_for("role", ("user",)).tolist()
        )
        for row in a.to_pylist():
            assert base_of[row["conv_id"]] + row["turn_idx"] in user_ids

        # filtered conv scores never exceed unfiltered (subset of positive
        # BM25 contributions)
        full = e_drv.search_tree_batch(queries, k=100, spans=(16, 4)).to_pylist()
        full_score = {(r["query_id"], r["conv_id"]): r["conv_score"] for r in full}
        for row in a.to_pylist():
            key = (row["query_id"], row["conv_id"])
            if key in full_score:
                assert row["conv_score"] <= full_score[key] + 1e-12
    finally:
        e_drv.shutdown()
        e_dist.shutdown()
