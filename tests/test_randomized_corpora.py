"""Randomized-corpus engine-vs-golden equivalence: beyond the one fixed
conformance corpus, a family of seeded adversarial corpus shapes (single
conversation, heavy duplication, empty/punctuation-only turns, one-token
turns, unicode text) must all be rank-identical to the single-process
golden oracle — through every scorer path."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _random_corpus(seed: int, shape: str) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    vocab = [f"w{i}" for i in range(30)] + ["the", "of", "and"]
    if shape == "single_conv":
        convs = 1
        n_turns = lambda: int(rng.integers(30, 60))
    elif shape == "many_tiny":
        convs = 40
        n_turns = lambda: int(rng.integers(2, 4))
    else:
        convs = 12
        n_turns = lambda: int(rng.integers(2, 15))

    def text_for(c, t):
        if shape == "degenerate" and rng.random() < 0.2:
            return rng.choice(["", "?!...", "   ", "a"])
        if shape == "duplicated" and rng.random() < 0.5:
            return "same exact duplicated text everywhere"
        if shape == "unicode" and rng.random() < 0.3:
            return "héllo wörld ünïcode " + " ".join(
                rng.choice(vocab, rng.integers(1, 5)).tolist()
            )
        return " ".join(rng.choice(vocab, rng.integers(1, 25)).tolist())

    for c in range(convs):
        for t in range(n_turns()):
            rows["conv_id"].append(f"c{c:04d}")
            rows["turn_idx"].append(t)
            rows["text"].append(text_for(c, t))
    table = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "text": pa.array(rows["text"], type=pa.string()),
        }
    )
    return table.take(pa.array(rng.permutation(table.num_rows)))


@pytest.mark.parametrize(
    "seed,shape",
    [(11, "single_conv"), (12, "many_tiny"), (13, "degenerate"),
     (14, "duplicated"), (15, "unicode"), (16, "mixed")],
)
def test_random_corpus_rank_identical_to_oracle(ray_session, tmp_path, seed, shape):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.oracle.bm25 import build_oracle_index, topk
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine

    table = _random_corpus(seed, shape)
    src = str(tmp_path / "t.parquet")
    pq.write_table(table, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(num_partitions=4))
    oracle = build_oracle_index(table)

    rng = np.random.default_rng(seed + 100)
    vocab = [f"w{i}" for i in range(30)] + ["the", "of", "and", "zzabsent", "héllo"]
    queries = [" ".join(rng.choice(vocab, rng.integers(1, 4)).tolist()) for _ in range(12)]
    queries += ["", "?!", "THE of", "same exact duplicated text"]

    eng = SearchEngine(idx, num_shards=2, num_scorers=3)
    try:
        for q in queries:
            want = topk(oracle, q, k=10)
            for wand in (False, True):
                got = eng.search(q, k=10, use_wand=wand)
                assert [h["doc_id"] for h in got] == [d for _, d, _ in want], (q, wand)
                for h, (_, _, s) in zip(got, want):
                    assert abs(h["score"] - s) <= 1e-9 * max(1.0, abs(s)), (q, wand)
    finally:
        eng.shutdown()


@pytest.mark.parametrize(
    "seed,shape",
    [(21, "single_conv"), (22, "many_tiny"), (23, "degenerate"), (24, "mixed")],
)
def test_random_corpus_tree_rollup_paths_agree(ray_session, tmp_path, seed, shape):
    """Round-4 tree rollup over the adversarial corpus family: driver and
    scorer-pool paths bit-identical, nesting invariants hold, and the
    conv-level ranking equals the conv-granularity search (the tree's top
    level IS the conv rollup)."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine

    table = _random_corpus(seed, shape)
    src = str(tmp_path / "t.parquet")
    pq.write_table(table, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(num_partitions=4))

    rng = np.random.default_rng(seed + 200)
    vocab = [f"w{i}" for i in range(30)] + ["the", "of", "and", "zzabsent"]
    queries = [
        (i, " ".join(rng.choice(vocab, rng.integers(1, 4)).tolist()))
        for i in range(10)
    ]
    e_drv = SearchEngine(idx, num_shards=2, num_scorers=0)
    e_dist = SearchEngine(idx, num_shards=2, num_scorers=3)
    try:
        for spans in [(16, 4), (8, 2)]:
            a = e_drv.search_tree_batch(queries, k=5, spans=spans)
            b = e_dist.search_tree_batch(queries, k=5, spans=spans)
            assert a.equals(b), (seed, shape, spans)
        t = a.to_pandas()
        if len(t):
            assert ((t["turn_idx"] >= t["l2_start"]) & (t["turn_idx"] < t["l2_start"] + 2)).all()
            assert ((t["l2_start"] >= t["l1_start"]) & (t["l2_start"] < t["l1_start"] + 8)).all()
        # top level == conv-granularity rollup (same ranking + scores)
        conv = e_drv.search_terms_batch(
            [(qid, sorted(set(e_drv.tokenize(q)))) for qid, q in queries],
            k=5, granularity="conv",
        ).to_pandas()
        tree = a.to_pandas()
        assert list(tree["conv_id"]) == list(conv["conv_id"])
        assert np.allclose(tree["conv_score"], conv["score"], rtol=1e-12)
    finally:
        e_drv.shutdown()
        e_dist.shutdown()
