"""Bigram PMI collocations: counts, boundary rules, and PMI algebra."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, texts):
    rows = {
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": pa.array([None] * len(texts), type=pa.string()),
        "ts": pa.array(list(range(len(texts))), type=pa.timestamp("us")),
    }
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), p)
    return p


def test_bigrams_never_cross_rows_and_pmi_is_exact(ray_session, tmp_path):
    from pageindex_ray.pipelines.collocations import bigram_pmi

    # "x y" co-occurs 5 times; "y x" would only exist across row boundaries
    texts = ["x y"] * 5 + ["filler words here"] * 3
    out = bigram_pmi(_write(tmp_path, texts), min_count=5, k=10).to_pylist()
    pairs = {(r["w1"], r["w2"]): r for r in out}
    assert ("x", "y") in pairs and ("y", "x") not in pairs
    r = pairs[("x", "y")]
    # N1 = 19 tokens, N2 = 11 bigrams, c=5, cx=cy=5
    n1, n2, c = 19.0, 11.0, 5.0
    want = np.log((c / n2) / ((5.0 / n1) * (5.0 / n1)))
    assert r["n"] == 5
    np.testing.assert_allclose(r["pmi"], want, rtol=0, atol=1e-12)


def test_min_count_floor(ray_session, tmp_path):
    from pageindex_ray.pipelines.collocations import bigram_pmi

    texts = ["a b"] * 4 + ["c d"] * 5
    out = bigram_pmi(_write(tmp_path, texts), min_count=5, k=10).to_pylist()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("c", "d") in pairs and ("a", "b") not in pairs


def test_empty_corpus_and_no_survivors(ray_session, tmp_path):
    from pageindex_ray.pipelines.collocations import bigram_pmi

    out = bigram_pmi(_write(tmp_path, ["solo", "word", "rows"]), min_count=5, k=10)
    assert out.num_rows == 0
    out2 = bigram_pmi(_write(tmp_path, ["", "...", ""]), min_count=1, k=10)
    assert out2.num_rows == 0


def test_batch_split_invariance(ray_session, tmp_path):
    """Counts must not depend on how rows split into batches: compare a
    1-row-batch run against the default batching."""
    from pageindex_ray.pipelines.collocations import _count_batch, bigram_pmi

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 9)))
        for _ in range(120)
    ]
    p = _write(tmp_path, texts)
    a = bigram_pmi(p, min_count=2, k=100).to_pylist()
    # golden: single-batch count over the whole corpus
    t = pa.table({"text": texts})
    whole = _count_batch(t, "alnum-lower-v1")
    import collections

    agg = collections.Counter()
    for k_, w1, w2, n in zip(*[whole.column(c).to_pylist() for c in ["kind", "w1", "w2", "n"]]):
        agg[(k_, w1, w2)] += n
    uni = {w1: c for (k_, w1, _), c in agg.items() if k_ == "u"}
    n1 = float(sum(uni.values()))
    n2 = float(sum(c for (k_, _, _), c in agg.items() if k_ == "t"))
    want = []
    for (k_, w1, w2), c in agg.items():
        if k_ == "b" and c >= 2:
            want.append(
                (w1, w2, c, float(np.log((c / n2) / ((uni[w1] / n1) * (uni[w2] / n1)))))
            )
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    got = [(r["w1"], r["w2"], r["n"], r["pmi"]) for r in a]
    assert [g[:3] for g in got] == [w[:3] for w in want[:100]]
    np.testing.assert_allclose(
        [g[3] for g in got], [w[3] for w in want[:100]], rtol=0, atol=1e-12
    )
