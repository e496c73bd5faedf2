"""Attribute sidecar: filtered retrieval + facet counts vs brute force."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.oracle.bm25 import score_all
from pageindex_ray.tokenizer import tokenize


@pytest.fixture(scope="module")
def attrs_built(ray_session, built_index):
    from pageindex_ray.pipelines.attrs import build_attrs

    info = build_attrs(
        built_index["index_dir"], built_index["transcripts"], columns=("role", "tool")
    )
    return info


@pytest.fixture(scope="module")
def engine(ray_session, built_index, attrs_built):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=2)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def doc_attrs(built_index):
    """role/tool per doc_id, under the same (conv, turn) dense-rank order
    the docmap contract guarantees; nulls coalesced to "" like the sidecar."""
    src = pq.read_table(built_index["transcripts"])
    conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
    turn = src.column("turn_idx").to_numpy().astype(np.int64)
    order = np.lexsort((turn, conv))
    role = np.asarray(src.column("role").to_pylist(), dtype=object)[order]
    tool = np.asarray(
        [x if x is not None else "" for x in src.column("tool").to_pylist()],
        dtype=object,
    )[order]
    return role, tool


def _queries(built_index):
    qt = pq.read_table(built_index["queries"])
    return list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))


def _golden_filtered(oracle_index, qtext, keep_mask_of_docs, k=10):
    docs, scores = score_all(oracle_index, qtext)
    if not len(docs):
        return []
    keep = keep_mask_of_docs(docs)
    docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def test_build_attrs_is_resumable(ray_session, built_index, attrs_built):
    from pageindex_ray.pipelines.attrs import build_attrs

    assert attrs_built["resumed"] is False
    again = build_attrs(
        built_index["index_dir"], built_index["transcripts"], columns=("role",)
    )
    assert again["resumed"] is True
    assert sorted(again["columns"]) == ["role", "tool"]


def test_filtered_search_matches_brute_force(engine, built_index, oracle_index, doc_attrs):
    role, _ = doc_attrs
    changed = 0
    for qid, qtext in _queries(built_index):
        got = engine.search(qtext, k=10, where={"role": "user"})
        golden = _golden_filtered(oracle_index, qtext, lambda d: role[d] == "user")
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, qtext)
        for r, (_, sc) in zip(got, golden):
            assert r["score"] == pytest.approx(sc, rel=1e-9)
        plain = [r["doc_id"] for r in engine.search(qtext, k=10)]
        changed += plain != [r["doc_id"] for r in got]
    assert changed >= 10  # the filter must demonstrably bite on this corpus


def test_filtered_search_in_list_and_multi_col(engine, built_index, oracle_index, doc_attrs):
    role, tool = doc_attrs
    for qid, qtext in _queries(built_index)[:10]:
        got = engine.search(qtext, k=10, where={"role": ["user", "tool"]})
        golden = _golden_filtered(
            oracle_index, qtext, lambda d: (role[d] == "user") | (role[d] == "tool")
        )
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, "in-list")
    # AND across columns, including the null-coalesced "" value of tool
    hits = 0
    for qid, qtext in _queries(built_index)[:20]:
        got = engine.search(qtext, k=10, where={"role": "assistant", "tool": ""})
        golden = _golden_filtered(
            oracle_index, qtext, lambda d: (role[d] == "assistant") & (tool[d] == "")
        )
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, "and")
        hits += bool(golden)
    assert hits >= 5


def test_filtered_rollups_match_brute_force(engine, built_index, oracle_index, doc_attrs):
    role, _ = doc_attrs
    oi = oracle_index
    for qid, qtext in _queries(built_index)[:15]:
        docs, scores = score_all(oi, qtext)
        keep = role[docs] == "user" if len(docs) else np.zeros(0, bool)
        docs, scores = docs[keep], scores[keep]
        # conv rollup (sum): docs ascending -> in-order accumulation per conv
        sums: dict[str, float] = {}
        for d, s in zip(docs, scores):
            c = oi.conv_ids[oi.doc_conv[d]]
            sums[c] = sums.get(c, 0.0) + s
        golden = sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = engine.search(qtext, k=10, granularity="conv", where={"role": "user"})
        assert [r["conv_id"] for r in got] == [c for c, _ in golden], qid
        for r, (_, sc) in zip(got, golden):
            assert r["score"] == pytest.approx(sc, rel=1e-9)


def test_filtered_distributed_matches_driver(ray_session, built_index, attrs_built):
    from pageindex_ray.pipelines.search import SearchEngine

    e1 = SearchEngine(built_index["index_dir"], num_shards=2)
    e2 = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        assert e2.scorers and not e1.scorers
        qs = _queries(built_index)
        for qid, qtext in qs[:15]:
            for where in ({"role": "user"}, {"role": ["assistant", "tool"]}):
                for gran in ("turn", "conv", "segment"):
                    r1 = e1.search(qtext, k=10, granularity=gran, where=where)
                    r2 = e2.search(qtext, k=10, granularity=gran, where=where)
                    assert r1 == r2, (qid, where, gran)
        b1 = e1.search_batch(qs, k=10, where={"role": "user"})
        b2 = e2.search_batch(qs, k=10, where={"role": "user"})
        assert b1.equals(b2)
        f1 = e1.facet_counts_batch(qs, "role")
        f2 = e2.facet_counts_batch(qs, "role")
        assert f1.equals(f2)
    finally:
        e1.shutdown()
        e2.shutdown()


def test_facet_counts_match_brute_force(engine, built_index, doc_attrs):
    role, _ = doc_attrs
    postings_cache = {}
    for qid, qtext in _queries(built_index)[:20]:
        got = {r["value"]: r["n_docs"] for r in engine.facet_counts(qtext, "role")}
        terms = sorted(set(tokenize(qtext)))
        matched = engine.term_doc_ids(terms)
        if not matched:
            assert got == {}
            continue
        docs = np.unique(np.concatenate(list(matched.values())))
        want = {}
        for v in np.unique(role[docs]):
            want[str(v)] = int((role[docs] == v).sum())
        assert got == want, (qid, qtext)


def test_where_error_paths(ray_session, built_index, tmp_path, engine):
    from pageindex_ray.pipelines.search import SearchEngine

    # unknown column
    with pytest.raises(KeyError):
        engine.search("the", where={"nope": "x"})
    # where + WAND is fenced, not silently exhausted
    with pytest.raises(ValueError, match="use_wand"):
        engine.search("the", use_wand=True, where={"role": "user"})
    # no sidecar: loud error, not an ignored filter
    bare = str(tmp_path / "bare_idx")
    shutil.copytree(built_index["index_dir"], bare)
    shutil.rmtree(os.path.join(bare, "attrs"))
    e = SearchEngine(bare, num_shards=2)
    try:
        with pytest.raises(ValueError, match="sidecar"):
            e.search("the", where={"role": "user"})
        with pytest.raises(ValueError, match="sidecar"):
            e.facet_counts("the", "role")
    finally:
        e.shutdown()
    # stale sidecar (foreign fingerprint) is refused at engine init
    stale = str(tmp_path / "stale_idx")
    shutil.copytree(built_index["index_dir"], stale)
    mpath = os.path.join(stale, "attrs", "meta.json")
    with open(mpath) as f:
        m = json.load(f)
    m["fingerprint"] = "0" * 32
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="fingerprint"):
        SearchEngine(stale, num_shards=2)


def test_filter_selecting_nothing_returns_empty(engine):
    assert engine.search("the", where={"tool": "no-such-tool"}) == []


def _golden_boosted(oracle_index, qtext, role_of_docs, weights, k=10):
    docs, scores = score_all(oracle_index, qtext)
    if not len(docs):
        return []
    w = np.asarray([weights.get(r, 1.0) for r in role_of_docs(docs)], dtype=np.float64)
    scores = scores * w
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def test_boosted_search_matches_brute_force(engine, built_index, oracle_index, doc_attrs):
    role, _ = doc_attrs
    weights = {"assistant": 2.0, "tool": 0.5}
    checked = 0
    for qid, qtext in _queries(built_index)[:15]:
        got = [
            (r["doc_id"], r["score"])
            for r in engine.search(qtext, k=10, boost={"role": weights})
        ]
        want = _golden_boosted(oracle_index, qtext, lambda d: role[d], weights, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], qid
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=0
        )
        checked += 1
        # the boost must actually change at least some rankings vs unboosted
    plain = [r["doc_id"] for r in engine.search("the system", k=10)]
    boosted = [r["doc_id"] for r in engine.search("the system", k=10, boost={"role": weights})]
    assert checked == 15 and plain != boosted


def test_boosted_distributed_matches_driver(ray_session, built_index, attrs_built):
    from pageindex_ray.pipelines.search import SearchEngine

    e2 = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    assert e2.scorers
    e1 = SearchEngine(built_index["index_dir"], num_shards=2)
    try:
        weights = {"role": {"assistant": 2.0, "tool": 0.5}}
        for _, qtext in _queries(built_index)[:8]:
            a = e1.search(qtext, k=10, boost=weights)
            b = e2.search(qtext, k=10, boost=weights)
            assert [(r["doc_id"], r["score"]) for r in a] == [
                (r["doc_id"], r["score"]) for r in b
            ], qtext
        # boost composes with where= and with search_after
        qtext = "the system tool"
        aw = e1.search(qtext, k=5, boost=weights, where={"role": ["user", "assistant"]})
        bw = e2.search(qtext, k=5, boost=weights, where={"role": ["user", "assistant"]})
        assert [(r["doc_id"], r["score"]) for r in aw] == [(r["doc_id"], r["score"]) for r in bw]
        p1 = e1.search(qtext, k=5, boost=weights)
        cur = (p1[-1]["score"], p1[-1]["doc_id"])
        ap = e1.search(qtext, k=5, boost=weights, search_after=cur)
        bp = e2.search(qtext, k=5, boost=weights, search_after=cur)
        assert [(r["doc_id"], r["score"]) for r in ap] == [(r["doc_id"], r["score"]) for r in bp]
        assert not (set(r["doc_id"] for r in p1) & set(r["doc_id"] for r in ap))
    finally:
        e1.shutdown()
        e2.shutdown()


def test_boost_error_paths(engine):
    with pytest.raises(KeyError):
        engine.search("the", boost={"nope": {"x": 2.0}})
    with pytest.raises(ValueError):
        engine.search("the", boost={"role": 2.0})
    with pytest.raises(ValueError):
        engine.search("the", boost={"role": {"user": 2.0}}, use_wand=True)
    with pytest.raises(ValueError):
        engine.search("the", boost={"role": {"user": 2.0}}, granularity="conv")
