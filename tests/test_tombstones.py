"""Tombstone deletes: query-time masking with Lucene stats semantics."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.oracle.bm25 import score_all


@pytest.fixture(scope="module")
def tomb_index(ray_session, built_index, tmp_path_factory):
    """A COPY of the shared index with every doc_id % 5 == 0 deleted."""
    from pageindex_ray.pipelines.build import load_meta
    from pageindex_ray.pipelines.tombstones import add_tombstones

    d = str(tmp_path_factory.mktemp("tomb") / "idx")
    shutil.copytree(built_index["index_dir"], d)
    for sub in ("attrs", "stored"):  # keep the copy minimal
        p = os.path.join(d, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    n = load_meta(d)["n_docs"]
    info = add_tombstones(d, np.arange(0, n, 5))
    assert info["n_tombstones"] == len(np.arange(0, n, 5))
    return {"index_dir": d, "n_docs": n}


def _queries(built_index):
    qt = pq.read_table(built_index["queries"])
    return list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))


def _golden(oracle_index, qtext, k=10):
    docs, scores = score_all(oracle_index, qtext)
    if not len(docs):
        return []
    keep = docs % 5 != 0
    docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def test_tombstoned_search_matches_brute_force(ray_session, tomb_index, built_index, oracle_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(tomb_index["index_dir"], num_shards=2)
    try:
        changed = 0
        for qid, qtext in _queries(built_index):
            got = eng.search(qtext, k=10)
            golden = _golden(oracle_index, qtext)
            assert [r["doc_id"] for r in got] == [d for d, _ in golden], qid
            # Lucene semantics: surviving docs' scores unchanged (global stats)
            for r, (_, sc) in zip(got, golden):
                assert r["score"] == pytest.approx(sc, rel=1e-9)
            assert all(r["doc_id"] % 5 != 0 for r in got)
            changed += bool(got)
        assert changed >= 30
        # WAND request on a tombstoned index: result-identical exhaustive fallback
        for qid, qtext in _queries(built_index)[:5]:
            assert eng.search(qtext, k=10, use_wand=True) == eng.search(qtext, k=10)
    finally:
        eng.shutdown()


def test_tombstoned_distributed_and_boolean(ray_session, tomb_index, built_index):
    from pageindex_ray.pipelines.boolean import classify_tokens
    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.tokenizer import tokenize

    e1 = SearchEngine(tomb_index["index_dir"], num_shards=2)
    e2 = SearchEngine(tomb_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        assert e2.scorers and not e1.scorers
        qs = _queries(built_index)
        for qid, qtext in qs[:10]:
            for gran in ("turn", "conv", "segment"):
                assert e1.search(qtext, k=10, granularity=gran) == e2.search(
                    qtext, k=10, granularity=gran
                ), (qid, gran)
            must, should, must_not = classify_tokens(tokenize(qtext))
            b1 = e1.boolean_search(must=must, should=should, must_not=must_not, k=10)
            b2 = e2.boolean_search(must=must, should=should, must_not=must_not, k=10)
            assert b1 == b2 and all(r["doc_id"] % 5 != 0 for r in b1), qid
        assert e1.search_batch(qs, k=10).equals(e2.search_batch(qs, k=10))
    finally:
        e1.shutdown()
        e2.shutdown()


def test_tombstone_bookkeeping(ray_session, built_index, tmp_path):
    from pageindex_ray.pipelines.tombstones import (
        add_tombstones,
        clear_tombstones,
        load_tombstones,
    )

    d = str(tmp_path / "idx")
    shutil.copytree(built_index["index_dir"], d)
    r1 = add_tombstones(d, [3, 1, 3, 7])
    assert r1 == {"n_tombstones": 3, "added": 3}
    r2 = add_tombstones(d, [7, 9])  # union, idempotent
    assert r2 == {"n_tombstones": 4, "added": 1}
    assert load_tombstones(d).tolist() == [1, 3, 7, 9]
    with pytest.raises(ValueError, match="outside the index range"):
        add_tombstones(d, [10**9])
    # foreign-fingerprint sidecar refused at engine init
    mpath = os.path.join(d, "tombstones_meta.json")
    with open(mpath) as f:
        m = json.load(f)
    m["fingerprint"] = "0" * 32
    with open(mpath, "w") as f:
        json.dump(m, f)
    from pageindex_ray.pipelines.search import SearchEngine

    with pytest.raises(ValueError, match="fingerprint"):
        SearchEngine(d, num_shards=2)
    clear_tombstones(d)
    assert len(load_tombstones(d)) == 0
    eng = SearchEngine(d, num_shards=2)  # clean again
    eng.shutdown()
