"""Stored-fields store + keyword-in-context snippets."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.tokenizer import tokenize


@pytest.fixture(scope="module")
def stored_built(ray_session, built_index):
    from pageindex_ray.pipelines.stored import build_stored_fields

    return build_stored_fields(
        built_index["index_dir"], built_index["transcripts"], columns=("text", "role")
    )


@pytest.fixture(scope="module")
def engine(ray_session, built_index, stored_built):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=2)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def doc_rows(built_index):
    """(text, role) per doc_id under the docmap's dense-rank order."""
    src = pq.read_table(built_index["transcripts"])
    conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
    turn = src.column("turn_idx").to_numpy().astype(np.int64)
    order = np.lexsort((turn, conv))
    text = np.asarray(src.column("text").to_pylist(), dtype=object)[order]
    role = np.asarray(src.column("role").to_pylist(), dtype=object)[order]
    return text, role


def test_doc_store_point_lookups(ray_session, built_index, stored_built, doc_rows):
    from pageindex_ray.pipelines.stored import DocStore, stored_dir_of

    text, role = doc_rows
    store = DocStore(stored_dir_of(built_index["index_dir"]))
    rng = np.random.default_rng(7)
    ids = rng.choice(len(text), size=50, replace=True).astype(np.int64)
    got = store.fetch(ids)
    assert got.column("doc_id").to_pylist() == ids.tolist()  # input order, dups kept
    assert got.column("text").to_pylist() == [text[i] for i in ids]
    assert got.column("role").to_pylist() == [role[i] for i in ids]
    with pytest.raises(KeyError, match="doc ids"):
        store.fetch([len(text) + 5])
    with pytest.raises(KeyError, match="columns"):
        store.fetch([0], ("nope",))


def test_stored_is_sorted_and_resumable(ray_session, built_index, stored_built):
    import pyarrow.dataset as pads

    from pageindex_ray.pipelines.stored import build_stored_fields, stored_dir_of

    assert stored_built["resumed"] is False
    again = build_stored_fields(
        built_index["index_dir"], built_index["transcripts"], columns=("text",)
    )
    assert again["resumed"] is True
    ids = (
        pads.dataset(os.path.join(stored_dir_of(built_index["index_dir"]), "parts"))
        .to_table(columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    assert (np.diff(ids) >= 1).all()  # globally sorted, dense


def _golden_snippets(engine, oracle_index, doc_texts, qtext, k=10, window=5):
    from pageindex_ray.oracle.bm25 import score_all

    docs, scores = score_all(oracle_index, qtext)
    if not len(docs):
        return []
    order = np.lexsort((docs, -scores))[:k]
    qterms = sorted(set(tokenize(qtext)))
    dfs = {t: len(oracle_index.postings[t][0]) for t in qterms if t in oracle_index.postings}
    out = []
    for rank, i in enumerate(order):
        d = int(docs[i])
        toks = tokenize(doc_texts[d])
        present = [t for t in qterms if t in set(toks)]
        anchor = min(present, key=lambda t: (dfs[t], t))
        pos = toks.index(anchor)
        out.append(
            (rank, d, anchor, " ".join(toks[max(0, pos - window) : pos + window + 1]))
        )
    return out


def test_snippets_match_brute_force(engine, built_index, oracle_index, doc_rows):
    text, _ = doc_rows
    qt = pq.read_table(built_index["queries"])
    n = 0
    pairs = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    for qid, qtext in pairs[:20]:
        got = engine.snippets(qtext, k=10, window=5)
        want = _golden_snippets(engine, oracle_index, text, qtext)
        assert [(r["rank"], r["doc_id"], r["anchor"], r["snippet"]) for r in got] == want, qid
        n += len(got)
    assert n >= 100


def test_snippets_require_store(ray_session, built_index, tmp_path):
    from pageindex_ray.pipelines.search import SearchEngine

    bare = str(tmp_path / "bare_idx")
    shutil.copytree(built_index["index_dir"], bare)
    shutil.rmtree(os.path.join(bare, "stored"))
    e = SearchEngine(bare, num_shards=2)
    try:
        with pytest.raises(ValueError, match="stored-fields"):
            e.snippets("the", k=5)
    finally:
        e.shutdown()
    # foreign fingerprint refused at engine init
    stale = str(tmp_path / "stale_idx")
    shutil.copytree(built_index["index_dir"], stale)
    mpath = os.path.join(stale, "stored", "meta.json")
    with open(mpath) as f:
        m = json.load(f)
    m["fingerprint"] = "0" * 32
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="fingerprint"):
        SearchEngine(stale, num_shards=2)
