"""Search-as-Dataset export: the full match set scored by a pure Ray Data
pipeline must equal the serving path's exhaustive scored set, doc for doc."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=4)
    yield eng
    eng.shutdown()


def _serving_full(engine, qtext):
    arrays = engine._term_arrays(sorted(set(engine.tokenize(qtext))))
    if not arrays:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return engine._exhaustive(arrays)


@pytest.mark.parametrize("qtext", ["the of and", "is", "it in the a"])
def test_export_matches_serving_full_set(ray_session, built_index, engine, qtext):
    from pageindex_ray.pipelines.export import search_to_dataset

    df = (
        search_to_dataset(built_index["index_dir"], qtext)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    d, s = _serving_full(engine, qtext)
    assert np.array_equal(df["doc_id"].to_numpy(), d)
    np.testing.assert_allclose(df["score"].to_numpy(), s, rtol=0, atol=1e-12)
    convs, turns = engine.doc_location(d)
    assert (df["conv_id"].to_numpy() == convs).all()
    assert (df["turn_idx"].to_numpy() == turns).all()


def test_export_min_should_match(ray_session, built_index, engine):
    from pageindex_ray.pipelines.export import search_to_dataset

    qtext = "the of"
    terms = sorted(set(engine.tokenize(qtext)))
    df = (
        search_to_dataset(built_index["index_dir"], qtext, min_should_match=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # golden: docs present in >= 2 of the terms' posting lists
    per_term = engine.term_doc_ids(terms)
    from collections import Counter

    counts = Counter()
    for ids in per_term.values():
        counts.update(ids.tolist())
    want = sorted(d for d, c in counts.items() if c >= 2)
    assert df["doc_id"].tolist() == want
    assert len(want) > 0


def test_export_empty_and_absent(ray_session, built_index):
    from pageindex_ray.pipelines.export import search_to_dataset

    assert search_to_dataset(built_index["index_dir"], "").count() == 0
    assert search_to_dataset(built_index["index_dir"], "zzzqqqxxx").count() == 0


def test_export_writes_partitioned_parquet(ray_session, built_index, tmp_path, engine):
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.export import export_search

    out = str(tmp_path / "export")
    rep = export_search(built_index["index_dir"], "the and", out)
    d, _ = _serving_full(engine, "the and")
    assert rep["n_rows"] == len(d)
    back = pq.read_table(out)
    assert back.num_rows == len(d)
    assert sorted(back.column("doc_id").to_pylist()) == d.tolist()


def test_export_overwrites_previous_export(ray_session, built_index, tmp_path, engine):
    """write_parquet APPENDS uniquely-named part files: a second export to
    the same dir must replace the first, never interleave with it."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.export import export_search

    out = str(tmp_path / "re_export")
    export_search(built_index["index_dir"], "the and", out)
    rep = export_search(built_index["index_dir"], "is", out)
    d, _ = _serving_full(engine, "is")
    assert rep["n_rows"] == len(d)
    back = pq.read_table(out)
    assert back.num_rows == len(d)
    assert sorted(back.column("doc_id").to_pylist()) == d.tolist()
