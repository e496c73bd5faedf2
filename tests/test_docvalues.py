"""Doc-values sidecar + sort-by-field retrieval."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dv_built(ray_session, built_index):
    from pageindex_ray.pipelines.docvalues import build_docvalues

    info = build_docvalues(built_index["index_dir"], built_index["transcripts"], columns=("ts",))
    return info


@pytest.fixture(scope="module")
def engine(ray_session, built_index, dv_built):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=4)
    yield eng
    eng.shutdown()


def _golden_sorted(built_index, engine, qtext, k=10, descending=True):
    src = pq.read_table(built_index["transcripts"])
    conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
    turn = src.column("turn_idx").to_numpy().astype(np.int64)
    order = np.lexsort((turn, conv))
    ts = src.column("ts").cast(pa.int64()).to_numpy()[order]
    terms = sorted(set(engine.tokenize(qtext)))
    per_term = engine.term_doc_ids(terms)
    if not per_term:
        return []
    docs = np.unique(np.concatenate(list(per_term.values())))
    vals = ts[docs]
    o = (np.lexsort((docs, -vals)) if descending else np.lexsort((docs, vals)))[:k]
    return list(zip(docs[o].tolist(), vals[o].tolist()))


def test_build_is_resumable_and_typed(dv_built, built_index):
    from pageindex_ray.pipelines.docvalues import build_docvalues

    assert dv_built["columns"] == {"ts": "timestamp[us]"}
    again = build_docvalues(built_index["index_dir"], built_index["transcripts"], columns=("ts",))
    assert again["resumed"] is True


@pytest.mark.parametrize("descending", [True, False])
def test_sorted_search_matches_brute_force(engine, built_index, descending):
    for q in ["the of", "and", "is it the"]:
        got = [
            (r["doc_id"], r["sort_value"])
            for r in engine.sorted_search(q, by="ts", k=10, descending=descending)
        ]
        want = _golden_sorted(built_index, engine, q, k=10, descending=descending)
        assert got == want, q


def test_sorted_distributed_matches_driver(ray_session, built_index, dv_built):
    from pageindex_ray.pipelines.search import SearchEngine

    dist = SearchEngine(built_index["index_dir"], num_shards=4, num_scorers=3)
    assert dist.scorers
    driver = SearchEngine(built_index["index_dir"], num_shards=4)
    try:
        qt = pq.read_table(built_index["queries"])
        queries = list(
            zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist())
        )[:10]
        a = driver.sorted_search_batch(queries, by="ts", k=10)
        b = dist.sorted_search_batch(queries, by="ts", k=10)
        assert a.to_pylist() == b.to_pylist()
    finally:
        driver.shutdown()
        dist.shutdown()


def test_sorted_search_composes_with_where(ray_session, built_index, tmp_path):
    """Own index copy: building attrs on the shared fixture would turn
    test_attrs' non-resume fixture assert into an ordering hazard."""
    import shutil

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.attrs import build_attrs
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.docvalues import build_docvalues
    from pageindex_ray.pipelines.search import SearchEngine

    idx = str(tmp_path / "dv_where_idx")
    build_index(built_index["transcripts"], idx, BuildConfig(num_partitions=8))
    build_docvalues(idx, built_index["transcripts"], columns=("ts",))
    build_attrs(idx, built_index["transcripts"], columns=("role", "tool"))
    eng = SearchEngine(idx, num_shards=4)
    try:
        rows = eng.sorted_search("the of", by="ts", k=10, where={"role": "user"})
        assert rows
        # golden role per doc
        src = pq.read_table(built_index["transcripts"])
        conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
        turn = src.column("turn_idx").to_numpy().astype(np.int64)
        order = np.lexsort((turn, conv))
        role = np.asarray(src.column("role").to_pylist(), dtype=object)[order]
        for r in rows:
            assert role[r["doc_id"]] == "user"
    finally:
        eng.shutdown()


def test_error_paths(engine, ray_session, built_index, tmp_path):
    with pytest.raises(KeyError):
        engine.sorted_search("the", by="nope")
    # nulls and non-numeric types are hard errors at build time
    from pageindex_ray.pipelines.docvalues import _as_int64

    with pytest.raises(ValueError):
        _as_int64(pa.array([1, None], type=pa.int64()), "x")
    with pytest.raises(TypeError):
        _as_int64(pa.array(["a"]), "x")


def test_histogram_matches_brute_force(engine, built_index):
    width = 3_600_000_000  # hourly over the synthetic ts space
    for q in ["the of", "and it"]:
        got = {
            (r["bucket"],): r["n_docs"]
            for r in engine.histogram_batch([(0, q)], by="ts", width=width).to_pylist()
        }
        want_pairs = _golden_sorted(built_index, engine, q, k=10**9, descending=True)
        import collections

        want = collections.Counter(v // width for _, v in want_pairs)
        assert got == {(b,): c for b, c in want.items()}, q


def test_histogram_distributed_matches_driver(ray_session, built_index, dv_built):
    from pageindex_ray.pipelines.search import SearchEngine

    dist = SearchEngine(built_index["index_dir"], num_shards=4, num_scorers=3)
    driver = SearchEngine(built_index["index_dir"], num_shards=4)
    try:
        qt = pq.read_table(built_index["queries"])
        queries = list(
            zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist())
        )[:8]
        a = driver.histogram_batch(queries, by="ts", width=3_600_000_000)
        b = dist.histogram_batch(queries, by="ts", width=3_600_000_000)
        assert a.to_pylist() == b.to_pylist()
    finally:
        driver.shutdown()
        dist.shutdown()


def test_histogram_validation(engine):
    import pytest as _pt

    with _pt.raises(ValueError):
        engine.histogram_batch([(0, "the")], by="ts", width=0)
    with _pt.raises(KeyError):
        engine.histogram_batch([(0, "the")], by="nope", width=10)


def test_field_stats_match_brute_force_and_distributed(ray_session, built_index, dv_built):
    from pageindex_ray.pipelines.search import SearchEngine

    dist = SearchEngine(built_index["index_dir"], num_shards=4, num_scorers=3)
    driver = SearchEngine(built_index["index_dir"], num_shards=4)
    try:
        qt = pq.read_table(built_index["queries"])
        queries = list(
            zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist())
        )[:8]
        a = driver.field_stats_batch(queries, by="ts")
        b = dist.field_stats_batch(queries, by="ts")
        assert a.to_pylist() == b.to_pylist() and a.num_rows > 0
        # brute-force golden for one query
        qid, qtext = queries[0]
        pairs = _golden_sorted(built_index, driver, qtext, k=10**9)
        row = [r for r in a.to_pylist() if r["query_id"] == qid][0]
        vals = [v for _, v in pairs]
        assert row["n_docs"] == len(vals)
        assert row["vmin"] == min(vals) and row["vmax"] == max(vals)
        # absent-term query omitted
        c = driver.field_stats_batch([(99, "zzzqqq")], by="ts")
        assert c.num_rows == 0
    finally:
        driver.shutdown()
        dist.shutdown()
