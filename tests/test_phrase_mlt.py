"""Phrase search + more-like-this: semantics pinned against DuckDB and
against crafted corpora (overlap counting, absent terms, source exclusion)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def engine(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=4)
    yield eng
    eng.shutdown()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_phrase_search_matches_duckdb(engine, built_index):
    import __ray_entry__ as m
    from pageindex_ray.pipelines.phrase import phrase_queries, phrase_search

    tpath = built_index["transcripts"]
    phrases = phrase_queries(tpath, n=10)
    assert phrases, "corpus-derived phrase set must be non-empty"
    ours = _canon(phrase_search(engine, tpath, phrases).to_pandas())
    theirs = _canon(
        duckdb.connect().execute(m._phrase_search_sql(tpath, phrases)).fetchdf()
    )
    assert len(ours) > 0, "derived phrases must have at least one hit"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)


def test_phrase_absent_term_is_empty(engine, built_index):
    from pageindex_ray.pipelines.phrase import RESULT_SCHEMA, phrase_search

    out = phrase_search(
        engine, built_index["transcripts"], [(0, "zzzznotaword alpha")]
    )
    assert out.num_rows == 0
    assert out.schema.equals(RESULT_SCHEMA)


def test_phrase_overlap_counting_convention(ray_session, tmp_path):
    """The documented n_occ semantics: non-overlapping left-to-right count
    of the space-joined phrase — identical to DuckDB's replace-based count
    ('a a a' contains phrase 'a a' once under this convention, not twice)."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.phrase import phrase_search
    from pageindex_ray.pipelines.search import SearchEngine

    rows = {
        "conv_id": ["c0", "c0", "c1"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": ["a a a b", "b a a", "c c"],
        "tool": pa.array([None, None, None], type=pa.string()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4))
    eng = SearchEngine(idx, num_shards=2)
    try:
        out = phrase_search(eng, tpath, [(0, "a a"), (1, "c c")]).to_pandas()
    finally:
        eng.shutdown()
    got = {(r.query_id, r.doc_id): r.n_occ for r in out.itertuples()}
    # doc 0 = 'a a a b' (space-join ' a a a b ': one non-overlapping ' a a '),
    # doc 1 = 'b a a' (one), doc 2 = 'c c' (one for phrase 1)
    assert got == {(0, 0): 1, (0, 1): 1, (1, 2): 1}


def test_mlt_matches_duckdb_and_excludes_source(engine, built_index):
    import __ray_entry__ as m
    from pageindex_ray.pipelines.mlt import mlt_source_docs, more_like_this

    tpath = built_index["transcripts"]
    sources = mlt_source_docs(tpath, n=5)
    ours_t = more_like_this(engine, tpath, sources)
    ours = _canon(ours_t.to_pandas())
    theirs = _canon(
        duckdb.connect().execute(m._more_like_this_sql(tpath, sources)).fetchdf()
    )
    assert len(ours) > 0
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
    # the source doc never appears in its own result list
    src_by_q = dict((q, d) for q, d in sources)
    for r in ours_t.to_pandas().itertuples():
        assert r.doc_id != src_by_q[r.query_id]
    # ranks are dense 0..k-1 per query
    for _, g in ours_t.to_pandas().groupby("query_id"):
        assert sorted(g["rank"]) == list(range(len(g)))


def test_query_derivation_handles_sharded_corpus(tiny_corpus, tmp_path):
    """phrase_queries and mlt_source_docs must treat a sharded corpus
    directory (sorted shard files = writer order) exactly like the
    monolithic file — at sf>=0.1 the synthesized corpus IS a directory, and
    both helpers crashed on it before round 5 (pq.ParquetFile on a dir)."""
    from pageindex_ray.pipelines.mlt import mlt_source_docs
    from pageindex_ray.pipelines.phrase import phrase_queries

    t = pq.read_table(tiny_corpus["transcripts"])
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    per = (t.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(t.slice(i * per, per), os.path.join(shard_dir, f"part-{i:03d}.parquet"))

    assert phrase_queries(shard_dir) == phrase_queries(tiny_corpus["transcripts"])
    assert mlt_source_docs(shard_dir) == mlt_source_docs(tiny_corpus["transcripts"])


def test_phrase_candidate_guard(engine, built_index):
    """An unselective phrase must raise the broadcast-size guard, not
    silently build a huge driver-side candidate map."""
    from pageindex_ray.pipelines.phrase import phrase_queries, phrase_search

    phrases = phrase_queries(built_index["transcripts"], n=4)
    with pytest.raises(ValueError, match="candidate set too large"):
        phrase_search(engine, built_index["transcripts"], phrases, max_candidates=1)
