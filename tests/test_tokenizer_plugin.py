"""Pluggable tokenizer registry (SURVEY.md §2.11): spec forms agree,
builds honor the configured spec end to end, and the query engine
resolves the index's own tokenizer from meta."""

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = [
    "Hello, World-42!",
    "the  QUICK   brown\tfox",
    "",
    "a.b.c 1-2-3",
    "Ünïcode façade NAÏVE",
]


def test_default_spec_is_the_shared_tokenizer():
    from pageindex_ray.tokenizer import SQL_TOKENIZE, get_tokenizer, tokenize

    spec = get_tokenizer("alnum-lower-v1")
    for s in SAMPLES:
        assert spec.tokenize(s) == tokenize(s)
    assert spec.sql("text") == SQL_TOKENIZE.format(col="text")


@pytest.mark.parametrize("name", ["alnum-lower-v1", "ws-lower-v1", "alnum-case-v1"])
def test_spec_forms_agree(name):
    """Scalar findall, Arrow split-kernel, Arrow count-kernel and the
    DuckDB SQL fragment all produce the same tokens/counts."""
    from pageindex_ray.tokenizer import get_tokenizer

    spec = get_tokenizer(name)
    arr = pa.array(SAMPLES, type=pa.string())
    arrow_lists = [
        [t for t in row if t != ""] for row in spec.arrow_token_lists(arr).to_pylist()
    ]
    counts = spec.arrow_token_count(arr).to_pylist()
    con = duckdb.connect()
    sql_lists = [
        r[0]
        for r in con.execute(
            f"SELECT {spec.sql('s')} FROM (SELECT unnest(?) AS s)", [SAMPLES]
        ).fetchall()
    ]
    for s, al, c, ql in zip(SAMPLES, arrow_lists, counts, sql_lists):
        py = spec.tokenize(s)
        assert al == py, (name, s)
        assert c == len(py), (name, s)
        assert ql == py, (name, s)


def test_unknown_tokenizer_fails_fast(tmp_path):
    from pageindex_ray.config import BuildConfig

    with pytest.raises(KeyError, match="unknown tokenizer"):
        from pageindex_ray.pipelines.build import build_index

        build_index(
            "/nonexistent.parquet",
            str(tmp_path / "idx"),
            BuildConfig(tokenizer="no-such-spec"),
        )


def _mini_corpus(tmp_path) -> str:
    rows = {
        "conv_id": ["c0", "c0", "c1", "c1"],
        "turn_idx": pa.array([0, 1, 0, 1], type=pa.int32()),
        "role": ["user", "assistant", "user", "assistant"],
        "text": [
            "Hello, world! Hello,",
            "world! world! goodbye.",
            "Hello, goodbye. MixedCase",
            "plain words here",
        ],
        "tool": pa.array([None] * 4, type=pa.string()),
        "ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    return tpath


def test_build_and_search_with_custom_tokenizer(ray_session, tmp_path):
    """A ws-lower-v1 build tokenizes 'Hello,' (punctuation attached) as one
    term; term_stats match the spec's DuckDB twin and the query engine
    auto-resolves the SAME spec from meta at serving time."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.tokenizer import get_tokenizer

    tpath = _mini_corpus(tmp_path)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4, tokenizer="ws-lower-v1"))

    spec = get_tokenizer("ws-lower-v1")
    stats = pq.read_table(os.path.join(idx, "postings"), columns=["term", "df", "cf"])
    eng_stats = {}
    for term, df, cf in zip(
        stats.column("term").to_pylist(),
        stats.column("df").to_pylist(),
        stats.column("cf").to_pylist(),
    ):
        d, c = eng_stats.get(term, (0, 0))
        eng_stats[term] = (d + df, c + cf)

    con = duckdb.connect()
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH tok AS (
              SELECT unnest({spec.sql('text')}) AS term, conv_id, turn_idx
              FROM read_parquet('{tpath}')
            )
            SELECT term, count(DISTINCT (conv_id, turn_idx)), count(*)
            FROM tok GROUP BY term
            """
        ).fetchall()
    }
    assert eng_stats == oracle
    assert "hello," in eng_stats  # punctuation attached under ws tokenization

    eng = SearchEngine(idx, num_shards=2)
    try:
        assert eng.tokenizer_name == "ws-lower-v1"
        # 'Hello,' normalizes to the ws token 'hello,' and retrieves;
        # under the DEFAULT tokenizer this query would become 'hello'
        # which this index does not contain.
        hits = eng.search("Hello,", k=4)
        assert {h["doc_id"] for h in hits} == {0, 2}
        assert eng.search("hello", k=4) == []
    finally:
        eng.shutdown()


def test_default_build_unchanged_by_registry(ray_session, tmp_path):
    """A default-config build's fingerprint input still says
    alnum-lower-v1 — the registry refactor must not invalidate existing
    lineage fingerprints."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.stages.postings import stats_fingerprint

    cfg = BuildConfig()
    assert cfg.tokenizer == "alnum-lower-v1"
    fp_now = stats_fingerprint(100, 12.5, cfg, hot_terms=("the",))

    class LegacyCfg:
        k1 = cfg.k1
        b = cfg.b
        block_size = cfg.block_size
        num_partitions = cfg.num_partitions
        salt_factor = cfg.salt_factor

    assert fp_now == stats_fingerprint(100, 12.5, LegacyCfg(), hot_terms=("the",))


def test_custom_registered_spec_ships_to_workers(ray_session, tmp_path):
    """A spec registered ONLY in the driver process must still work in Ray
    worker processes: stages receive the cloudpickled spec object, not the
    name (a fresh worker's registry has only the built-ins)."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.tokenizer import TokenizerSpec, register_tokenizer

    register_tokenizer(
        TokenizerSpec(
            name="test-digits-v1",
            token_pattern=r"[0-9]+",
            split_pattern=r"[^0-9]+",
        )
    )
    rows = {
        "conv_id": ["c0", "c0", "c1"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": ["item 42 and 7", "no digits here", "42 again: 42"],
        "tool": pa.array([None] * 3, type=pa.string()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4, tokenizer="test-digits-v1"))
    # only digit runs are tokens: doc_lens 2, 0, 2 (in conv/turn order)
    dm = pq.read_table(os.path.join(idx, "docmap")).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert dm.column("doc_len").to_pylist() == [2, 0, 2]
    eng = SearchEngine(idx, num_shards=2)
    try:
        assert {h["doc_id"] for h in eng.search("42", k=3)} == {0, 2}
        assert eng.search("digits", k=3) == []  # words are not tokens here
    finally:
        eng.shutdown()


def test_sort_groupby_docmap_honors_tokenizer(ray_session, tmp_path):
    """Finding fix: the sort_groupby transport's separate docmap pass must
    count doc_len with the CONFIGURED tokenizer, not the default."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.tokenizer import get_tokenizer

    tpath = _mini_corpus(tmp_path)
    idx = str(tmp_path / "idx")
    build_index(
        tpath,
        idx,
        BuildConfig(
            num_partitions=4, tokenizer="ws-lower-v1", reduce_strategy="sort_groupby"
        ),
    )
    dm = pq.read_table(os.path.join(idx, "docmap")).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    spec = get_tokenizer("ws-lower-v1")
    src = pq.read_table(tpath).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    expect = [len(spec.tokenize(t)) for t in src.column("text").to_pylist()]
    assert dm.column("doc_len").to_pylist() == expect


def test_merge_rejects_tokenizer_mismatch(ray_session, tmp_path):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.pipelines.merge import merge_indexes

    tpath = _mini_corpus(tmp_path)
    a, b = str(tmp_path / "wa"), str(tmp_path / "wb")
    build_index(tpath, a, BuildConfig(num_partitions=4))
    build_index(tpath, b, BuildConfig(num_partitions=4, tokenizer="ws-lower-v1"))
    # fake wave contiguity so ONLY the tokenizer check can fire
    import json as _json

    meta_b = load_meta(b)
    meta_b["doc_base"] = load_meta(a)["n_docs"]
    with open(os.path.join(b, "meta.json"), "w") as f:
        _json.dump(meta_b, f)
    with pytest.raises(ValueError, match="tokenizer"):
        merge_indexes([a, b], str(tmp_path / "merged"))


def test_empty_vocabulary_build_and_serve(ray_session, tmp_path):
    """A tokenizer that yields zero tokens for every doc produces a
    legitimately empty index: build commits (docmap intact, no posting
    parts) and the engine serves empty results instead of crashing."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.tokenizer import TokenizerSpec, register_tokenizer

    register_tokenizer(
        TokenizerSpec(
            name="test-digits2-v1",
            token_pattern=r"[0-9]+",
            split_pattern=r"[^0-9]+",
        )
    )
    tpath = _mini_corpus(tmp_path)  # no digits anywhere
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4, tokenizer="test-digits2-v1"))
    dm = pq.read_table(os.path.join(idx, "docmap"))
    assert set(dm.column("doc_len").to_pylist()) == {0}
    eng = SearchEngine(idx, num_shards=2)
    try:
        assert eng.search("hello 123", k=3) == []
    finally:
        eng.shutdown()
