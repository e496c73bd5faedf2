"""Positional sidecar: phrase answers must be bit-identical to the
corpus-verify path (pipelines/phrase.py) and to the string-count
convention, including the shared-boundary-space edge cases."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def positioned_index(ray_session, built_index):
    from pageindex_ray.pipelines.positions import build_positions

    rep = build_positions(built_index["index_dir"], built_index["transcripts"])
    assert rep["resumed"] is False
    # idempotent rebuild resumes
    rep2 = build_positions(built_index["index_dir"], built_index["transcripts"])
    assert rep2["resumed"] is True
    return built_index


def test_positional_matches_corpus_verify(ray_session, positioned_index):
    from pageindex_ray.pipelines.phrase import phrase_queries, phrase_search
    from pageindex_ray.pipelines.positions import phrase_search_positional
    from pageindex_ray.pipelines.search import SearchEngine

    tpath = positioned_index["transcripts"]
    phrases = phrase_queries(tpath, n=10)
    eng = SearchEngine(positioned_index["index_dir"], num_shards=4)
    try:
        via_corpus = phrase_search(eng, tpath, phrases)
    finally:
        eng.shutdown()
    via_positions = phrase_search_positional(positioned_index["index_dir"], phrases)
    assert via_positions.num_rows > 0
    assert via_positions.equals(via_corpus)


def test_positional_absent_term_and_empty(positioned_index):
    from pageindex_ray.pipelines.positions import (
        RESULT_SCHEMA,
        phrase_search_positional,
    )

    out = phrase_search_positional(
        positioned_index["index_dir"], [(0, "zzzznotaword alpha"), (1, "")]
    )
    assert out.num_rows == 0
    assert out.schema.equals(RESULT_SCHEMA)


def test_positional_shared_boundary_convention(ray_session, tmp_path):
    """'a a a a' contains 'a a' ONCE under the string-count convention the
    SQL twin uses (adjacent occurrences share the boundary space); a gap of
    one token makes it two."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.positions import (
        build_positions,
        phrase_search_positional,
    )

    rows = {
        "conv_id": ["c0", "c0", "c1"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": ["a a a a", "a a b a a", "x a b x a b"],
        "tool": pa.array([None, None, None], type=pa.string()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4))
    build_positions(idx, tpath)
    out = phrase_search_positional(idx, [(0, "a a"), (1, "a b"), (2, "a")])
    got = {(r["query_id"], r["doc_id"]): r["n_occ"] for r in out.to_pylist()}
    assert got == {
        (0, 0): 1,  # ' a a a a ': one ' a a ' (boundary space shared)
        (0, 1): 2,  # ' a a b a a ': two
        (1, 1): 1,  # tokens [a,a,b,a,a]: 'a b' only at start 1
        (1, 2): 2,  # 'x a b x a b'
        (2, 0): 2,  # single token 'a' in 'a a a a': string count of ' a ' = 2
        (2, 1): 2,  # 'a a b a a': ' a ' count = 2
        (2, 2): 2,  # 'x a b x a b'
    }


def test_greedy_matches_string_count_property():
    """Random token streams over a tiny alphabet: the positional greedy
    equals str.count on the sentinel-joined string for every window."""
    from pageindex_ray.pipelines.positions import greedy_occurrences

    rng = np.random.default_rng(7)
    alphabet = ["a", "b", "ab"]
    for _ in range(300):
        doc = [alphabet[i] for i in rng.integers(0, len(alphabet), size=rng.integers(1, 14))]
        L = int(rng.integers(1, 4))
        start = int(rng.integers(0, max(1, len(doc) - L + 1)))
        phrase = doc[start : start + L]
        if len(phrase) < L:
            continue
        joined = " " + " ".join(doc) + " "
        needle = " " + " ".join(phrase) + " "
        expected = joined.count(needle)
        starts = [
            i
            for i in range(len(doc) - L + 1)
            if doc[i : i + L] == phrase
        ]
        assert greedy_occurrences(np.asarray(starts), L) == expected, (doc, phrase)


def test_positions_fingerprint_guard(ray_session, tmp_path, positioned_index):
    """A sidecar carrying a different fingerprint is refused at query time."""
    import json
    import shutil

    from pageindex_ray.pipelines.positions import (
        phrase_search_positional,
        positions_dir_of,
    )

    src = positioned_index["index_dir"]
    idx = str(tmp_path / "idxcopy")
    shutil.copytree(src, idx)
    mpath = os.path.join(positions_dir_of(idx), "meta.json")
    with open(mpath) as f:
        meta = json.load(f)
    meta["fingerprint"] = "deadbeef"
    with open(mpath, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="fingerprint"):
        phrase_search_positional(idx, [(0, "alpha beta")])


def test_positions_missing_sidecar_raises(ray_session, tmp_path):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.positions import phrase_search_positional

    rows = {
        "conv_id": ["c0"],
        "turn_idx": pa.array([0], type=pa.int32()),
        "role": ["user"],
        "text": ["hello world"],
        "tool": pa.array([None], type=pa.string()),
        "ts": pa.array([1], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=2))
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        phrase_search_positional(idx, [(0, "hello world")])


def test_min_span_matches_bruteforce():
    """k-pointer minimal covering range == min over the occurrence cross
    product (the SQL twin's formulation), on random position sets."""
    import itertools

    from pageindex_ray.pipelines.positions import _min_span

    rng = np.random.default_rng(11)
    for _ in range(200):
        k = int(rng.integers(1, 4))
        lists = [
            np.sort(rng.choice(30, size=rng.integers(1, 5), replace=False)).astype(np.int64)
            for _ in range(k)
        ]
        brute = min(
            max(t) - min(t) for t in itertools.product(*[l.tolist() for l in lists])
        )
        assert _min_span(lists) == brute


def test_proximity_search_semantics(ray_session, tmp_path):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.positions import build_positions, proximity_search

    rows = {
        "conv_id": ["c0", "c0", "c1"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": [
            "alpha x x x beta",        # span 4
            "beta alpha",              # span 1 (unordered)
            "alpha x x x x x x x beta" # span 8 > slop 7 -> excluded
        ],
        "tool": pa.array([None, None, None], type=pa.string()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4))
    build_positions(idx, tpath)
    out = proximity_search(idx, [(0, "alpha beta"), (1, "alpha alpha")], slop=7)
    got = {(r["query_id"], r["doc_id"]): r["span"] for r in out.to_pylist()}
    # duplicate tokens dedupe to a single term -> span 0 wherever it occurs
    assert got == {(0, 0): 4, (0, 1): 1, (1, 0): 0, (1, 1): 0, (1, 2): 0}


def test_ordered_min_span_matches_bruteforce():
    """Greedy chain == min over the order-constrained cross product (the
    SQL twin's formulation), on random position sets including no-chain
    cases."""
    import itertools

    from pageindex_ray.pipelines.positions import _ordered_min_span

    INF = np.iinfo(np.int64).max
    rng = np.random.default_rng(13)
    for _ in range(300):
        k = int(rng.integers(1, 4))
        lists = [
            np.sort(rng.choice(20, size=rng.integers(1, 5), replace=False)).astype(np.int64)
            for _ in range(k)
        ]
        spans = [
            t[-1] - t[0]
            for t in itertools.product(*[l.tolist() for l in lists])
            if all(a < b for a, b in zip(t, t[1:]))
        ]
        brute = min(spans) if spans else INF
        assert _ordered_min_span(lists) == brute


def test_span_near_semantics(ray_session, tmp_path):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.positions import build_positions, span_near_search

    rows = {
        "conv_id": ["c0", "c0", "c1", "c1"],
        "turn_idx": pa.array([0, 1, 0, 1], type=pa.int32()),
        "role": ["user", "assistant", "user", "assistant"],
        "text": [
            "alpha x x beta",       # ordered span 2
            "beta alpha",           # WRONG order -> no match (proximity would match)
            "alpha beta",           # span 0 (exact phrase)
            "alpha x x x x beta",   # span 4 > slop 3 -> excluded
        ],
        "tool": pa.array([None] * 4, type=pa.string()),
        "ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us")),
    }
    tpath = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), tpath)
    idx = str(tmp_path / "idx")
    build_index(tpath, idx, BuildConfig(num_partitions=4))
    build_positions(idx, tpath)
    out = span_near_search(idx, [(0, "alpha beta")], slop=3)
    got = {(r["query_id"], r["doc_id"]): r["span"] for r in out.to_pylist()}
    assert got == {(0, 0): 2, (0, 2): 0}
    # duplicate tokens each consume a position: "alpha alpha" needs TWO
    # alphas in one doc — none of these docs has that
    out2 = span_near_search(idx, [(1, "alpha alpha")], slop=9)
    assert out2.num_rows == 0
    # slop=0 is exactly the phrase query
    out3 = span_near_search(idx, [(2, "alpha beta")], slop=0)
    got3 = {(r["query_id"], r["doc_id"]): r["span"] for r in out3.to_pylist()}
    assert got3 == {(2, 2): 0}
