"""Keyset pagination (search_after): exact stateless deep paging on both
scoring paths. The cursor is applied range-locally in every RangeScorer
(before per-range top-k), so the merged page is exact — pinned here by
comparing against the driver path and against page-stitching algebra."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engines(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    driver = SearchEngine(built_index["index_dir"], num_shards=4)
    dist = SearchEngine(built_index["index_dir"], num_shards=4, num_scorers=3)
    assert dist.scorers, "distributed path must be engaged for this test"
    yield driver, dist
    driver.shutdown()
    dist.shutdown()


QUERIES = ["the system tool", "deploy cluster", "error retry the", "a"]


def test_pages_stitch_to_topk(engines):
    driver, _ = engines
    for q in QUERIES:
        full = driver.search(q, k=9)
        pages, cursor = [], None
        for _ in range(3):
            page = driver.search(q, k=3, search_after=cursor)
            if not page:
                break
            pages.extend(page)
            cursor = (page[-1]["score"], page[-1]["doc_id"])
        assert [(r["doc_id"], r["score"]) for r in pages] == [
            (r["doc_id"], r["score"]) for r in full
        ], q


def test_distributed_pagination_matches_driver(engines):
    driver, dist = engines
    for q in QUERIES:
        page1 = driver.search(q, k=10)
        if len(page1) < 10:
            continue
        cursor = (page1[-1]["score"], page1[-1]["doc_id"])
        a = driver.search(q, k=10, search_after=cursor)
        b = dist.search(q, k=10, search_after=cursor)
        assert [(r["doc_id"],) for r in a] == [(r["doc_id"],) for r in b], q
        np.testing.assert_array_equal(
            [r["score"] for r in a], [r["score"] for r in b]
        )


def test_cursor_past_end_returns_empty(engines):
    driver, dist = engines
    for eng in engines:
        # a cursor below every possible score
        assert eng.search("the", k=5, search_after=(-1e18, 1 << 60)) == []


def test_search_after_validation(engines):
    driver, _ = engines
    with pytest.raises(ValueError):
        driver.search("the", k=5, search_after=(1.0, 2, 3))
    with pytest.raises(ValueError):
        driver.search("the", k=5, granularity="conv", search_after=(1.0, 2))
    with pytest.raises(ValueError):
        driver.search("the", k=5, use_wand=True, search_after=(1.0, 2))


def test_tie_heavy_pagination_is_exact(engines):
    """Single-term queries produce massed score ties (same tf/dl buckets);
    the cursor's (score ==, doc_id >) arm must walk tied runs exactly."""
    driver, dist = engines
    for eng in (driver, dist):
        full = eng.search("the", k=40)
        paged, cursor = [], None
        while len(paged) < 40:
            page = eng.search("the", k=7, search_after=cursor)
            if not page:
                break
            paged.extend(page)
            cursor = (page[-1]["score"], page[-1]["doc_id"])
        assert [(r["doc_id"], r["score"]) for r in paged[:40]] == [
            (r["doc_id"], r["score"]) for r in full
        ]
