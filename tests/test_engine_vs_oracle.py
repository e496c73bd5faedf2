"""Oracle conformance: the distributed engine must be rank-identical to the
single-process BM25 oracle on the fixed query set (FIXTURES.md F3), with
scores equal to 1e-9 rel tol — the analogue of the reference's golden
results-original/ corpus (SURVEY.md §5)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.oracle.bm25 import topk, topk_conversations
from pageindex_ray.tokenizer import tokenize


@pytest.fixture(scope="module")
def engine(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=4)
    yield eng
    eng.shutdown()


def _queries(built_index):
    t = pq.read_table(built_index["queries"])
    return list(zip(t.column("query_id").to_pylist(), t.column("text").to_pylist()))


def test_docmap_invariants(built_index, oracle_index):
    """input_hint invariant: per-turn text equality under stable turn ordering.
    docmap ordered by doc_id reproduces the sorted input's doc_len sequence."""
    import pyarrow.dataset as pads

    dm = pads.dataset(built_index["index_dir"] + "/docmap").to_table()
    order = np.argsort(dm.column("doc_id").to_numpy())
    doc_lens = dm.column("doc_len").to_numpy()[order]
    assert len(doc_lens) == oracle_index.N
    assert np.array_equal(doc_lens, oracle_index.doclens)
    turn = dm.column("turn_idx").to_numpy()[order]
    assert np.array_equal(turn, oracle_index.turn_idx)


def test_stats_match(built_index, oracle_index):
    from pageindex_ray.pipelines.build import load_meta

    meta = load_meta(built_index["index_dir"])
    assert meta["n_docs"] == oracle_index.N
    assert meta["avgdl"] == pytest.approx(oracle_index.avgdl, rel=1e-12)


def test_topk_rank_identical_turn(engine, built_index, oracle_index):
    nonempty = 0
    for qid, qtext in _queries(built_index):
        golden = topk(oracle_index, qtext, k=10)
        got = engine.search(qtext, k=10, granularity="turn", use_wand=False)
        assert [r["doc_id"] for r in got] == [g[1] for g in golden], (qid, qtext)
        for r, g in zip(got, golden):
            assert r["score"] == pytest.approx(g[2], rel=1e-9)
        nonempty += bool(golden)
    assert nonempty >= 30  # the query set is not degenerate


def test_topk_wand_identical_to_exhaustive(engine, built_index, oracle_index):
    """WAND pruning must never change the top-k (SURVEY.md §5.2)."""
    for qid, qtext in _queries(built_index):
        golden = topk(oracle_index, qtext, k=10)
        got = engine.search(qtext, k=10, granularity="turn", use_wand=True)
        assert [r["doc_id"] for r in got] == [g[1] for g in golden], (qid, qtext)
        for r, g in zip(got, golden):
            assert r["score"] == g[2], (qid, qtext)  # bit-identical floats


def test_topk_conversation_granularity(engine, built_index, oracle_index):
    for qid, qtext in _queries(built_index):
        golden = topk_conversations(oracle_index, qtext, k=10)
        got = engine.search(qtext, k=10, granularity="conv")
        assert [r["conv_id"] for r in got] == [g[1] for g in golden], (qid, qtext)
        for r, g in zip(got, golden):
            assert r["score"] == pytest.approx(g[2], rel=1e-9)


def test_search_batch_matches_single(engine, built_index):
    qs = _queries(built_index)[:10]
    batch = engine.search_batch(qs, k=10).to_pylist()
    singles = []
    for qid, qtext in qs:
        for r in engine.search(qtext, k=10):
            singles.append((qid, r["rank"], r["doc_id"]))
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in batch] == singles


def test_absent_term_query_empty(engine):
    assert engine.search("zzzabsentterm", k=10) == []


def test_degenerate_queries(engine):
    """Empty / punctuation-only queries return []; case folds (an UPPERCASE
    hot term matches its lowercase postings); WAND agrees on all of them."""
    assert engine.search("", k=10) == []
    assert engine.search("?!, .;:", k=10) == []
    upper = engine.search("THE", k=10)
    lower = engine.search("the", k=10)
    assert upper == lower and len(lower) > 0
    assert engine.search("the", k=10, use_wand=True) == lower


def test_posting_sample_verification(built_index, oracle_index):
    """FIXTURES.md F6: sampled postings re-verified against source turns —
    the deterministic analogue of the reference's verify_toc
    (/root/reference/pageindex/page_index.py:892-944); pass rate must be 1.0."""
    import pyarrow.dataset as pads

    table = pads.dataset(built_index["index_dir"] + "/postings").to_table()
    src = pq.read_table(built_index["transcripts"])
    conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
    turn = np.asarray(src.column("turn_idx").to_pylist(), dtype=np.int64)
    texts = src.column("text").to_pylist()
    order = np.lexsort((turn, conv))
    sorted_texts = [texts[i] for i in order]

    from pageindex_ray.stages.codec import decode_posting_blocks

    rng = np.random.default_rng(123)
    rows = table.to_pylist()
    sample = rng.choice(len(rows), size=min(200, len(rows)), replace=False)
    for i in sample:
        row = rows[int(i)]
        ids, tfs, _ = decode_posting_blocks(row["blocks"])
        j = int(rng.integers(0, len(ids)))
        toks = tokenize(sorted_texts[int(ids[j])])
        assert toks.count(row["term"]) == int(tfs[j])


def test_distributed_scoring_matches_driver(ray_session, built_index):
    """The doc-range scorer pool (distributed accumulate + top-k) must be
    bit-identical to driver-side scoring at every granularity, including the
    batch path (ranges are conv-aligned and disjoint, so the merged top-k is
    exact under the same tie-break)."""
    from pageindex_ray.pipelines.search import SearchEngine

    e1 = SearchEngine(built_index["index_dir"], num_shards=2)
    e2 = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        queries = _queries(built_index)
        for _, qtext in queries:
            for gran in ("turn", "conv", "segment"):
                assert e1.search(qtext, k=10, granularity=gran) == e2.search(
                    qtext, k=10, granularity=gran
                ), (qtext, gran)
        for gran in ("turn", "conv", "segment"):
            b1 = e1.search_batch(queries, k=10, granularity=gran)
            b2 = e2.search_batch(queries, k=10, granularity=gran)
            assert b1.equals(b2), gran
        # max-aggregation rollups: distributed == driver on both rollup
        # granularities (per-group max is range-local; ranges disjoint)
        for gran in ("conv", "segment"):
            bm1 = e1.search_batch(queries, k=10, granularity=gran, agg="max")
            bm2 = e2.search_batch(queries, k=10, granularity=gran, agg="max")
            assert bm1.equals(bm2), f"{gran}/max"
            # max of per-turn scores <= sum (all contribs positive): the two
            # aggregations must genuinely differ somewhere on this corpus
            assert not bm1.equals(
                e1.search_batch(queries, k=10, granularity=gran)
            ), f"{gran}: max rollup degenerated to sum"
        # use_wand with a scorer pool runs per-range clamped WAND (bounds
        # are range-independent, ranges disjoint -> exact merge): must equal
        # BOTH the driver exhaustive result and the driver WAND result
        bw = e2.search_batch(queries, k=10, use_wand=True)
        assert bw.equals(e1.search_batch(queries, k=10))
        assert bw.equals(e1.search_batch(queries, k=10, use_wand=True))
        for _, qtext in queries[:10]:
            assert e2.search(qtext, k=10, use_wand=True) == e1.search(qtext, k=10, use_wand=True)
        import pytest

        with pytest.raises(ValueError, match="granularity"):
            e1.search_batch(queries, k=10, granularity="paragraph")
    finally:
        e1.shutdown()
        e2.shutdown()


def test_search_batch_granularity_matches_per_query(ray_session, built_index):
    """search_batch must honor conv/segment granularity on BOTH paths
    (scorers present and absent) — round 2's fallback silently returned
    turn rows. Batch rows must equal the per-query search() results."""
    from pageindex_ray.pipelines.search import SearchEngine

    queries = _queries(built_index)[:12]
    for scorers in (0, 3):
        eng = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=scorers)
        try:
            for gran in ("conv", "segment"):
                tbl = eng.search_batch(queries, k=5, granularity=gran)
                assert "doc_id" not in tbl.column_names
                rows_by_qid = {}
                for row in tbl.to_pylist():
                    rows_by_qid.setdefault(row["query_id"], []).append(row)
                for qid, qtext in queries:
                    want = eng.search(qtext, k=5, granularity=gran)
                    got = rows_by_qid.get(qid, [])
                    assert len(got) == len(want), (qid, gran, scorers)
                    for g, w in zip(got, want):
                        assert g["conv_id"] == w["conv_id"]
                        assert abs(g["score"] - w["score"]) < 1e-12
                        if gran == "segment":
                            assert g["seg_start"] == w["seg_start"]
        finally:
            eng.shutdown()


def test_segment_rollup_matches_oracle(engine, built_index, oracle_index):
    """Segment granularity (contiguous 4-turn spans) must equal the oracle's
    per-segment score sums with the (score desc, conv asc, seg asc) tie-break."""
    from collections import defaultdict

    from pageindex_ray.oracle.bm25 import score_all

    for _, qtext in _queries(built_index):
        got = engine.search(qtext, k=10, granularity="segment")
        docs, scores = score_all(oracle_index, qtext)
        agg = defaultdict(float)
        for d, s in zip(docs, scores):
            conv = oracle_index.conv_ids[oracle_index.doc_conv[d]]
            turn = int(oracle_index.turn_idx[d])
            agg[(conv, (turn // 4) * 4)] += s
        want = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:10]
        assert [(r["conv_id"], r["seg_start"]) for r in got] == [k for k, _ in want]
        for r, (_, s) in zip(got, want):
            assert abs(r["score"] - s) <= 1e-9 * max(1.0, abs(s))


def test_range_scorer_sort_path_matches_dense(ray_session, built_index):
    """The sort-based accumulation fallback (ranges too wide for a dense
    buffer) must be bit-identical to the dense scatter-add path."""
    import numpy as np

    from pageindex_ray.pipelines.search import SearchEngine
    from pageindex_ray.state.scorers import make_scorer_pool

    e = SearchEngine(built_index["index_dir"], num_shards=2)
    idx_dir = built_index["index_dir"]
    dense_pool = make_scorer_pool(e.shards, idx_dir, e.conv_bases, e.n_docs, 3)
    sort_pool = make_scorer_pool(
        e.shards, idx_dir, e.conv_bases, e.n_docs, 3, dense_max_range=0
    )
    try:
        for _, qtext in _queries(built_index):
            terms = e._term_idfs(sorted(set(qtext.lower().split())))
            if not terms:
                continue
            import ray as _ray

            for gran in ("turn", "conv", "segment"):
                a = _ray.get([s.score.remote(terms, 10, gran) for s in dense_pool])
                b = _ray.get([s.score.remote(terms, 10, gran) for s in sort_pool])
                for pa_, pb_ in zip(a, b):
                    for xa, xb in zip(pa_, pb_):
                        assert np.array_equal(xa, xb), (qtext, gran)
    finally:
        import ray as _ray

        for s in (*dense_pool, *sort_pool):
            _ray.kill(s)
        e.shutdown()


def test_cache_eviction_does_not_lose_results(ray_session, built_index):
    """A decoded-term cache eviction mid-query must never drop terms the
    in-flight query needs (regression: clearing before returning used to
    yield silently empty/partial results once the budget tripped)."""
    from pageindex_ray.pipelines.search import SearchEngine

    ref = SearchEngine(built_index["index_dir"], num_shards=2)
    tiny = SearchEngine(built_index["index_dir"], num_shards=2)
    tiny._cache_budget = 0  # every fill trips the budget
    try:
        for _, qtext in _queries(built_index):
            assert tiny.search(qtext, k=10) == ref.search(qtext, k=10), qtext
    finally:
        ref.shutdown()
        tiny.shutdown()


def test_conv_max_rollup_matches_brute_force(engine, built_index, oracle_index):
    """agg='max' conversation rollup == per-turn oracle scores grouped by
    conv with max, under the (score desc, conv_id asc) tie-break."""
    from pageindex_ray.oracle.bm25 import score_all

    for qid, qtext in _queries(built_index)[:12]:
        docs, scores = score_all(oracle_index, qtext)
        got = engine.search(qtext, k=10, granularity="conv", agg="max")
        if len(docs) == 0:
            assert got == []
            continue
        best: dict[str, float] = {}
        for d, s in zip(docs.tolist(), scores.tolist()):
            conv = str(oracle_index.conv_ids[int(oracle_index.doc_conv[d])])
            if conv not in best or s > best[conv]:
                best[conv] = s
        golden = sorted(best.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert [r["conv_id"] for r in got] == [c for c, _ in golden], (qid, qtext)
        for r, (_, sc) in zip(got, golden):
            assert r["score"] == pytest.approx(sc, rel=1e-9)


def _brute_boolean(oracle_index, must, should, must_not, k=10):
    """Golden boolean top-k from the oracle postings dict: membership sets
    for must/must_not, scores from score_all over must+should."""
    from pageindex_ray.oracle.bm25 import score_all

    docs, scores = score_all(oracle_index, " ".join([*must, *should]))
    if len(docs) == 0:
        return []
    keep = np.ones(len(docs), dtype=bool)
    empty = np.empty(0, dtype=np.int64)
    for t in must:
        keep &= np.isin(docs, oracle_index.postings.get(t, (empty,))[0])
    for t in must_not:
        keep &= ~np.isin(docs, oracle_index.postings.get(t, (empty,))[0])
    docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def test_boolean_search_matches_brute_force(engine, built_index, oracle_index):
    """Driver-path boolean retrieval == oracle-postings brute force under
    the classify_tokens driver-gate rule; must_not must genuinely exclude
    docs somewhere on this corpus."""
    from pageindex_ray.pipelines.boolean import classify_tokens

    nonempty = 0
    for qid, qtext in _queries(built_index):
        must, should, must_not = classify_tokens(tokenize(qtext))
        if not (must or should):
            continue
        got = engine.boolean_search(must=must, should=should, must_not=must_not, k=10)
        golden = _brute_boolean(oracle_index, must, should, must_not)
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, must, must_not)
        for r, (_, sc) in zip(got, golden):
            assert r["score"] == pytest.approx(sc, rel=1e-9)
        nonempty += bool(golden)
    assert nonempty >= 10


def test_boolean_negation_bites(engine, built_index, oracle_index):
    """Constructed case where must_not demonstrably changes the result: take
    a plain query's #1 doc, must_not one of its terms the #2 doc lacks —
    the old #1 must vanish and the remainder must match brute force."""
    import pyarrow.dataset as pads

    qtext = next(q for _, q in _queries(built_index) if engine.search(q, k=2))
    top = engine.search(qtext, k=10)
    assert len(top) >= 2
    dm = pads.dataset(built_index["index_dir"] + "/docmap").to_table()
    src = pq.read_table(built_index["transcripts"])
    text_of = {
        (c, t): x
        for c, t, x in zip(
            src.column("conv_id").to_pylist(),
            src.column("turn_idx").to_pylist(),
            src.column("text").to_pylist(),
        )
    }
    t1 = set(tokenize(text_of[(top[0]["conv_id"], top[0]["turn_idx"])]))
    t2 = set(tokenize(text_of[(top[1]["conv_id"], top[1]["turn_idx"])]))
    neg = sorted(t1 - t2 - set(tokenize(qtext)))[0]  # in doc1, not doc2, not scored
    got = engine.boolean_search(should=[qtext], must_not=[neg], k=10)
    got_ids = [r["doc_id"] for r in got]
    assert top[0]["doc_id"] not in got_ids
    assert got_ids and got_ids[0] == top[1]["doc_id"]
    golden = _brute_boolean(oracle_index, [], sorted(set(tokenize(qtext))), [neg])
    assert got_ids == [d for d, _ in golden]


def test_boolean_edge_cases(engine):
    # contradiction: same term must and must_not
    assert engine.boolean_search(must=["the"], must_not=["the"]) == []
    # absent must term kills the query even with live should terms
    assert engine.boolean_search(must=["zzzabsent"], should=["the"]) == []
    # empty clauses
    assert engine.boolean_search() == []
    # should-only == plain search (no filters)
    plain = engine.search("the", k=10)
    should_only = engine.boolean_search(should=["the"], k=10)
    assert [r["doc_id"] for r in should_only] == [r["doc_id"] for r in plain]
    # must-only: every hit contains the term; scores = plain single-term
    must_only = engine.boolean_search(must=["the"], k=10)
    assert [r["doc_id"] for r in must_only] == [r["doc_id"] for r in plain]


def test_boolean_distributed_matches_driver(ray_session, built_index):
    """Scorer-pool boolean (RangeScorer.boolean_many) must be bit-identical
    to the driver path, single and batch forms."""
    from pageindex_ray.pipelines.boolean import classify_tokens
    from pageindex_ray.pipelines.search import SearchEngine

    e1 = SearchEngine(built_index["index_dir"], num_shards=2)
    e2 = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        assert e2.scorers and not e1.scorers
        batch = []
        for qid, qtext in _queries(built_index):
            must, should, must_not = classify_tokens(tokenize(qtext))
            batch.append((qid, must, should, must_not))
            r1 = e1.boolean_search(must=must, should=should, must_not=must_not, k=10)
            r2 = e2.boolean_search(must=must, should=should, must_not=must_not, k=10)
            assert r1 == r2, (qid, must, must_not)
        b1 = e1.boolean_search_batch(batch, k=10)
        b2 = e2.boolean_search_batch(batch, k=10)
        assert b1.equals(b2)
        # batch == singles on the driver path
        rows = []
        for qid, must, should, must_not in batch:
            for r in e1.boolean_search(must=must, should=should, must_not=must_not, k=10):
                rows.append((qid, r["rank"], r["doc_id"]))
        assert [(r["query_id"], r["rank"], r["doc_id"]) for r in b1.to_pylist()] == rows
    finally:
        e1.shutdown()
        e2.shutdown()
