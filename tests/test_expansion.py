"""Prefix / fuzzy term expansion: dictionary scans + expanded scoring."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.oracle.bm25 import score_all
from pageindex_ray.tokenizer import tokenize


@pytest.fixture(scope="module")
def engine(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(built_index["index_dir"], num_shards=3)
    yield eng
    eng.shutdown()


def _lev(a: str, b: str) -> int:
    """Full Levenshtein DP — the independent golden for the engine's
    lcp/lcs shortcut."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _golden_expansion(oracle_index, match, max_expansions=64):
    dfs = {t: len(ids) for t, (ids, _) in oracle_index.postings.items() if match(t)}
    ranked = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_expansions]
    return sorted(t for t, _ in ranked)


def _golden_topk(oracle_index, terms, k=10):
    if not terms:
        return []
    docs, scores = score_all(oracle_index, " ".join(terms))
    if not len(docs):
        return []
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def _prefixes(built_index):
    qt = pq.read_table(built_index["queries"])
    out = []
    for qid, text in zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()):
        toks = sorted(set(tokenize(text)))
        if toks:
            out.append((qid, toks[0][:4]))
    return out


def _fuzzy_terms(built_index):
    qt = pq.read_table(built_index["queries"])
    out = []
    for qid, text in zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()):
        cands = [t for t in sorted(set(tokenize(text))) if len(t) >= 5]
        if cands:
            out.append((qid, cands[0]))
    return out


def test_prefix_expansion_matches_dictionary(engine, built_index, oracle_index):
    multi = 0
    for qid, pfx in _prefixes(built_index):
        got = engine.expand_prefix_terms(pfx)
        want = _golden_expansion(oracle_index, lambda t: t.startswith(pfx))
        assert got == want, (qid, pfx)
        multi += len(got) > 1
    assert multi >= 10  # prefixes must genuinely expand on this corpus


def test_fuzzy_expansion_matches_dp_levenshtein(engine, built_index, oracle_index):
    multi = 0
    for qid, qt in _fuzzy_terms(built_index):
        got = engine.expand_fuzzy_terms(qt)
        want = _golden_expansion(oracle_index, lambda t: _lev(t, qt) <= 1)
        assert got == want, (qid, qt)
        multi += len(got) > 1
    assert multi >= 5


def test_expansion_cap_keeps_highest_df(engine, oracle_index):
    full = _golden_expansion(oracle_index, lambda t: t.startswith("t"), max_expansions=10**9)
    assert len(full) > 3
    capped = engine.expand_prefix_terms("t", max_expansions=3)
    want = _golden_expansion(oracle_index, lambda t: t.startswith("t"), max_expansions=3)
    assert capped == want and len(capped) == 3


def test_prefix_search_matches_brute_force(engine, built_index, oracle_index):
    for qid, pfx in _prefixes(built_index)[:15]:
        got = engine.prefix_search(pfx, k=10)
        golden = _golden_topk(oracle_index, _golden_expansion(oracle_index, lambda t: t.startswith(pfx)))
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, pfx)
        for r, (_, sc) in zip(got, golden):
            assert r["score"] == pytest.approx(sc, rel=1e-9)


def test_fuzzy_search_matches_brute_force(engine, built_index, oracle_index):
    for qid, qt in _fuzzy_terms(built_index)[:15]:
        got = engine.fuzzy_search(qt, k=10)
        golden = _golden_topk(oracle_index, _golden_expansion(oracle_index, lambda t: _lev(t, qt) <= 1))
        assert [r["doc_id"] for r in got] == [d for d, _ in golden], (qid, qt)


def test_expansion_distributed_matches_driver(ray_session, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    e1 = SearchEngine(built_index["index_dir"], num_shards=2)
    e2 = SearchEngine(built_index["index_dir"], num_shards=2, num_scorers=3)
    try:
        assert e2.scorers and not e1.scorers
        pfx = _prefixes(built_index)
        fz = _fuzzy_terms(built_index)
        for qid, p in pfx[:10]:
            assert e1.prefix_search(p, k=10) == e2.prefix_search(p, k=10), (qid, p)
        assert e1.prefix_search_batch(pfx, k=10).equals(e2.prefix_search_batch(pfx, k=10))
        assert e1.fuzzy_search_batch(fz, k=10).equals(e2.fuzzy_search_batch(fz, k=10))
        # batch == singles
        b = e1.prefix_search_batch(pfx, k=10)
        rows = []
        for qid, p in pfx:
            for r in e1.prefix_search(p, k=10):
                rows.append((qid, r["rank"], r["doc_id"]))
        assert [(r["query_id"], r["rank"], r["doc_id"]) for r in b.to_pylist()] == rows
    finally:
        e1.shutdown()
        e2.shutdown()


def test_suggest_matches_dictionary(engine, built_index, oracle_index):
    dfs = {t: len(ids) for t, (ids, _) in oracle_index.postings.items()}
    for qid, pfx in _prefixes(built_index)[:20]:
        p3 = pfx[:3]
        got = engine.suggest(p3, k=10)
        want = sorted(
            ((t, df) for t, df in dfs.items() if t.startswith(p3)),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        assert [(r["term"], r["df"]) for r in got] == want, (qid, p3)
    # batch == singles
    items = [(qid, p[:3]) for qid, p in _prefixes(built_index)]
    b = engine.suggest_batch(items, k=10)
    rows = []
    for qid, p in items:
        for r, s in enumerate(engine.suggest(p, k=10)):
            rows.append((qid, r, s["term"], s["df"]))
    assert [
        (r["query_id"], r["rank"], r["term"], r["df"]) for r in b.to_pylist()
    ] == rows


def test_expansion_edge_cases(engine):
    with pytest.raises(ValueError):
        engine.expand_prefix_terms("")
    with pytest.raises(ValueError):
        engine.fuzzy_search("")
    # absent everything
    assert engine.prefix_search("zzzzqqq") == []
    assert engine.expand_fuzzy_terms("zzzzqqqxxx") == []
    # single-char fuzzy against short vocab terms: engine == DP golden shape
    got = engine.expand_fuzzy_terms("a", max_expansions=10**9)
    for t in got:
        assert _lev(t, "a") <= 1


def _regex_patterns(built_index):
    qt = pq.read_table(built_index["queries"])
    out = []
    for qid, text in zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()):
        toks = sorted(set(tokenize(text)))
        if toks:
            out.append((qid, f"{toks[0][:2]}.*{toks[0][-1]}"))
    return out


def test_regex_expansion_matches_python_re(engine, built_index, oracle_index):
    import re

    multi = 0
    for qid, pat in _regex_patterns(built_index):
        got = engine.expand_regex_terms(pat)
        rx = re.compile(f"^(?:{pat})$")
        want = _golden_expansion(oracle_index, lambda t: rx.match(t) is not None)
        assert got == want, (qid, pat)
        multi += len(got) > 1
    assert multi >= 10  # patterns must genuinely expand on this corpus


def test_regex_is_whole_term_anchored(engine, oracle_index):
    # 'h.' must match ONLY 2-char terms starting with h — substring
    # semantics would sweep in every term containing h
    got = engine.expand_regex_terms("h.", max_expansions=10**9)
    for t in got:
        assert len(t) == 2 and t[0] == "h", t
    import re

    rx = re.compile(r"^(?:h.)$")
    want = _golden_expansion(
        oracle_index, lambda t: rx.match(t) is not None, max_expansions=10**9
    )
    assert got == want


def test_regex_search_matches_brute_force(engine, built_index, oracle_index):
    checked = 0
    for qid, pat in _regex_patterns(built_index)[:10]:
        terms = engine.expand_regex_terms(pat)
        got = [(r["doc_id"], r["score"]) for r in engine.regex_search(pat, k=10)]
        want = _golden_topk(oracle_index, terms, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], (qid, pat)
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=1e-9
        )
        checked += 1
    assert checked == 10


def test_regex_edge_cases(engine):
    with pytest.raises(ValueError):
        engine.expand_regex_terms("")
    with pytest.raises(Exception):
        engine.expand_regex_terms("(unclosed")  # invalid RE2: raises driver-side
    assert engine.regex_search("zzz+qq.*x") == []
