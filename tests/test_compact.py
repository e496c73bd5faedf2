"""Compaction: physical expunge with recomputed statistics."""

import math
import os
import shutil
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from pageindex_ray.tokenizer import tokenize


@pytest.fixture(scope="module")
def compacted(ray_session, built_index, tmp_path_factory):
    """Tombstone doc_id % 5 == 0 on a copy, then compact it."""
    from pageindex_ray.pipelines.build import load_meta
    from pageindex_ray.pipelines.compact import compact_index
    from pageindex_ray.pipelines.tombstones import add_tombstones

    root = tmp_path_factory.mktemp("compact")
    tomb = str(root / "tomb")
    out = str(root / "compacted")
    shutil.copytree(built_index["index_dir"], tomb)
    for sub in ("attrs", "stored"):
        p = os.path.join(tomb, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    n = load_meta(tomb)["n_docs"]
    add_tombstones(tomb, np.arange(0, n, 5))
    report = compact_index(tomb, out)
    return {"tomb": tomb, "out": out, "report": report, "n_docs": n}


def _live_golden(built_index, qtext, k=10):
    """Independent BM25 golden over the corpus with doc_id % 5 == 0 removed
    from docs AND stats, original (sparse) doc ids kept."""
    src = pq.read_table(built_index["transcripts"])
    conv = np.asarray(src.column("conv_id").to_pylist(), dtype=object)
    turn = src.column("turn_idx").to_numpy().astype(np.int64)
    order = np.lexsort((turn, conv))
    texts = [src.column("text").to_pylist()[i] for i in order]
    toks = [tokenize(t) for t in texts]
    live = [d for d in range(len(toks)) if d % 5 != 0]
    n = len(live)
    dls = {d: len(toks[d]) for d in live}
    avgdl = sum(dls.values()) / n
    postings: dict[str, dict[int, int]] = defaultdict(dict)
    for d in live:
        for t in toks[d]:
            postings[t][d] = postings[t].get(d, 0) + 1
    qterms = sorted(set(tokenize(qtext)))
    acc: dict[int, float] = {}
    for t in qterms:
        pl = postings.get(t)
        if not pl:
            continue
        idf = math.log((n - len(pl) + 0.5) / (len(pl) + 0.5) + 1.0)
        for d, tf in pl.items():
            c = idf * tf * 2.5 / (tf + 1.5 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl))
            acc[d] = acc.get(d, 0.0) + c
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def test_compacted_meta_and_lineage(compacted):
    from pageindex_ray.pipelines.build import load_meta
    from pageindex_ray.pipelines.tombstones import load_tombstones

    m = load_meta(compacted["out"])
    n = compacted["n_docs"]
    n_del = len(np.arange(0, n, 5))
    assert m["n_docs"] == n  # extent preserved (sparse ids)
    assert m["n_docs_live"] == n - n_del
    assert m["avgdl"] == pytest.approx(m["total_tokens"] / m["n_docs_live"])
    assert compacted["report"]["n_expunged"] == n_del
    # compacted index starts with a clean slate: no tombstones carried
    assert len(load_tombstones(compacted["out"])) == 0
    # deleted docs are gone from the docmap
    import pyarrow.dataset as pads

    ids = (
        pads.dataset(os.path.join(compacted["out"], "docmap"))
        .to_table(columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    assert len(ids) == n - n_del and (ids % 5 != 0).all()


def test_compacted_search_matches_live_golden(ray_session, compacted, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(compacted["out"], num_shards=2)
    try:
        qt = pq.read_table(built_index["queries"])
        pairs = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
        for qid, qtext in pairs[:15]:
            got = eng.search(qtext, k=10)
            want = _live_golden(built_index, qtext)
            assert [r["doc_id"] for r in got] == [d for d, _ in want], qid
            for r, (_, sc) in zip(got, want):
                assert r["score"] == pytest.approx(sc, rel=1e-9)
    finally:
        eng.shutdown()


def test_compacted_distributed_and_wand_match(ray_session, compacted, built_index):
    from pageindex_ray.pipelines.search import SearchEngine

    e1 = SearchEngine(compacted["out"], num_shards=2)
    e2 = SearchEngine(compacted["out"], num_shards=2, num_scorers=3)
    try:
        assert e2.scorers and not e1.scorers
        qt = pq.read_table(built_index["queries"])
        pairs = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
        for qid, qtext in pairs[:10]:
            r1 = e1.search(qtext, k=10)
            assert r1 == e2.search(qtext, k=10), qid
            # WAND bounds were recomputed under the live avgdl: identical results
            assert [x["doc_id"] for x in e1.search(qtext, k=10, use_wand=True)] == [
                x["doc_id"] for x in r1
            ], qid
    finally:
        e1.shutdown()
        e2.shutdown()


def test_compaction_guards(ray_session, compacted, built_index, tmp_path):
    from pageindex_ray.pipelines.compact import compact_index
    from pageindex_ray.pipelines.merge import merge_indexes

    with pytest.raises(ValueError, match="NEW index"):
        compact_index(compacted["out"], compacted["out"])
    # round 5: re-compaction is legal WITH fresh tombstones (refresh loop);
    # without any it is a pointless rewrite and still refuses
    with pytest.raises(ValueError, match="no fresh tombstones"):
        compact_index(compacted["out"], str(tmp_path / "again"))
    # round 5: compacted inputs merge fine; PENDING tombstones are what's
    # rejected (merge carries no sidecar and would resurrect deletes)
    from pageindex_ray.pipelines.tombstones import add_tombstones

    import numpy as np

    live_doc = int(
        __import__("pyarrow.parquet", fromlist=["x"]).read_table(
            compacted["out"] + "/docmap"
        ).column("doc_id")[0].as_py()
    )
    add_tombstones(compacted["out"], np.asarray([live_doc]))
    with pytest.raises(ValueError, match="pending tombstones"):
        merge_indexes([compacted["out"]], str(tmp_path / "m"))
