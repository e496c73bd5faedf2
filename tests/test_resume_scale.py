"""Resume (FIXTURES.md F5) and parallelism-invariance (SURVEY.md §5.2) tests."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from pageindex_ray.config import BuildConfig
from pageindex_ray.pipelines.build import build_index


def _postings_content(index_dir):
    """Order-insensitive LOGICAL content of the postings: per-term merged
    posting lists (salted hot terms have one row per sub-partition — merge
    them and sum the partial df/cf so physically different layouts with the
    same logical content compare equal)."""
    from pageindex_ray.stages.codec import decode_posting_blocks

    table = pads.dataset(os.path.join(index_dir, "postings")).to_table()
    acc: dict[str, list] = {}
    for row in table.to_pylist():
        ids, tfs, dls = decode_posting_blocks(row["blocks"])
        entry = acc.setdefault(row["term"], [0, 0, [], [], []])
        entry[0] += row["df"]
        entry[1] += row["cf"]
        entry[2].append(ids)
        entry[3].append(tfs)
        entry[4].append(dls)
    out = {}
    for term, (df, cf, ids_l, tfs_l, dls_l) in acc.items():
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        order = np.argsort(ids)
        out[term] = (df, cf, ids[order].tolist(), tfs[order].tolist(), dls[order].tolist())
    return out


def test_resume_skips_completed_and_matches(ray_session, tiny_corpus, tmp_path):
    cfg = BuildConfig(num_partitions=8)
    full_dir = str(tmp_path / "full")
    r1 = build_index(tiny_corpus["transcripts"], full_dir, cfg)
    assert r1["partitions_built"] > 0

    # simulate an interrupted build: delete _SUCCESS + a strict subset of parts
    os.unlink(os.path.join(full_dir, "_SUCCESS"))
    removed = 0
    for pid in (1, 3, 5):
        shard = os.path.join(full_dir, "postings", f"part-{pid:05d}.parquet")
        if os.path.exists(shard):
            os.unlink(shard)
            removed += 1
    assert removed > 0
    golden = None
    uninterrupted = str(tmp_path / "clean")
    build_index(tiny_corpus["transcripts"], uninterrupted, cfg)
    golden = _postings_content(uninterrupted)

    r2 = build_index(tiny_corpus["transcripts"], full_dir, cfg)
    assert r2["partitions_skipped"] > 0  # valid partitions were not rebuilt
    assert os.path.exists(os.path.join(full_dir, "_SUCCESS"))
    assert _postings_content(full_dir) == golden


def test_fingerprint_invalidates_on_config_change(ray_session, tiny_corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(tiny_corpus["transcripts"], d, BuildConfig(num_partitions=4))
    r = build_index(tiny_corpus["transcripts"], d, BuildConfig(num_partitions=4, k1=1.2))
    # changed scoring config -> nothing skippable, full rebuild
    assert r["partitions_skipped"] == 0


def test_index_content_invariant_to_parallelism(ray_session, tiny_corpus, tmp_path):
    """Same input at different partition counts / batch sizes -> identical
    logical postings and identical golden query results."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.search import SearchEngine

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(tiny_corpus["transcripts"], a, BuildConfig(num_partitions=2, tokenize_batch_size=512))
    build_index(tiny_corpus["transcripts"], b, BuildConfig(num_partitions=16, tokenize_batch_size=4096))

    ca = {t: v[:2] + tuple(map(tuple, v[2:])) for t, v in _postings_content(a).items()}
    cb = {t: v[:2] + tuple(map(tuple, v[2:])) for t, v in _postings_content(b).items()}
    assert ca == cb

    qa = SearchEngine(a, num_shards=2)
    qb = SearchEngine(b, num_shards=4)
    qt = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    ra = qa.search_batch(queries, k=10).to_pylist()
    rb = qb.search_batch(queries, k=10).to_pylist()
    assert ra == rb
    qa.shutdown()
    qb.shutdown()


def test_sort_groupby_reduce_matches_direct(ray_session, tiny_corpus, tmp_path):
    """The sort_groupby fallback reduce (streaming shuffle for wave sizes
    beyond object-store capacity) must produce the identical logical index
    and identical golden query results as the default direct reduce."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.search import SearchEngine

    a = str(tmp_path / "direct")
    b = str(tmp_path / "sorted")
    build_index(tiny_corpus["transcripts"], a, BuildConfig(num_partitions=4))
    build_index(
        tiny_corpus["transcripts"], b,
        BuildConfig(num_partitions=4, reduce_strategy="sort_groupby"),
    )
    ca = {t: v[:2] + tuple(map(tuple, v[2:])) for t, v in _postings_content(a).items()}
    cb = {t: v[:2] + tuple(map(tuple, v[2:])) for t, v in _postings_content(b).items()}
    assert ca == cb

    qa = SearchEngine(a, num_shards=2)
    qb = SearchEngine(b, num_shards=2)
    qt = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    assert qa.search_batch(queries, k=10).to_pylist() == qb.search_batch(queries, k=10).to_pylist()
    qa.shutdown()
    qb.shutdown()


def test_auto_reduce_strategy_switch(ray_session, tiny_corpus, tmp_path):
    """reduce_strategy='auto' (the default) must resolve to direct while the
    estimated packed intermediate fits the budget, and fall back to
    sort_groupby when it exceeds it — with identical logical postings."""
    a = str(tmp_path / "auto_direct")
    b = str(tmp_path / "auto_fallback")
    ra = build_index(
        tiny_corpus["transcripts"], a, BuildConfig(num_partitions=4, reduce_strategy="auto")
    )
    assert ra["reduce_strategy"] == "direct"
    assert ra["reduce_strategy_info"]["mode"] == "auto"
    assert ra["reduce_strategy_info"]["upper_bound_bytes"] > 0
    rb = build_index(
        tiny_corpus["transcripts"],
        b,
        BuildConfig(num_partitions=4, reduce_strategy="auto", packed_budget_bytes=16),
    )
    assert rb["reduce_strategy"] == "sort_groupby"
    assert _postings_content(a) == _postings_content(b)


def test_wave_merge_matches_monolithic(ray_session, tiny_corpus, tmp_path):
    """Wave builds (conv-ordered splits with doc_base offsets) merged via
    merge_indexes must equal a monolithic build: identical logical postings
    AND bit-identical query results (exhaustive and WAND) — the 10^12-turn
    wave path of the north_rule's resumable-build requirement."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.merge import merge_indexes
    from pageindex_ray.pipelines.search import SearchEngine

    src = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(src.column("conv_id").to_pylist()))
    mid = convs[len(convs) // 2]
    import pyarrow.compute as pc

    w1 = src.filter(pc.less(src.column("conv_id"), mid))
    w2 = src.filter(pc.greater_equal(src.column("conv_id"), mid))
    p1, p2 = str(tmp_path / "w1.parquet"), str(tmp_path / "w2.parquet")
    pq.write_table(w1, p1)
    pq.write_table(w2, p2)

    cfg = BuildConfig(num_partitions=4)
    full_dir = str(tmp_path / "full")
    a_dir, b_dir, m_dir = str(tmp_path / "wa"), str(tmp_path / "wb"), str(tmp_path / "merged")
    build_index(tiny_corpus["transcripts"], full_dir, cfg)
    ra = build_index(p1, a_dir, cfg)
    build_index(p2, b_dir, cfg, doc_base=ra["n_docs"])
    rep = merge_indexes([a_dir, b_dir], m_dir)
    assert rep["n_waves"] == 2

    assert _postings_content(full_dir) == _postings_content(m_dir)

    qf = SearchEngine(full_dir, num_shards=2)
    qm = SearchEngine(m_dir, num_shards=2)
    qt = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    try:
        assert qf.search_batch(queries, k=10).to_pylist() == qm.search_batch(queries, k=10).to_pylist()
        for _, qtext in queries[:15]:
            assert qf.search(qtext, k=10, use_wand=True) == qm.search(qtext, k=10, use_wand=True)
            assert qf.search(qtext, k=10, granularity="conv") == qm.search(qtext, k=10, granularity="conv")
    finally:
        qf.shutdown()
        qm.shutdown()


def test_merge_is_associative_and_serves_distributed(ray_session, tiny_corpus, tmp_path):
    """Merging a merged index with a further wave equals the monolithic
    build (multi-level merge), and the distributed scorer pool serves a
    merged index bit-identically to driver scoring."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.merge import merge_indexes
    from pageindex_ray.pipelines.search import SearchEngine

    src = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(src.column("conv_id").to_pylist()))
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    parts = [
        src.filter(pc.less(src.column("conv_id"), c1)),
        src.filter(pc.and_(pc.greater_equal(src.column("conv_id"), c1), pc.less(src.column("conv_id"), c2))),
        src.filter(pc.greater_equal(src.column("conv_id"), c2)),
    ]
    cfg = BuildConfig(num_partitions=4)
    dirs, base = [], 0
    for i, w in enumerate(parts):
        p = str(tmp_path / f"w{i}.parquet")
        pq.write_table(w, p)
        d = str(tmp_path / f"i{i}")
        r = build_index(p, d, cfg, doc_base=base)
        base += r["n_docs"]
        dirs.append(d)
    m12 = str(tmp_path / "m12")
    merge_indexes(dirs[:2], m12)
    m123 = str(tmp_path / "m123")
    merge_indexes([m12, dirs[2]], m123)  # multi-level
    full = str(tmp_path / "mono")
    build_index(tiny_corpus["transcripts"], full, cfg)
    assert _postings_content(m123) == _postings_content(full)

    qt = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    e_driver = SearchEngine(m123, num_shards=2)
    e_dist = SearchEngine(m123, num_shards=2, num_scorers=3)
    e_full = SearchEngine(full, num_shards=2)
    try:
        b1 = e_driver.search_batch(queries, k=10)
        assert b1.equals(e_dist.search_batch(queries, k=10))
        assert b1.equals(e_full.search_batch(queries, k=10))
    finally:
        e_driver.shutdown()
        e_dist.shutdown()
        e_full.shutdown()


def test_wave_index_doc_base_distributed_scoring(ray_session, tiny_corpus, tmp_path):
    """Serving a WAVE index (doc_base > 0) with a scorer pool must match
    driver scoring — round 2 sized the last range with the bare doc COUNT,
    which for doc_base > 0 either crashed at actor init or silently dropped
    every doc with id >= n_docs from distributed results."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.search import SearchEngine

    src = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(src.column("conv_id").to_pylist()))
    mid = convs[len(convs) // 2]
    w2 = src.filter(pc.greater_equal(src.column("conv_id"), mid))
    p2 = str(tmp_path / "wave2.parquet")
    pq.write_table(w2, p2)
    wave_dir = str(tmp_path / "wave2_idx")
    # nonzero base, deliberately LARGER than this wave's n_docs so the
    # round-2 hi = n_docs bug would produce negative ranges (crash)
    base = src.num_rows + 500
    build_index(p2, wave_dir, BuildConfig(num_partitions=4), doc_base=base)

    e_driver = SearchEngine(wave_dir, num_shards=2)
    e_dist = SearchEngine(wave_dir, num_shards=2, num_scorers=3)
    try:
        qt = pq.read_table(tiny_corpus["queries"])
        queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
        nonempty = 0
        for _, qtext in queries:
            for gran in ("turn", "conv", "segment"):
                want = e_driver.search(qtext, k=10, granularity=gran)
                assert e_dist.search(qtext, k=10, granularity=gran) == want, (qtext, gran)
                nonempty += bool(want)
        assert nonempty > 0  # the wave actually matches queries
        assert e_driver.search_batch(queries, k=10).equals(e_dist.search_batch(queries, k=10))
        # every returned doc_id must carry the base offset
        docs = e_dist.search_batch(queries, k=10).column("doc_id").to_pylist()
        assert docs and min(docs) >= base
    finally:
        e_driver.shutdown()
        e_dist.shutdown()


def test_append_wave_matches_monolithic(ray_session, tiny_corpus, tmp_path):
    """append_wave (build-new-wave + merge in one call) over a 2/3 : 1/3
    conv split must equal the monolithic build — logical postings AND
    queries — and leave a resumable intermediate wave dir."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.merge import append_wave
    from pageindex_ray.pipelines.search import SearchEngine

    src = pq.read_table(tiny_corpus["transcripts"])
    convs = sorted(set(src.column("conv_id").to_pylist()))
    cut = convs[2 * len(convs) // 3]
    head = src.filter(pc.less(src.column("conv_id"), cut))
    tail = src.filter(pc.greater_equal(src.column("conv_id"), cut))
    p_head, p_tail = str(tmp_path / "head.parquet"), str(tmp_path / "tail.parquet")
    pq.write_table(head, p_head)
    pq.write_table(tail, p_tail)

    cfg = BuildConfig(num_partitions=4)
    base_dir = str(tmp_path / "base")
    out_dir = str(tmp_path / "appended")
    full_dir = str(tmp_path / "mono")
    build_index(p_head, base_dir, cfg)
    report = append_wave(base_dir, p_tail, out_dir)
    assert report["n_waves"] == 2 and report["wave"]["n_docs"] == tail.num_rows
    assert os.path.isdir(out_dir + ".wave")  # resumable intermediate
    build_index(tiny_corpus["transcripts"], full_dir, cfg)
    assert _postings_content(out_dir) == _postings_content(full_dir)

    qa = SearchEngine(out_dir, num_shards=2)
    qm = SearchEngine(full_dir, num_shards=2)
    try:
        qt = pq.read_table(tiny_corpus["queries"])
        queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
        assert qa.search_batch(queries, k=10).equals(qm.search_batch(queries, k=10))
    finally:
        qa.shutdown()
        qm.shutdown()


def test_index_content_invariant_to_block_size(ray_session, tiny_corpus, tmp_path):
    """block_size only changes the physical block split (and WAND bound
    granularity), never logical postings or any scorer's results — down to
    the degenerate one-posting-per-block layout."""
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.search import SearchEngine

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(tiny_corpus["transcripts"], a, BuildConfig(num_partitions=4, block_size=1))
    build_index(tiny_corpus["transcripts"], b, BuildConfig(num_partitions=4, block_size=997))
    assert _postings_content(a) == _postings_content(b)

    qa = SearchEngine(a, num_shards=2, num_scorers=2)
    qb = SearchEngine(b, num_shards=2)
    try:
        qt = pq.read_table(tiny_corpus["queries"])
        queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
        for wand in (False, True):
            assert qa.search_batch(queries, k=10, use_wand=wand).equals(
                qb.search_batch(queries, k=10, use_wand=wand)
            ), wand
    finally:
        qa.shutdown()
        qb.shutdown()


def test_resume_scan_fast_path_skips_rehash_but_catches_tamper(
    ray_session, tiny_corpus, tmp_path
):
    """Round 4: scan_completed_partitions trusts a committed shard whose
    (size, mtime_ns) still match its lineage WITHOUT re-reading it (a
    resumed 100-TB build must not re-read the whole index at startup), and
    still md5-rejects a shard whose stat changed. Pre-round-4 lineages
    (no stat fields) keep the full-hash path."""
    import json
    import os
    import unittest.mock as mock

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.stages import postings as P

    idx = str(tmp_path / "idx")
    build_index(tiny_corpus["transcripts"], idx, BuildConfig(num_partitions=4))
    fp = load_meta(idx)["fingerprint"]

    # fast path: no shard content is read (md5 would blow up if called)
    with mock.patch.object(P.hashlib, "md5", side_effect=AssertionError("re-hash!")):
        done = P.scan_completed_partitions(idx, fp)
    assert len(done) > 0

    # tamper: rewrite one shard (stat changes) -> md5 fallback rejects it
    victim = sorted(done)[0]
    shard = os.path.join(idx, "postings", f"part-{victim:05d}.parquet")
    with open(shard, "r+b") as f:
        f.write(b"\x00" * 16)
    done2 = P.scan_completed_partitions(idx, fp)
    assert victim not in done2
    assert done2 == done - {victim}

    # pre-round-4 lineage (stat fields stripped): falls back to md5 and
    # still validates the untouched shards
    meta_dir = os.path.join(idx, "_meta")
    for name in os.listdir(meta_dir):
        if not name.startswith("part-"):
            continue
        p = os.path.join(meta_dir, name)
        with open(p) as f:
            lin = json.load(f)
        lin.pop("file_size", None)
        lin.pop("file_mtime_ns", None)
        with open(p, "w") as f:
            json.dump(lin, f)
    done3 = P.scan_completed_partitions(idx, fp)
    assert done3 == done - {victim}


def test_resume_scan_paranoid_env_forces_full_hash(ray_session, tiny_corpus, tmp_path):
    """GRAFT_RESUME_PARANOID=1 bypasses the stat fast path: a same-size
    mtime-preserved swap (cp -p / restore) is caught by the forced md5
    (ADVICE r4 — opt-in integrity for migration scenarios)."""
    import os
    import unittest.mock as mock

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.stages import postings as P

    idx = str(tmp_path / "idxp")
    build_index(tiny_corpus["transcripts"], idx, BuildConfig(num_partitions=4))
    fp = load_meta(idx)["fingerprint"]
    done = P.scan_completed_partitions(idx, fp)
    victim = sorted(done)[0]
    shard = os.path.join(idx, "postings", f"part-{victim:05d}.parquet")

    # mtime-preserving same-size corruption: flip bytes, restore stat
    st = os.stat(shard)
    with open(shard, "r+b") as f:
        f.write(b"\x00" * 16)
    os.utime(shard, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert os.stat(shard).st_size == st.st_size

    # default: stat fast path trusts it (the documented tradeoff)
    assert victim in P.scan_completed_partitions(idx, fp)
    # paranoid: forced md5 rejects it
    with mock.patch.dict(os.environ, {"GRAFT_RESUME_PARANOID": "1"}):
        done_p = P.scan_completed_partitions(idx, fp)
    assert victim not in done_p
    assert done_p == done - {victim}
