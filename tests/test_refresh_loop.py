"""The continuous-ingest refresh loop (pipelines/refresh.py): generational
appends + tombstones + compaction under an atomic pointer, rank-identical
to a monolithic rebuild at every step."""

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _slices(tpath, tmp_path, n=4):
    t = pq.read_table(tpath)
    convs = sorted(set(t.column("conv_id").to_pylist()))
    cuts = [convs[(i * len(convs)) // n] for i in range(1, n)]
    parts = []
    bounds = [None, *cuts, None]
    for i in range(n):
        lo, hi = bounds[i], bounds[i + 1]
        mask = None
        if lo is not None:
            mask = pc.greater_equal(t.column("conv_id"), lo)
        if hi is not None:
            m2 = pc.less(t.column("conv_id"), hi)
            mask = m2 if mask is None else pc.and_(mask, m2)
        p = str(tmp_path / f"q{i}.parquet")
        pq.write_table(t.filter(mask) if mask is not None else t, p)
        parts.append(p)
    # cumulative corpora for the monolithic twins
    cums = []
    for i in range(1, n + 1):
        p = str(tmp_path / f"cum{i}.parquet")
        mask = pc.less(t.column("conv_id"), bounds[i]) if bounds[i] is not None else None
        pq.write_table(t.filter(mask) if mask is not None else t, p)
        cums.append(p)
    return parts, cums


def _search(idx, queries, k=10):
    from pageindex_ray.pipelines.search import SearchEngine

    eng = SearchEngine(idx, num_shards=2)
    try:
        return eng.search_batch(queries, k=k)
    finally:
        eng.shutdown()


def test_refresh_loop_three_waves_plus_compaction(ray_session, tiny_corpus, tmp_path):
    """init + 3 appended micro-waves + tombstones + 1 compaction, each step
    rank-identical to a monolithic build over the same live corpus; the
    pointer always names a committed generation and old generations prune."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.pipelines.compact import compact_index
    from pageindex_ray.pipelines.refresh import RefreshRunner, current_index
    from pageindex_ray.pipelines.tombstones import add_tombstones

    waves, cums = _slices(tiny_corpus["transcripts"], tmp_path, n=5)
    qs = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qs.column("query_id").to_pylist(), qs.column("text").to_pylist()))
    cfg = BuildConfig(num_partitions=4)

    root = str(tmp_path / "root")
    r = RefreshRunner(root, cfg=cfg, keep_generations=2)
    r.init(waves[0])
    assert os.path.exists(os.path.join(current_index(root), "_SUCCESS"))

    for step in range(1, 4):  # three appended micro-waves
        r.append(waves[step])
        live = current_index(root)
        assert os.path.exists(os.path.join(live, "_SUCCESS"))
        mono = str(tmp_path / f"mono{step}")
        build_index(cums[step], mono, cfg)
        a = _search(live, queries)
        b = _search(mono, queries)
        assert a.equals(b), f"step {step} diverged from monolithic rebuild"
        assert a.num_rows > 0

    # old generations beyond keep_generations are pruned; wave dirs removed
    gens = [d for d in os.listdir(root) if d.startswith("gen-") and "." not in d]
    assert len(gens) <= 2
    assert not [d for d in os.listdir(root) if d.endswith(".wave")]

    # tombstone + compact == monolithic build + same deletes + compact
    n_docs = load_meta(current_index(root))["n_docs"]
    deleted = np.arange(0, n_docs, 7)
    r.delete(deleted)
    before = json.loads(json.dumps(r.status()))
    assert before["deleted_fraction"] > 0
    r.compact()
    after = r.status()
    assert after["pointer"]["kind"] == "compact"
    assert after["deleted_fraction"] == 0
    # n_docs stays the id-space extent; n_docs_live drops by the expunged count
    assert after["n_docs"] == n_docs
    assert after["n_docs_live"] == n_docs - len(deleted)

    mono = str(tmp_path / "monoD")
    build_index(cums[3], mono, cfg)
    add_tombstones(mono, deleted)
    mono_c = str(tmp_path / "monoDC")
    compact_index(mono, mono_c)
    a = _search(current_index(root), queries)
    b = _search(mono_c, queries)
    assert a.equals(b)
    assert a.num_rows > 0

    # the loop CONTINUES past a compaction: appending onto the sparse
    # compacted index must equal a monolithic build over the full corpus
    # with the same deletes, compacted (round 5: merge accepts compacted
    # inputs; re-compaction legal with fresh tombstones)
    r.append(waves[4])
    mono5 = str(tmp_path / "mono5")
    build_index(cums[4], mono5, cfg)
    add_tombstones(mono5, deleted)
    mono5_c = str(tmp_path / "mono5C")
    compact_index(mono5, mono5_c)
    a = _search(current_index(root), queries)
    b = _search(mono5_c, queries)
    assert a.equals(b)

    # and a SECOND delete->compact cycle on the sparse lineage still matches
    n_ext = load_meta(current_index(root))["n_docs"]
    deleted2 = np.arange(1, n_ext, 11)
    deleted2 = np.setdiff1d(deleted2, deleted)
    r.delete(deleted2)
    r.compact()
    add_tombstones(mono5_c, deleted2)
    mono5_cc = str(tmp_path / "mono5CC")
    compact_index(mono5_c, mono5_cc)
    a = _search(current_index(root), queries)
    b = _search(mono5_cc, queries)
    assert a.equals(b)
    assert a.num_rows > 0


def test_refresh_auto_compact_policy(ray_session, tiny_corpus, tmp_path):
    """auto_compact_every fires a compaction on schedule and resets the
    counter; deleted-fraction overflow also triggers one."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import load_meta
    from pageindex_ray.pipelines.refresh import RefreshRunner, current_index

    waves, _ = _slices(tiny_corpus["transcripts"], tmp_path)
    root = str(tmp_path / "root2")
    r = RefreshRunner(root, cfg=BuildConfig(num_partitions=4), auto_compact_every=2)
    r.init(waves[0])
    out1 = r.append(waves[1])
    assert "compaction" not in out1
    out2 = r.append(waves[2])
    # nothing tombstoned -> the scheduled compaction is a SKIP, not a rewrite
    assert out2["compaction"].get("skipped") == "no tombstones"

    # deleted-fraction trigger
    n = load_meta(current_index(root))["n_docs"]
    res = r.delete(np.arange(0, n, 3))  # ~33% > default 25% threshold
    assert "compaction" in res
    assert r.status()["deleted_fraction"] == 0


def test_refresh_init_twice_rejected(ray_session, tiny_corpus, tmp_path):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.refresh import RefreshRunner

    waves, _ = _slices(tiny_corpus["transcripts"], tmp_path)
    root = str(tmp_path / "root3")
    r = RefreshRunner(root, cfg=BuildConfig(num_partitions=4))
    r.init(waves[0])
    with pytest.raises(ValueError, match="already initialized"):
        r.init(waves[0])


def test_auto_compact_counter_survives_process_boundaries(ray_session, tiny_corpus, tmp_path):
    """appends_since_compact is persisted in current.json, so one-append-per-
    CLI-invocation (a fresh RefreshRunner each time — the normal cron shape)
    still fires the Nth-append compaction; a scheduled skip (no tombstones)
    resets the persisted counter without flipping the generation."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.refresh import RefreshRunner, _load_pointer

    waves, _ = _slices(tiny_corpus["transcripts"], tmp_path)
    root = str(tmp_path / "rootp")
    cfg = BuildConfig(num_partitions=4)
    RefreshRunner(root, cfg=cfg, auto_compact_every=2).init(waves[0])
    out1 = RefreshRunner(root, cfg=cfg, auto_compact_every=2).append(waves[1])
    assert "compaction" not in out1
    assert _load_pointer(root)["appends_since_compact"] == 1
    out2 = RefreshRunner(root, cfg=cfg, auto_compact_every=2).append(waves[2])
    assert out2["compaction"].get("skipped") == "no tombstones"
    ptr = _load_pointer(root)
    assert ptr["appends_since_compact"] == 0  # schedule reset by the skip
    assert ptr["generation"] == 2  # ...without a generation flip
    # the returned pointer reflects the post-skip rewrite, not the stale one
    assert out2["pointer"] == ptr


def test_append_crash_between_wave_and_merge_resumes(
    ray_session, tiny_corpus, tmp_path, monkeypatch
):
    """A crash AFTER the wave build but BEFORE the merge commits must leave
    the old generation live (pointer untouched), and the re-run append must
    resume off the committed <out>.wave checkpoint (zero re-tokenization)
    and produce a generation rank-identical to a monolithic rebuild."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines import merge as merge_mod
    from pageindex_ray.pipelines import refresh as refresh_mod
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.refresh import RefreshRunner, _load_pointer

    waves, cums = _slices(tiny_corpus["transcripts"], tmp_path, n=2)
    root = str(tmp_path / "rootc")
    cfg = BuildConfig(num_partitions=4)
    r = RefreshRunner(root, cfg=cfg)
    r.init(waves[0])

    real_merge = merge_mod.merge_indexes

    def exploding_merge(index_dirs, out_dir):
        raise RuntimeError("simulated crash between wave build and merge")

    monkeypatch.setattr(merge_mod, "merge_indexes", exploding_merge)
    with pytest.raises(RuntimeError, match="simulated crash"):
        r.append(waves[1])
    ptr = _load_pointer(root)
    assert ptr["generation"] == 0  # old generation still live
    wave_dir = os.path.join(root, "gen-00001.wave")
    assert os.path.exists(os.path.join(wave_dir, "_SUCCESS"))  # checkpoint kept

    monkeypatch.setattr(merge_mod, "merge_indexes", real_merge)
    out = r.append(waves[1])
    assert out["pointer"]["generation"] == 1
    # the committed wave checkpoint was reused: every partition skipped
    wave_report = out["report"]["wave"]
    assert wave_report["partitions_skipped"] == cfg.num_partitions
    assert not os.path.exists(wave_dir)  # checkpoint cleaned after the flip

    mono = str(tmp_path / "monoc")
    build_index(cums[1], mono, cfg)
    qt = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qt.column("query_id").to_pylist(), qt.column("text").to_pylist()))
    assert _search(refresh_mod.current_index(root), queries).equals(
        _search(mono, queries)
    )


def test_refresh_uninitialized_root_clear_error(tmp_path):
    """Every step on a root without current.json must raise the explicit
    not-initialized ValueError (not a raw FileNotFoundError traceback) —
    the CLI maps ValueError to a clean one-line message + exit 2."""
    from pageindex_ray.pipelines.refresh import RefreshRunner, current_index

    root = str(tmp_path / "uninit")
    r = RefreshRunner(root)
    for step in (r.status, r.compact, lambda: r.append("nope.parquet"),
                 lambda: r.delete(np.asarray([1], dtype=np.int64))):
        with pytest.raises(ValueError, match="not initialized"):
            step()
    with pytest.raises(ValueError, match="not initialized"):
        current_index(root)


def test_append_after_subthreshold_delete_compacts_first(ray_session, tiny_corpus, tmp_path):
    """A small delete (below the auto-compact fraction) followed by an
    append must WORK: append() compacts the pending tombstones away first
    (merge refuses tombstoned inputs) and reports it as pre_compaction;
    the result equals a monolithic build over the surviving + new corpus."""
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index, load_meta
    from pageindex_ray.pipelines.compact import compact_index
    from pageindex_ray.pipelines.refresh import RefreshRunner, current_index
    from pageindex_ray.pipelines.tombstones import add_tombstones

    waves, cums = _slices(tiny_corpus["transcripts"], tmp_path, n=3)
    qs = pq.read_table(tiny_corpus["queries"])
    queries = list(zip(qs.column("query_id").to_pylist(), qs.column("text").to_pylist()))
    cfg = BuildConfig(num_partitions=4)

    root = str(tmp_path / "rootd")
    r = RefreshRunner(root, cfg=cfg)
    r.init(waves[0])
    r.append(waves[1])
    n = load_meta(current_index(root))["n_docs"]
    deleted = np.asarray([1, 2, 3], dtype=np.int64)  # ~0% — no auto compact
    r.delete(deleted)
    out = r.append(waves[2])  # must not raise, must pre-compact
    assert out["pre_compaction"]["pointer"]["kind"] == "compact"

    mono = str(tmp_path / "monoPD")
    build_index(cums[2], mono, cfg)
    add_tombstones(mono, deleted)
    mono_c = str(tmp_path / "monoPDC")
    compact_index(mono, mono_c)
    a = _search(current_index(root), queries)
    b = _search(mono_c, queries)
    assert a.equals(b)
    assert a.num_rows > 0
