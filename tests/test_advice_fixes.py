"""Regression tests for the round-2 advisor findings: curation sink
crash-safety, timestamp-unit independence, and empty-document dedup edges."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_curation_sink_crash_safe(ray_session, tmp_path):
    """A run that died after writing part files but before the marker must
    NOT duplicate rows on rerun (round 2 wrote into out_dir directly and a
    rerun re-emitted every row under new filenames)."""
    from pageindex_ray.pipelines.curation import curate_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    clean = curate_corpus(sf, out).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # simulate the crash: committed output exists but the marker is gone
    os.unlink(os.path.join(out, "_SUCCESS"))
    rerun = curate_corpus(sf, out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(rerun) == len(clean)
    assert rerun["doc_id"].is_unique
    assert rerun.equals(clean)

    # and a half-written orphan dir (no marker, partial files) is replaced
    shutil.rmtree(out)
    os.makedirs(os.path.join(out, "part=0"))
    with open(os.path.join(out, "part=0", "orphan.parquet"), "w") as f:
        f.write("garbage")
    again = curate_corpus(sf, out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert again.equals(clean)


def test_events_sessions_unit_independent(ray_session, tmp_path):
    """events_sessions must compute identical gaps for us/ms/ns parquet
    timestamp units (round 2 hard-coded the us->ns multiply)."""
    from pageindex_ray.pipelines.relational import events_sessions

    import pyarrow.compute as pc

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    ts_idx = src.column_names.index("ts")

    def _sessions_for(ts_col, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(src.set_column(ts_idx, "ts", ts_col), str(d / "events.parquet"))
        return events_sessions(str(d)).to_pandas().sort_values("user_id").reset_index(drop=True)

    base = events_sessions("/root/testdata/sf0.001").to_pandas().sort_values(
        "user_id"
    ).reset_index(drop=True)
    # ns cast is lossless: must equal the us baseline exactly
    assert _sessions_for(src.column("ts").cast(pa.timestamp("ns")), "sf_ns").equals(base)
    # ms requires truncation; compare against a ms-truncated us input
    us = src.column("ts").cast(pa.int64())
    trunc_us = pc.multiply(pc.divide(us, 1000), 1000).cast(pa.timestamp("us"))
    ms = pc.divide(us, 1000).cast(pa.timestamp("ms"))
    assert _sessions_for(ms, "sf_ms").equals(_sessions_for(trunc_us, "sf_us_trunc"))


def test_minhash_empty_docs_cluster_together(ray_session):
    """Two token-less docs have identical all-max signatures -> LSH
    candidates; the verify step must treat jaccard(empty, empty) as 1.0 (the
    SQL twin's len=0 AND len=0 clause), so they cluster together."""
    import ray.data

    from pageindex_ray.functions.hashes import jaccard
    from pageindex_ray.pipelines.dedup import minhash_dedup

    assert jaccard("", "") == 1.0
    assert jaccard("...", "!!") == 1.0  # punctuation-only -> no tokens

    table = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["", "?!", "alpha beta gamma delta", "zz yy xx ww"], type=pa.string()),
        }
    )
    out = minhash_dedup(ray.data.from_arrow(table)).to_pandas().set_index("doc_id")
    assert out.loc[2, "canonical_id"] == 1  # empty docs collapse to min id
    assert out.loc[1, "canonical_id"] == 1
    assert out.loc[3, "canonical_id"] == 3
    assert out.loc[4, "canonical_id"] == 4


def test_summarizer_model_hook_constructed_once_per_actor(ray_session, tmp_path):
    """conv_summaries(model_factory=...): the injected model must be built
    exactly once per ACTOR (load-once enrichment — the reference's
    generate_node_summary analogue), not once per batch, and its batched
    outputs must land in the summary column."""
    import ray

    from pageindex_ray.pipelines.conversations import ExtractiveSummarizer

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self):
            self.n += 1

        def get(self):
            return self.n

    counter = Counter.remote()

    class FakeModel:
        def __init__(self, handle):
            ray.get(handle.incr.remote())

        def __call__(self, texts):
            return [f"FAKE::{(t or '').split(' ')[0]}" for t in texts]

    def factory(handle=counter):
        return FakeModel(handle)

    table = pa.table(
        {
            "conv_id": pa.array([f"c{i:03d}" for i in range(64)], type=pa.string()),
            "first_text": pa.array([f"word{i} tail" for i in range(64)], type=pa.string()),
        }
    )
    import ray.data

    out = (
        ray.data.from_arrow(table)
        .map_batches(
            ExtractiveSummarizer,
            fn_constructor_args=(10, factory),
            batch_format="pyarrow",
            batch_size=4,  # 16 batches >> actor count
            concurrency=(2, 2),
        )
        .to_pandas()
    )
    assert len(out) == 64
    assert out["summary"].str.startswith("FAKE::").all()
    built = ray.get(counter.get.remote())
    assert 1 <= built <= 2, f"model built {built} times for 2 actors / 16 batches"


def test_payload_decoder_codec_hook(ray_session):
    """PayloadDecoder(mode='decode'): without a codec it must raise (the
    documented environment gap), WITH an injected codec_factory the decode
    path runs end-to-end through the actor pool."""
    import pytest
    import ray.data

    from pageindex_ray.pipelines.multimodal import PayloadDecoder

    table = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([b"abc", b""], type=pa.binary()),
            "n_bytes": pa.array([3, 0], type=pa.int64()),
        }
    )
    with pytest.raises(NotImplementedError, match="codec"):
        PayloadDecoder("decode")(table)

    class UpperCodec:
        def decode(self, payload: bytes) -> bytes:
            return payload.upper()

    out = (
        ray.data.from_arrow(table)
        .map_batches(
            PayloadDecoder,
            fn_constructor_args=("decode", UpperCodec),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["decoded"].tolist() == [b"ABC", b""]


def test_merge_refuses_in_place_output(ray_session, tiny_corpus, tmp_path):
    """merge_indexes/append_wave must refuse out_dir == an input wave: the
    docmap collection clears out_dir/docmap first, so an in-place merge
    would destroy the input's docmap and still commit."""
    import pytest

    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index
    from pageindex_ray.pipelines.merge import append_wave, merge_indexes

    idx = str(tmp_path / "idx")
    build_index(tiny_corpus["transcripts"], idx, BuildConfig(num_partitions=4))
    with pytest.raises(ValueError, match="in place"):
        merge_indexes([idx], idx)
    with pytest.raises(ValueError, match="in place"):
        append_wave(idx, tiny_corpus["transcripts"], idx)
    # the refused call must not have touched the index
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    assert os.listdir(os.path.join(idx, "docmap"))


def test_ivf_rebuilds_on_parameter_change(ray_session, tmp_path):
    """A committed IVF index is reused ONLY for identical build parameters;
    a different n_clusters must rebuild, not silently serve stale
    centroids."""
    import ray.data

    from pageindex_ray.pipelines.ann import build_ivf_index

    rng = np.random.default_rng(9)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array([r for r in rng.normal(size=(300, 8)).astype(np.float32)]),
        }
    )
    ds = ray.data.from_arrow(table)
    idx = str(tmp_path / "ivf")
    m1 = build_ivf_index(ds, idx, n_clusters=4, sample_rows=256)
    assert m1["n_clusters"] == 4
    m2 = build_ivf_index(ds, idx, n_clusters=8, sample_rows=256)
    assert m2["n_clusters"] == 8  # rebuilt, not reused
    dirs = {d for d in os.listdir(os.path.join(idx, "vectors"))}
    assert len(dirs) > 4  # the 8-cluster layout is actually on disk
    m3 = build_ivf_index(ds, idx, n_clusters=8, sample_rows=256)
    assert m3 == m2  # identical params -> reuse


def test_role_stats_counts_null_text_turns(ray_session, tmp_path):
    """n_turns counts every TURN (the SQL twin's count(*)) even when text
    is null — token_counts yields NULL there and a plain Arrow 'count'
    would silently drop the row (code-review r4 finding)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines import textstats
    from pageindex_ray.sources import transcripts as tsrc

    d = str(tmp_path / "sf_null")
    os.makedirs(d)
    table = pa.table(
        {
            "conv_id": pa.array(["c0", "c0", "c1"], type=pa.string()),
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "role": pa.array(["user", "user", "assistant"], type=pa.string()),
            "text": pa.array(["hello world", None, "three tokens here"], type=pa.string()),
        }
    )
    tdir = str(tmp_path / "sf_null_t.parquet")
    pq.write_table(table, tdir)
    import unittest.mock as mock

    with mock.patch.object(tsrc, "ensure_corpus", lambda sf: (tdir, None)):
        with mock.patch.object(textstats, "ensure_corpus", lambda sf: (tdir, None)):
            out = textstats.transcripts_role_stats(d).to_pandas().set_index("role")
    assert int(out.loc["user", "n_turns"]) == 2  # null-text turn counted
    assert int(out.loc["user", "sum_tokens"]) == 2
    assert int(out.loc["assistant", "n_turns"]) == 1


def test_documents_split_null_text_matches_sql_twin(ray_session, tmp_path):
    """A NULL document text splits like an empty one — the engine hashes
    md5(t or '') and the SQL twin coalesces, so both assign md5('')'s
    bucket instead of the twin silently falling through to 'test'
    (ADVICE r4: pin the admissible-input contract)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines.textstats import documents_split

    d = str(tmp_path / "sf_nulldoc")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["alpha beta", None, ""], type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    eng = documents_split(d).to_pandas().sort_values("doc_id").reset_index(drop=True)

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    sql = entry.oracle_sql()["dataset_split"]
    ora = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    assert list(eng["split"]) == list(ora["split"])
    # null and empty text land in the SAME split (md5('') bucket)
    assert eng.loc[1, "split"] == eng.loc[2, "split"]


def test_conv_salient_summary_bucket_invariant_no_driver_vocab(ray_session, tmp_path):
    """The round-5 term-bucketed salience join: results are invariant to the
    term-bucket count (integer partial sums are exact), empty turns are not
    candidates, and NO term->df dict is ray.put from the driver (judge r4
    #2 — the old path broadcast the full vocabulary)."""
    import os
    import unittest.mock as mock

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pageindex_ray.pipelines import conversations as C

    table = pa.table(
        {
            "conv_id": pa.array(["c0", "c0", "c0", "c1", "c1", "c2"], type=pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0, 1, 0], type=pa.int32()),
            "role": pa.array(["user"] * 6, type=pa.string()),
            "text": pa.array(
                [
                    "the the the",            # common terms only
                    "xylophone quartz",       # rare terms -> winner of c0
                    "",                       # empty: not a candidate
                    "zephyr",                 # rare -> winner of c1
                    "the the the",            # common term only
                    "   ",                    # all-empty conv -> no row
                ],
                type=pa.string(),
            ),
        }
    )
    tdir = str(tmp_path / "sal_t.parquet")
    pq.write_table(table, tdir)

    real_put = C.ray.put

    def no_dict_put(obj, *a, **kw):
        assert not isinstance(obj, dict), "driver broadcast a vocab dict"
        return real_put(obj, *a, **kw)

    outs = {}
    with mock.patch.object(C, "ensure_corpus", lambda sf: (tdir, None)):
        with mock.patch.object(C.ray, "put", side_effect=no_dict_put):
            for nb in (1, 7, 256):
                outs[nb] = (
                    C.conv_salient_summary(str(tmp_path / "x"), n_term_buckets=nb)
                    .to_pandas()
                    .sort_values("conv_id")
                    .reset_index(drop=True)
                )
    assert outs[1].equals(outs[7]) and outs[7].equals(outs[256])
    out = outs[256].set_index("conv_id")
    assert int(out.loc["c0", "turn_idx"]) == 1 and out.loc["c0", "summary"] == "xylophone quartz"
    assert int(out.loc["c1", "turn_idx"]) == 0 and out.loc["c1", "summary"] == "zephyr"
    assert "c2" not in out.index  # all-empty conversation yields no row
