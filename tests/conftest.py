import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic tiny transcripts + queries parquet on disk."""
    import pyarrow.parquet as pq

    from pageindex_ray.sources.transcripts import synth_queries, synth_transcripts

    d = tmp_path_factory.mktemp("corpus")
    tpath = str(d / "transcripts.parquet")
    qpath = str(d / "queries.parquet")
    pq.write_table(synth_transcripts(2000), tpath)
    pq.write_table(synth_queries(), qpath)
    return {"transcripts": tpath, "queries": qpath}


@pytest.fixture(scope="session")
def built_index(ray_session, tiny_corpus, tmp_path_factory):
    from pageindex_ray.config import BuildConfig
    from pageindex_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = BuildConfig(num_partitions=8)
    report = build_index(tiny_corpus["transcripts"], index_dir, cfg)
    return {"index_dir": index_dir, "report": report, "cfg": cfg, **tiny_corpus}


@pytest.fixture(scope="session")
def oracle_index(tiny_corpus):
    import pyarrow.parquet as pq

    from pageindex_ray.oracle.bm25 import build_oracle_index

    return build_oracle_index(pq.read_table(tiny_corpus["transcripts"]))
