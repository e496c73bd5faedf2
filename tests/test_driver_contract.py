"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB row-for-row (order-insensitive, columns
sorted by name) on the sf0.01 testdata."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_entry_smoke(ray_session, contract):
    out = _to_pandas(contract.entry())
    assert len(out) > 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(out.columns)


def _oracle_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql())


@pytest.mark.parametrize("name", [
    "docmap", "corpus_stats", "term_stats", "bm25_topk", "bm25_wand_topk", "bm25_conv_topk",
    "role_stats", "doc_tokens", "doc_tokens_bpe", "doc_tokens_bpe2",
    "doc_quality", "doc_langid", "doc_fingerprint",
    "dedup_exact", "dedup_jaccard", "ann_topk", "multimodal_meta",
    "multimodal_frames", "multimodal_resize", "multimodal_wav", "multimodal_ppm", "q1_pricing",
    "top_revenue_orders", "customer_rollup", "events_sessions", "events_by_type",
    "conv_text_fingerprint", "conv_summaries", "conv_salient_summary", "event_type_mode",
    "events_tumbling", "parts_by_brand", "embedding_near_dup",
    "dedup_minhash", "dedup_minhash_cc", "dedup_simhash", "ann_ivf", "embedding_near_dup_lsh",
    "bm25_segment_topk", "corpus_curation", "phrase_search", "more_like_this",
    "bm25_conv_max_topk", "bool_search", "bm25_filtered_topk", "facet_counts",
    "prefix_search", "fuzzy_search", "snippets", "suggest", "bm25_tombstoned_topk",
    "bm25_compacted_topk", "lm_topk", "rrf_topk", "regex_search", "bm25_page2",
    "span_near", "proximity_search", "query_string", "phrase_search_pos", "bm25_boosted_topk",
    "search_export", "collocations", "sorted_search", "date_histogram", "field_stats",
    "bm25_tree_topk", "index_refresh", "conv_summaries_model", "dataset_split",
    "refresh_loop",
])
def test_query_matches_oracle(ray_session, contract, con, name):
    sqls = contract.oracle_sql()
    assert name in sqls, f"{name} has no oracle"
    ours = _canon(_to_pandas(contract.queries()[name](SF)))
    theirs = _canon(con.execute(sqls[name]).fetchdf())
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: column mismatch {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: row count {len(ours)} vs {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, rtol=1e-9, atol=1e-12)


def test_every_query_has_an_oracle(contract):
    """Round 2 closed the no_oracle gap: every queries() entry must have a
    SQL twin (sketch pipelines via the deterministic sidecar parquet)."""
    assert set(contract.queries()) == set(contract.oracle_sql())
