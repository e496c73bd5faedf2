"""pageindex_ray — a Ray-Data-native full-text index + BM25 query engine.

Re-expresses the capabilities of crjaensch/PageIndex (reference at
/root/reference, an LLM-driven PDF tree indexer) as a from-scratch
distributed inverted-index build + BM25 retrieval engine over Parquet
transcript tables, built on ray.data.Dataset / map_batches / groupby
with zero-copy Arrow batches.

Layout (SURVEY.md maps each reference operator to a module here):
  tokenizer.py   — the ONE shared tokenizer (oracle == engine == SQL)
  config.py      — build/search configuration (reference: pageindex/config.yaml,
                   utils.py:613-644 ConfigLoader)
  sources/       — deterministic transcript synthesis + parquet readers
                   (reference: utils.py:417-440 get_page_tokens)
  stages/        — Dataset -> Dataset build stages: docmap, postings, codec
  state/         — stateful query-side actors (posting shards)
  pipelines/     — build_index / search / dedup / ann / text / relational
  oracle/        — single-process BM25 golden implementation
"""

__version__ = "0.1.0"
