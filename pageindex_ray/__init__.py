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


def _tune_malloc() -> None:
    """Keep large freed buffers in the process heap instead of returning
    them to the OS. numpy temporaries above glibc's default mmap threshold
    (128 KiB) are otherwise served by fresh mmaps and munmap'd on free, so
    every vectorized pass re-faults its pages — under many concurrent Ray
    workers the kernel-side fault/zero/TLB work serializes and caps
    multi-core scaling of the bandwidth-bound stages (posting assembly,
    tokenization). Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes the
    allocator reuse the same hot pages. Runs once per process at import
    (every Ray worker imports this package before running our stages)."""
    import ctypes
    import sys

    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc / restricted environments: allocator stays default


_tune_malloc()
