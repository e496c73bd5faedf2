"""Text-analysis pipelines over the documents and transcripts tables."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ..sources.readers import read_parquet_clean

from ..functions.text import lang_id, md5_fingerprints, quality_features, rolling_fingerprint, token_counts
from ..sources.transcripts import ensure_corpus


def _documents(sf_dir: str) -> "ray.data.Dataset":
    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def documents_tokens(sf_dir: str) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": token_counts(batch.column("text")).cast(pa.int64())}
        )

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


# BPE-style pre-tokenizer pieces: letter runs, digit runs, punctuation runs
# (whitespace separates). RE2 syntax shared verbatim by Arrow's regex kernels
# and DuckDB's regexp_extract_all, so the SQL oracle counts the exact same
# pieces. (Lookahead-based GPT-2 contraction splitting is deliberately not
# used: RE2 has no lookarounds, on either side.)
BPE_PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def documents_tokens_bpe(sf_dir: str) -> "ray.data.Dataset":
    """Per-document BPE-ish piece count (training-data token accounting)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_PIECE_PATTERN)
        return pa.table({"doc_id": batch.column("doc_id"), "n_pieces": n.cast(pa.int64())})

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


class BpeTokenCounter:
    """Actor-pool stage: TRUE merge-table BPE token accounting (the
    reference counts tokens against a real vocabulary via tiktoken,
    /root/reference/pageindex/utils.py:23-31 — ``documents_tokens_bpe``
    above only counts pre-tokenizer pieces). The committed merge table is
    loaded once per actor; each unique piece pays the merge loop once and
    every repeat is a cache hit (functions/bpe.py)."""

    def __init__(self):
        from ..functions.bpe import BPE

        self.bpe = BPE()

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = self.bpe.count_batch(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )


def documents_tokens_bpe2(sf_dir: str) -> "ray.data.Dataset":
    """Per-document TRUE-BPE token count over the committed merge table."""
    return _documents(sf_dir).map_batches(
        BpeTokenCounter, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4)
    )


def documents_quality(sf_dir: str) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        out = quality_features(batch)
        return out.select(["doc_id", "n_chars", "n_tokens", "n_stopwords", "stop_ratio", "mean_tok_len"])

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


def documents_langid(sf_dir: str) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        return lang_id(batch).select(["doc_id", "pred_lang"])

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


def documents_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": md5_fingerprints(batch.column("text")),
                "rolling_fp": rolling_fingerprint(batch.column("text")),
            }
        )

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


# split-fraction boundaries as fixed-width lowercase-hex md5 prefixes:
# lexicographic comparison on the first 8 hex chars == numeric comparison
# on the top 32 hash bits, and the SAME literals are interpolated into the
# DuckDB twin, so engine and oracle agree byte-for-byte
def _split_bounds(fractions: tuple[float, float]) -> tuple[str, str]:
    lo, hi = fractions
    if not (0.0 < lo < hi < 1.0):
        raise ValueError(f"split fractions must satisfy 0 < train < train+val < 1, got {fractions}")
    return f"{int(lo * (1 << 32)):08x}", f"{int(hi * (1 << 32)):08x}"


SPLIT_FRACTIONS = (0.9, 0.95)  # train < 0.9, val < 0.95, else test


def documents_split(sf_dir: str, fractions: tuple[float, float] = SPLIT_FRACTIONS) -> "ray.data.Dataset":
    """Deterministic content-hash train/val/test split — the dataset-split
    primitive every training pipeline needs. The split key is the md5 of
    the document TEXT (not the id), so exact duplicates always land in the
    same split (no train/test leakage through copies) and the assignment
    is reproducible across runs, partitionings, and engines. Scale shape:
    stateless map_batches, no shuffle; the reference has no analogue (its
    corpus is a handful of PDFs) — this is a §2.8-family training-data op."""
    b_train, b_val = _split_bounds(fractions)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h8 = np.asarray(
            pc.utf8_slice_codeunits(md5_fingerprints(batch.column("text")), 0, 8)
            .to_pylist(),
            dtype=np.bytes_,
        )
        split = np.where(
            h8 < b_train.encode(), "train", np.where(h8 < b_val.encode(), "val", "test")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return _documents(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=8192)


def transcripts_role_stats(sf_dir: str) -> pa.Table:
    """Per-role turn counts + token totals over the synthesized transcripts
    (partial per-batch combine, then a tiny groupby)."""
    from ray.data.aggregate import Sum

    tpath, _ = ensure_corpus(sf_dir)
    ds = read_parquet_clean(tpath, columns=["role", "text"])

    partial_schema = pa.schema(
        [("role", pa.string()), ("sum_tokens", pa.int64()), ("n_turns", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"role": batch.column("role"), "n_tokens": token_counts(batch.column("text")).cast(pa.int64())}
        )
        # count_all, not count: token_counts yields NULL for a null text and
        # n_turns must count every TURN (the twin's count(*)), not every
        # non-null token count
        g = t.group_by("role").aggregate([("n_tokens", "sum"), ([], "count_all")])
        return g.rename_columns(partial_schema.names).cast(partial_schema)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("role")
        .aggregate(Sum("sum_tokens", alias_name="sum_tokens"), Sum("n_turns", alias_name="n_turns"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
