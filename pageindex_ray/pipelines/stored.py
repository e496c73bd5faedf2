"""Stored-fields sidecar: doc-addressed field retrieval (Lucene's stored
fields / docvalues analogue).

The reference keeps node text reachable from its tree nodes
(/root/reference/pageindex/page_index.py — nodes carry page ranges back
into the source PDF); the engine form is a doc_id-sorted columnar store so
query-time consumers (snippet generation, result hydration) fetch the
fields of a handful of doc ids WITHOUT scanning the corpus: the store is
written globally sorted by doc_id (one explicit Ray Data sample-sort at
build time — a wide shuffle, paid once per index build like the posting
shuffle itself), so every parquet row group covers a contiguous doc-id
range and point lookups prune to O(row groups touched) via parquet
statistics.

Layout (``index_dir/stored/``)::

    parts/*.parquet   (doc_id, *columns) rows, globally doc_id-sorted
    meta.json         {"columns", "n_docs", "fingerprint"}
    _SUCCESS          atomic tmp-dir + os.replace commit

Like the attrs sidecar, the store is fingerprint-bound to the index and a
mismatch is refused at open time.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray

_FORMAT_VERSION = 1


def stored_dir_of(index_dir: str) -> str:
    return os.path.join(index_dir, "stored")


def _with_doc_ids(batch: pa.Table, offsets_ref, columns: tuple[str, ...]) -> pa.Table:
    """(conv_id, turn_idx, *fields) block -> (doc_id, *fields): the same
    broadcast searchsorted addressing as the docmap stage
    (stages/docmap.py:185-208)."""
    from ..stages.postings import cached_conv_bases, conv_bases_for_batch

    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = conv_bases_for_batch(offsets_ref, batch.column("conv_id"))
    if base is None:  # non-ASCII conv ids: per-row dict lookups
        base_by_conv = cached_conv_bases(offsets_ref)
        conv = batch.column("conv_id").to_pylist()
        base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    cols = {"doc_id": pa.array(base + turn, type=pa.int64())}
    for c in columns:
        cols[c] = batch.column(c)
    return pa.table(cols)


def build_stored_fields(
    index_dir: str, source_path: str, columns: tuple[str, ...] = ("text",)
) -> dict:
    """Build (or resume) the stored-fields store for a committed index.

    Pruned read of (conv_id, turn_idx, *columns) -> doc_id addressing ->
    ONE global sort by doc_id (the deliberate wide op that buys row-group
    pruned point reads forever after) -> atomic parquet commit.
    """
    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    columns = tuple(columns)
    if not columns:
        raise ValueError("build_stored_fields needs at least one field column")
    meta = load_meta(index_dir)
    out_dir = stored_dir_of(index_dir)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        existing = _load_meta(out_dir)
        if existing["fingerprint"] == meta["fingerprint"] and set(columns) <= set(
            existing["columns"]
        ):
            return {**existing, "resumed": True}
        shutil.rmtree(out_dir)

    from ..state.convtable import ensure_arrow_sidecar

    offsets_ref = {"offsets_path": ensure_arrow_sidecar(index_dir)}

    tmp_dir = os.path.join(index_dir, ".stored.tmp")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "parts"))

    ds = read_parquet_clean(source_path, columns=["conv_id", "turn_idx", *columns])
    (
        ds.map_batches(
            _with_doc_ids, fn_args=(offsets_ref, columns), batch_format="pyarrow"
        )
        .sort("doc_id")
        .write_parquet(os.path.join(tmp_dir, "parts"))
    )

    out_meta = {
        "format_version": _FORMAT_VERSION,
        "columns": sorted(columns),
        "n_docs": int(meta["n_docs"]),
        "fingerprint": meta["fingerprint"],
    }
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(out_meta, f, indent=1)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    return {**out_meta, "resumed": False}


def _load_meta(stored_dir: str) -> dict:
    with open(os.path.join(stored_dir, "meta.json")) as f:
        return json.load(f)


class DocStore:
    """Point-lookup reader over a committed stored-fields store."""

    def __init__(self, stored_dir: str):
        if not os.path.exists(os.path.join(stored_dir, "_SUCCESS")):
            raise FileNotFoundError(
                f"stored-fields store at {stored_dir} has no _SUCCESS marker: "
                "build incomplete or interrupted"
            )
        self.dir = stored_dir
        self.meta = _load_meta(stored_dir)
        self.columns = set(self.meta["columns"])

    def fetch(self, doc_ids, columns: tuple[str, ...] | None = None) -> pa.Table:
        """Fields for the given doc ids, one row per REQUESTED id in input
        order (missing ids raise — the index's docmap is total over
        [doc_base, doc_base + n_docs)). The isin predicate prunes at the
        row-group level via the store's global doc_id sort."""
        import pyarrow.dataset as pads

        cols = sorted(self.columns) if columns is None else list(columns)
        missing_cols = set(cols) - self.columns
        if missing_cols:
            raise KeyError(f"columns {sorted(missing_cols)} not stored; have {sorted(self.columns)}")
        ids = np.asarray(list(doc_ids), dtype=np.int64)
        uniq = np.unique(ids)
        t = pads.dataset(os.path.join(self.dir, "parts")).to_table(
            filter=pads.field("doc_id").isin(uniq.tolist()),
            columns=["doc_id", *cols],
        )
        got = t.column("doc_id").to_numpy()
        if len(got) < len(uniq):
            absent = np.setdiff1d(uniq, got)
            raise KeyError(f"doc ids not in store: {absent[:5].tolist()}...")
        order = np.argsort(got)
        pos = np.searchsorted(got[order], ids)
        return t.take(pa.array(order[pos], type=pa.int64()))
