"""Numeric doc-values sidecar: sort search results by a FIELD, not a score.

Lucene's DocValues: a per-document columnar store living next to the
inverted index, so queries can be ordered by a document attribute
(recency, length, priority) instead of relevance — "newest matching
turns" is the canonical transcript query. The posting lists answer WHICH
docs match; this sidecar answers the ORDER without touching the corpus.

Layout (``index_dir/docvalues/``)::

    parts/*.parquet   rows (col, lo, hi, doc_ids list<int64>,
                      vals list<int64>) — one row per (input block,
                      column); doc_ids ascending within a row, vals
                      aligned; lo/hi = [min, max+1] doc-id bounds
    meta.json         {"columns": {name: source_type}, "n_docs",
                      "fingerprint"} — fingerprint-bound to the index
    _SUCCESS          atomic-commit marker (tmp-dir + os.replace)

Values are stored as raw int64 in the SOURCE unit: a timestamp[us] column
stores microseconds, an int32 stores its widened value — the unit is
recorded in meta (``columns``), never assumed (an earlier advisor finding
flagged silent unit assumptions on this very column).

Scale shape mirrors the attrs sidecar: rows carry [lo, hi) doc-id bounds,
so a RangeScorer loads only its slice (parquet row-group pruning); the
driver path reads only rows overlapping the matched-doc span.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

DV_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("lo", pa.int64()),
        ("hi", pa.int64()),
        ("doc_ids", pa.list_(pa.int64())),
        ("vals", pa.list_(pa.int64())),
    ]
)

_FORMAT_VERSION = 1


def docvalues_dir_of(index_dir: str) -> str:
    return os.path.join(index_dir, "docvalues")


def _as_int64(arr: pa.ChunkedArray | pa.Array, col: str) -> pa.Array:
    """Source column -> int64 values in the source unit. Timestamps keep
    their storage integer; integer types widen; anything else (and nulls)
    is a hard error — a silently-coalesced sort key would reorder results."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError(f"docvalues column {col!r} has nulls; v1 stores total columns only")
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_integer(t):
        return arr.cast(pa.int64())
    raise TypeError(f"docvalues column {col!r} has unsupported type {t} (int/timestamp only)")


def _dv_rows(batch: pa.Table, offsets_ref, columns: tuple[str, ...]) -> pa.Table:
    """One input block -> (col, lo, hi, doc_ids, vals) rows — identical
    broadcast doc-id addressing as the attrs/docmap stages."""
    from ..stages.postings import cached_conv_bases, conv_bases_for_batch

    turn = batch.column("turn_idx").to_numpy().astype(np.int64)
    base = conv_bases_for_batch(offsets_ref, batch.column("conv_id"))
    if base is None:  # non-ASCII conv ids: per-row dict lookups
        base_by_conv = cached_conv_bases(offsets_ref)
        conv = batch.column("conv_id").to_pylist()
        base = np.fromiter((base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
    doc_id = base + turn
    if not len(doc_id):  # empty input block (e.g. an empty parquet part)
        return DV_SCHEMA.empty_table()
    order = np.argsort(doc_id, kind="stable")
    doc_sorted = doc_id[order]

    out = {"col": [], "lo": [], "hi": [], "doc_ids": [], "vals": []}
    for col in columns:
        vals = _as_int64(batch.column(col), col).to_numpy()[order]
        out["col"].append(col)
        out["lo"].append(int(doc_sorted[0]))
        out["hi"].append(int(doc_sorted[-1]) + 1)
        out["doc_ids"].append(doc_sorted.tolist())
        out["vals"].append(vals.tolist())
    return pa.table(
        {
            "col": pa.array(out["col"], type=pa.string()),
            "lo": pa.array(out["lo"], type=pa.int64()),
            "hi": pa.array(out["hi"], type=pa.int64()),
            "doc_ids": pa.array(out["doc_ids"], type=pa.list_(pa.int64())),
            "vals": pa.array(out["vals"], type=pa.list_(pa.int64())),
        }
    )


def build_docvalues(
    index_dir: str, source_path: str, columns: tuple[str, ...] = ("ts",)
) -> dict:
    """Build (or resume) the doc-values sidecar for a committed index —
    one pruned read, stateless map_batches, tmp-dir atomic commit,
    fingerprint-bound; idempotent for a column subset like build_attrs."""
    import pyarrow.parquet as pq

    from ..sources.readers import read_parquet_clean
    from .build import load_meta

    columns = tuple(columns)
    if not columns:
        raise ValueError("build_docvalues needs at least one column")
    meta = load_meta(index_dir)
    out_dir = docvalues_dir_of(index_dir)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        existing = load_docvalues_meta(out_dir)
        if existing["fingerprint"] == meta["fingerprint"] and set(columns) <= set(
            existing["columns"]
        ):
            return {**existing, "resumed": True}
        shutil.rmtree(out_dir)

    from ..state.convtable import ensure_arrow_sidecar

    offsets_ref = {"offsets_path": ensure_arrow_sidecar(index_dir)}

    # record each column's SOURCE type so consumers know the unit
    first = source_path if isinstance(source_path, str) else source_path[0]
    if os.path.isdir(first):
        first = os.path.join(first, sorted(os.listdir(first))[0])
    fschema = pq.ParquetFile(first).schema_arrow
    col_types = {c: str(fschema.field(c).type) for c in columns}

    tmp_dir = os.path.join(index_dir, ".docvalues.tmp")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "parts"))

    ds = read_parquet_clean(source_path, columns=["conv_id", "turn_idx", *columns])
    ds.map_batches(
        _dv_rows, fn_args=(offsets_ref, columns), batch_format="pyarrow"
    ).write_parquet(os.path.join(tmp_dir, "parts"))

    out_meta = {
        "format_version": _FORMAT_VERSION,
        "columns": col_types,
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


def load_docvalues_meta(dv_dir: str) -> dict:
    with open(os.path.join(dv_dir, "meta.json")) as f:
        return json.load(f)


class DocValueStore:
    """Reader over a committed doc-values sidecar. Stateless w.r.t. doc
    ranges (same contract as AttrStore): every call prunes to the requested
    [lo, hi) slice at the parquet layer; callers own caching."""

    def __init__(self, dv_dir: str):
        if not os.path.exists(os.path.join(dv_dir, "_SUCCESS")):
            raise FileNotFoundError(
                f"docvalues sidecar at {dv_dir} has no _SUCCESS marker: "
                "build incomplete or interrupted"
            )
        self.dir = dv_dir
        self.meta = load_docvalues_meta(dv_dir)
        self.columns = set(self.meta["columns"])

    def _dataset(self):
        import pyarrow.dataset as pads

        return pads.dataset(os.path.join(self.dir, "parts"), schema=DV_SCHEMA)

    def slice(self, col: str, lo: int | None = None, hi: int | None = None):
        """(sorted_doc_ids, vals) for ``col``, clipped to [lo, hi)."""
        import pyarrow.dataset as pads

        if col not in self.columns:
            raise KeyError(f"docvalues column {col!r} not in sidecar {sorted(self.columns)}")
        f = pads.field("col") == col
        if lo is not None:
            f = f & (pads.field("hi") > lo) & (pads.field("lo") < hi)
        t = self._dataset().to_table(filter=f, columns=["doc_ids", "vals"])
        ids = pc.list_flatten(t.column("doc_ids"))
        vals = pc.list_flatten(t.column("vals"))
        if not len(ids):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ids = ids.to_numpy()
        vals = vals.to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, vals = ids[order], vals[order]
        if lo is not None:
            a = int(np.searchsorted(ids, lo, side="left"))
            b = int(np.searchsorted(ids, hi, side="left"))
            ids, vals = ids[a:b], vals[a:b]
        return ids, vals

    def values_for(self, col: str, doc_ids: np.ndarray) -> np.ndarray:
        """int64 values aligned to ``doc_ids`` (which must all exist —
        every doc has a value by construction)."""
        if not len(doc_ids):
            return np.empty(0, dtype=np.int64)
        ids, vals = self.slice(col, int(doc_ids.min()), int(doc_ids.max()) + 1)
        pos = np.searchsorted(ids, doc_ids)
        if (pos >= len(ids)).any() or (ids[np.minimum(pos, len(ids) - 1)] != doc_ids).any():
            missing = doc_ids[(pos >= len(ids)) | (ids[np.minimum(pos, len(ids) - 1)] != doc_ids)]
            raise KeyError(f"doc ids missing from docvalues sidecar: {missing[:5].tolist()}...")
        return vals[pos]
