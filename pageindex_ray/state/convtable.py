"""Memory-mapped conversation-offset table.

``conv_offsets.parquet`` maps doc ids back to (conv_id, turn_idx): row i is
conversation i in sorted order, ``base`` its first doc id. Round 3 loaded it
on the DRIVER as a Python-object ndarray (``to_pylist()`` — ~10x byte
overhead per conv and O(#convs) heap), and shipped per-range object-array
slices to every RangeScorer. At the 10^12-turn ambition (~10^10 convs) that
is a driver scale-killer (VERDICT.md r3, "What's wrong" #1).

This module keeps the table OUT of the Python heap:

- ``ensure_arrow_sidecar`` converts the parquet once (atomic rename,
  idempotent) to an UNCOMPRESSED single-batch Arrow IPC file — the only
  format the OS can page in lazily. Parquet cannot be mmapped usefully
  (pages are encoded/compressed); IPC buffers are the wire layout.
- ``ConvTable`` memory-maps the IPC file: ``bases`` is a zero-copy int64
  numpy VIEW of the mapped buffer (binary-searchable at C speed without a
  heap copy) and conv ids stay an Arrow StringArray backed by the map.
  Python objects are materialized only for rows a query actually touches
  (``names_at`` / ``locate`` — O(result), never O(#convs)).
- RangeScorers receive the file path + their row range and slice the map
  themselves (zero-copy ``Table.slice``) instead of deserializing
  driver-shipped object arrays; the file lives in the index dir, which is
  already the shared-storage contract every shard actor relies on.

Reference analogue: the physical_index->page lookup the reference keeps as
an in-memory tree (/root/reference/pageindex/utils.py:354-400), re-expressed
as a file-backed binary-searchable table.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc
import pyarrow.parquet as pq

ARROW_NAME = "conv_offsets.arrow"
PARQUET_NAME = "conv_offsets.parquet"


def write_arrow_sidecar(table: pa.Table, index_dir: str) -> str:
    """Write the offsets table as a single-batch uncompressed IPC file
    (atomic tmp+rename; safe under concurrent writers — last one wins with
    identical content)."""
    path = os.path.join(index_dir, ARROW_NAME)
    tmp = path + f".tmp.{os.getpid()}"
    combined = table.combine_chunks()
    with pa.OSFile(tmp, "wb") as f:
        with pa.ipc.new_file(f, combined.schema) as w:
            w.write_table(combined)
    os.replace(tmp, path)
    return path


def ensure_arrow_sidecar(index_dir: str) -> str:
    """Idempotently derive conv_offsets.arrow from conv_offsets.parquet
    (covers indexes built/merged before the sidecar existed)."""
    path = os.path.join(index_dir, ARROW_NAME)
    if os.path.exists(path):
        return path
    return write_arrow_sidecar(
        pq.read_table(os.path.join(index_dir, PARQUET_NAME)), index_dir
    )


def s_array_from_arrow(arr) -> np.ndarray | None:
    """Arrow String/LargeString array -> numpy fixed-width S-dtype array
    WITHOUT Python string boxing: one vectorized scatter from the value
    buffer into a zero-padded byte matrix (O(total bytes), C throughout).
    Returns None when any byte is non-ASCII — the searchsorted addressing
    path encodes its query side with numpy's ascii codec, so non-ASCII ids
    must take the dict fallback (same contract as the old object-array
    conversion, minus the per-string boxing)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype="S1")
    if arr.null_count:
        return None
    if pa.types.is_large_string(arr.type):
        off_dtype, off_width = np.int64, 8
    elif pa.types.is_string(arr.type):
        off_dtype, off_width = np.int32, 4
    else:
        return None
    bufs = arr.buffers()  # [validity, offsets, data]
    offs = np.frombuffer(
        bufs[1], dtype=off_dtype, count=n + 1, offset=arr.offset * off_width
    ).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.diff(offs)
    total = int(offs[-1] - offs[0])
    if total and data[offs[0]:offs[-1]].max() >= 128:
        return None  # non-ASCII: byte-encode mismatch with the query side
    w = max(1, int(lens.max()))
    mat = np.zeros((n, w), dtype=np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1] - offs[0], lens)
    mat[rows, cols] = data[offs[0]:offs[-1]]
    return mat.view(f"S{w}").reshape(n)


_TABLE_CACHE: dict[str, "ConvTable"] = {}


def cached_table(path: str) -> "ConvTable":
    """Per-worker-process ConvTable cache (Ray reuses worker processes
    across map_batches tasks — same load-once amortization as the
    stages/postings broadcast caches). Keyed by file identity, not the
    bare path: a rebuilt index at the same path must not serve stale
    offsets from a reused worker."""
    st = os.stat(path)
    key = f"{path}:{st.st_mtime_ns}:{st.st_ino}"
    ct = _TABLE_CACHE.get(key)
    if ct is None:
        # evict only stale generations of the SAME path — a reused worker
        # alternating batches between two live indexes must not thrash the
        # other index's table out of the cache on every alternation
        prefix = f"{path}:"
        for stale in [k for k in _TABLE_CACHE if k.startswith(prefix)]:
            del _TABLE_CACHE[stale]
        ct = _TABLE_CACHE[key] = ConvTable(path)
    return ct


class ConvTable:
    """Zero-copy view over the mmapped offsets table.

    ``bases``: int64 numpy view (no heap copy) of the conv base doc ids —
    ascending, binary-searchable. ``ids``: Arrow StringArray backed by the
    map. ``row_range`` selects a slice (RangeScorer use); the default is the
    whole table (driver use).
    """

    def __init__(self, index_dir: str, row_range: tuple[int, int] | None = None,
                 cache_names: bool = False):
        # accepts the index dir (derives/reuses the sidecar) or the sidecar
        # file itself (worker-side path-form broadcast)
        if index_dir.endswith(".arrow"):
            t = pa.ipc.open_file(pa.memory_map(index_dir)).read_all()
        else:
            try:
                t = pa.ipc.open_file(pa.memory_map(ensure_arrow_sidecar(index_dir))).read_all()
            except (OSError, PermissionError):
                # read-only deployment of a pre-sidecar index: serve from an
                # in-memory Arrow load of the parquet (still no Python-object
                # boxing — just not file-backed), preserving the round-3
                # contract that opening an index never requires write access
                t = pq.read_table(os.path.join(index_dir, PARQUET_NAME)).combine_chunks()
        if row_range is not None:
            t = t.slice(row_range[0], row_range[1] - row_range[0])
        # optional lazily-boxed name slice: rollup scoring touches most of a
        # range's convs per Zipf-head query — a RangeScorer amortizes the
        # boxing once (O(slice), actor-local, never driver-shipped) instead
        # of re-boxing per query; the driver keeps the per-query path
        self._cache_names = cache_names
        self._names_cache: np.ndarray | None = None
        ids = t.column("conv_id")
        bases = t.column("base")
        # single batch by construction; chunk(0) keeps the mmap backing
        self.ids: pa.StringArray = ids.chunk(0) if ids.num_chunks else pa.array([], pa.string())
        self.bases: np.ndarray = (
            bases.chunk(0).to_numpy(zero_copy_only=True)
            if bases.num_chunks
            else np.empty(0, dtype=np.int64)
        )

    def __len__(self) -> int:
        return len(self.bases)

    def names_at(self, idx: np.ndarray) -> np.ndarray:
        """conv_id strings for the given row indices — materializes Python
        objects ONLY for the touched rows (O(len(idx)), not O(#convs));
        with ``cache_names`` the whole slice is boxed once on first use and
        later calls are pure pointer indexing."""
        if not len(idx):
            return np.empty(0, dtype=object)
        idx = np.asarray(idx, dtype=np.int64)
        if self._cache_names:
            if self._names_cache is None:
                self._names_cache = np.asarray(self.ids.to_pylist(), dtype=object)
            return self._names_cache[idx]
        taken = self.ids.take(pa.array(idx))
        return np.asarray(taken.to_pylist(), dtype=object)

    def row_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """Row index (conversation ordinal) owning each doc id."""
        return np.searchsorted(self.bases, doc_ids, side="right") - 1

    def locate(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """doc ids -> (conv_id object array, turn_idx int32)."""
        idx = self.row_of(doc_ids)
        return self.names_at(idx), (doc_ids - self.bases[idx]).astype(np.int32)
