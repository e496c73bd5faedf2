"""Tombstone deletes: Lucene-style query-time document masking.

The reference mutates its tree in place when a node fails verification
(/root/reference/pageindex/page_index.py:978-989 — repair/fallback paths);
the engine form of "remove documents without rebuilding the index" is the
tombstone file every segment-based fulltext engine ships: deleted doc ids
are recorded in a sidecar, every scoring path masks them at query time,
and — exactly like Lucene before a merge — corpus statistics (df, idf,
avgdl) still count the deleted docs until the index is rebuilt/merged.
That keeps deletes O(deleted) instead of O(corpus), and keeps scores of
surviving docs bit-identical to the pre-delete index.

Layout: ``index_dir/tombstones.parquet`` (sorted doc_id int64) +
``index_dir/tombstones_meta.json`` ({"n", "fingerprint"}) — fingerprint-
bound to the index like the attrs/stored sidecars, committed atomically
(tmp + os.replace), idempotent union on repeated adds.

Scale shape: the tombstone set is O(deletes); the engine broadcasts it
once at init and each RangeScorer holds only its [lo, hi) slice. At
10^12-doc scale with heavy churn the per-segment delete files of a real
LSM layout would replace the single sidecar — the wave/merge path is
where that would live (pipelines/merge.py rebuilds drop tombstoned docs'
postings is intentionally out of scope this round; documented, not
implied).

Coverage: tombstones mask the SCORING surface — search/search_batch (all
granularities, both paths, WAND included via post-mask), boolean
retrieval, facet counts, snippets (top-k already masked). Dictionary-level
surfaces (suggest, prefix/fuzzy expansion dfs) intentionally keep Lucene
semantics: dfs count tombstoned docs until rebuild. The phrase/mlt
pipelines read the corpus directly and are documented as
tombstone-unaware.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TOMB_FILE = "tombstones.parquet"
_META_FILE = "tombstones_meta.json"


def _paths(index_dir: str) -> tuple[str, str]:
    return os.path.join(index_dir, _TOMB_FILE), os.path.join(index_dir, _META_FILE)


def add_tombstones(index_dir: str, doc_ids) -> dict:
    """Mark doc ids deleted (idempotent union with any existing set).
    Ids outside the index's [doc_base, doc_base + n_docs) range raise —
    a silently accepted wrong id would mask nothing forever."""
    from .build import load_meta

    meta = load_meta(index_dir)
    lo = int(meta.get("doc_base", 0))
    hi = lo + int(meta["n_docs"])
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    bad = ids[(ids < lo) | (ids >= hi)]
    if len(bad):
        raise ValueError(
            f"doc ids outside the index range [{lo}, {hi}): {bad[:5].tolist()}..."
        )
    existing = load_tombstones(index_dir, expected_fingerprint=meta["fingerprint"])
    merged = np.union1d(existing, ids)
    tpath, mpath = _paths(index_dir)
    tmp_t, tmp_m = tpath + ".tmp", mpath + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(merged, type=pa.int64())}), tmp_t)
    with open(tmp_m, "w") as f:
        json.dump({"n": int(len(merged)), "fingerprint": meta["fingerprint"]}, f)
    # two-file commit: meta LAST, and readers validate n — a torn pair
    # (new parquet, old meta) still reads consistently because the parquet
    # is a superset and meta only guards fingerprint + count sanity
    os.replace(tmp_t, tpath)
    os.replace(tmp_m, mpath)
    return {"n_tombstones": int(len(merged)), "added": int(len(merged) - len(existing))}


def clear_tombstones(index_dir: str) -> None:
    for p in _paths(index_dir):
        if os.path.exists(p):
            os.remove(p)


def load_tombstones(index_dir: str, expected_fingerprint: str | None = None) -> np.ndarray:
    """Sorted deleted doc ids (empty array when none). A sidecar whose
    fingerprint doesn't match the index is refused — deletes recorded
    against a different corpus would silently mask the wrong docs."""
    tpath, mpath = _paths(index_dir)
    if not os.path.exists(tpath):
        return np.empty(0, dtype=np.int64)
    if expected_fingerprint is not None:
        with open(mpath) as f:
            m = json.load(f)
        if m.get("fingerprint") != expected_fingerprint:
            raise ValueError(
                f"tombstones at {tpath} were recorded for a different index "
                "(fingerprint mismatch): clear_tombstones() and re-delete"
            )
    return pq.read_table(tpath).column("doc_id").to_numpy().astype(np.int64)
