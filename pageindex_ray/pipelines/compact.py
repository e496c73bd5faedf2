"""Index compaction: physically expunge tombstoned docs (Lucene's
forceMergeDeletes analogue).

Tombstones (pipelines/tombstones.py) keep deletes O(deleted) by masking at
query time with UNCHANGED corpus stats. Compaction is the complementary
maintenance op: rewrite every posting partition without the deleted docs
and RECOMPUTE the statistics — df/cf per term, total_tokens, avgdl, and
the WAND max_factor bounds (re-derived under the new avgdl, the same
recompute the wave merge does) — so scores reflect the surviving corpus
only. The output is a fresh committed index with no tombstones.

Doc ids are NOT renumbered: `doc_id = conv_base + turn_idx` is derived
from the data (stages/docmap.py:9-23), so removing a turn must leave every
other doc's address intact. The compacted index therefore has a SPARSE
doc-id space: `meta.n_docs` stays the doc-id-space EXTENT (scorer ranges
and dense accumulators size off it) and the new `meta.n_docs_live` carries
the surviving-doc count (idf's N, avgdl's denominator). An engine serving
a pre-compaction index sees n_docs_live == n_docs and behaves identically.

Sidecars (attrs / stored fields) are fingerprint-bound and NOT carried —
they index deleted docs too; rebuild them against the compacted index.

Scale shape: one Ray Data pass over the partition files (each task
rewrites whole partitions: zero-copy consolidated decode -> membership
mask -> re-encode), plus one filtered docmap rewrite. No shuffle — the
term -> partition mapping is untouched, so salting and routing survive.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..stages.codec import (
    consolidate_partition_table,
    decode_consolidated,
    encode_posting_blocks,
)
from ..stages.postings import POSTINGS_SCHEMA, stats_fingerprint
from .attrs import membership_mask
from .tombstones import load_tombstones


def compact_index(index_dir: str, out_dir: str) -> dict:
    """Rewrite ``index_dir`` minus its tombstoned docs into ``out_dir``."""
    from ..config import BuildConfig
    from .build import load_meta

    if os.path.realpath(out_dir) == os.path.realpath(index_dir):
        raise ValueError("compaction writes a NEW index; out_dir must differ from index_dir")
    t0 = time.perf_counter()
    meta = load_meta(index_dir)
    tombs = load_tombstones(index_dir, expected_fingerprint=meta["fingerprint"])
    # re-compaction of an already-sparse index is legal with FRESH
    # tombstones (the refresh loop's delete->compact->delete->compact
    # lifecycle); without any it would be a pointless identical rewrite
    n_prev_live = int(meta.get("n_docs_live", meta["n_docs"]))
    if meta.get("n_docs_live") is not None and not len(tombs):
        raise ValueError(
            "index is already compacted and has no fresh tombstones — "
            "nothing to expunge"
        )
    cfg = BuildConfig(**meta["config"])

    # live stats from the docmap: one pruned (doc_id, doc_len) read
    import pyarrow.dataset as pads

    dm = pads.dataset(os.path.join(index_dir, "docmap")).to_table(
        columns=["doc_id", "doc_len"]
    )
    dl = dm.column("doc_len").to_numpy().astype(np.int64)
    ids = dm.column("doc_id").to_numpy().astype(np.int64)
    dead = membership_mask(tombs, ids)
    # count deletions via docmap membership, not len(tombs): a tombstone id
    # already expunged by a prior compaction must not double-count
    n_live = n_prev_live - int(dead.sum())
    # meta["total_tokens"] is already the LIVE total on a compacted index
    total_tokens_live = int(meta["total_tokens"]) - int(dl[dead].sum())
    avgdl_live = total_tokens_live / n_live if n_live else 0.0
    hot_terms = sorted(meta.get("hot_terms", []))
    fingerprint = stats_fingerprint(n_live, avgdl_live, cfg, hot_terms)
    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(os.path.join(out_dir, "postings"))
    os.makedirs(os.path.join(out_dir, "_meta"))

    tombs_ref = ray.put(tombs)
    parts = sorted(meta.get("parts_present", []))

    def compact_part(batch: pa.Table) -> pa.Table:
        t_arr = ray.get(tombs_ref) if not isinstance(tombs_ref, np.ndarray) else tombs_ref
        out_rows = []
        for pid in batch.column("part").to_pylist():
            path = os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet")
            rows = {"term": [], "df": [], "cf": [], "blocks": []}
            n_postings = 0
            if os.path.exists(path):
                table = pq.read_table(path)
                for term, info in sorted(consolidate_partition_table(table).items()):
                    t_ids, t_tfs, t_dls = decode_consolidated(info)
                    keep = ~membership_mask(t_arr, t_ids)
                    t_ids, t_tfs, t_dls = t_ids[keep], t_tfs[keep], t_dls[keep]
                    if not len(t_ids):
                        continue  # every posting of this term was deleted
                    rows["term"].append(term)
                    rows["df"].append(len(t_ids))
                    rows["cf"].append(int(t_tfs.sum()))
                    rows["blocks"].append(
                        encode_posting_blocks(
                            t_ids, t_tfs, t_dls, k1, b, avgdl_live, block_size
                        )
                    )
                    n_postings += len(t_ids)
            out = pa.Table.from_pydict(rows, schema=POSTINGS_SCHEMA)
            final = os.path.join(out_dir, "postings", f"part-{pid:05d}.parquet")
            tmp = os.path.join(out_dir, "postings", f".tmp-{uuid.uuid4().hex}.parquet")
            pq.write_table(out, tmp)
            os.replace(tmp, final)
            with open(final, "rb") as f:
                file_md5 = hashlib.md5(f.read()).hexdigest()
            from ..stages.postings import file_identity

            lineage = {
                "part": pid,
                "n_terms": out.num_rows,
                "n_postings": n_postings,
                "file_md5": file_md5,
                **file_identity(final),
                "fingerprint": fingerprint,
                "wall_s": 0.0,
                "compacted_from": index_dir,
            }
            ltmp = os.path.join(out_dir, "_meta", f".tmp-{uuid.uuid4().hex}.json")
            with open(ltmp, "w") as f:
                json.dump(lineage, f)
            os.replace(ltmp, os.path.join(out_dir, "_meta", f"part-{pid:05d}.json"))
            out_rows.append(
                {"part": pid, "n_terms": out.num_rows, "n_postings": n_postings}
            )
        return pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [("part", pa.int64()), ("n_terms", pa.int64()), ("n_postings", pa.int64())]
            ),
        )

    report = (
        ray.data.from_items([{"part": p} for p in parts])
        .map_batches(compact_part, batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )

    # docmap: drop the deleted rows (conv_offsets stay as-is — addressing)
    dm_out = os.path.join(out_dir, "docmap")
    os.makedirs(dm_out)
    src_dm = os.path.join(index_dir, "docmap")
    for fn in sorted(os.listdir(src_dm)):
        t = pq.read_table(os.path.join(src_dm, fn))
        keep = ~membership_mask(tombs, t.column("doc_id").to_numpy().astype(np.int64))
        pq.write_table(t.filter(pa.array(keep)), os.path.join(dm_out, fn))
    shutil.copy(
        os.path.join(index_dir, "conv_offsets.parquet"),
        os.path.join(out_dir, "conv_offsets.parquet"),
    )
    from ..state.convtable import ensure_arrow_sidecar

    ensure_arrow_sidecar(out_dir)

    out_meta = {
        "n_docs": meta["n_docs"],  # doc-id-space EXTENT (sparse after compaction)
        "n_docs_live": n_live,
        "doc_base": meta.get("doc_base", 0),
        "total_tokens": total_tokens_live,
        "avgdl": avgdl_live,
        "fingerprint": fingerprint,
        "parts_present": parts,
        "hot_terms": hot_terms,
        "config": meta["config"],
        "compacted_from": index_dir,
        "n_expunged": int(dead.sum()),
    }
    tmp = os.path.join(out_dir, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(out_meta, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    return {
        "n_docs_live": n_live,
        "n_expunged": int(dead.sum()),
        "avgdl": avgdl_live,
        "n_postings": int(report["n_postings"].sum()),
        "wall_s": time.perf_counter() - t0,
        "index_dir": out_dir,
    }
