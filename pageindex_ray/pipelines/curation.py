"""Corpus curation: the end-to-end training-data pipeline a 100 TB corpus
runs before indexing — quality filter + language gate + exact-dedup gate,
with a RESUMABLE partitioned-parquet sink.

Composition of the engine's own operators (the "user pipeline" shape):

    read documents --map_batches--> quality features + language id
      (filter: n_tokens >= MIN_TOKENS, en-ratio in [LANG_EN_THRESHOLD, MAX_STOP_RATIO])
      (filter: exact-dedup survivor — the DROPPED-id set, which is small
       [#duplicates, not #docs], is computed by a md5-bucket groupby and
       broadcast via ray.put; at larger duplicate fractions this becomes the
       same bucketed anti-join as pipelines/dedup._pair_text_join)
      --write_parquet(partition_cols=[part])--> out_dir/part=*/ + _SUCCESS

The sink is partitioned by ``doc_id % n_parts`` and committed with a
_SUCCESS marker, so a failed run re-executes only if the marker is absent —
the same atomic-commit discipline as the index build
(stages/postings.py sink; reference analogue: the verify-then-accept gate,
/root/reference/pageindex/page_index.py:978-989).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.text import LANG_EN_THRESHOLD, quality_features
from ..sources.readers import read_parquet_clean
from .dedup import N_GROUP_BUCKETS, _gbucket, _runs, add_fingerprint

MIN_TOKENS = 20
MAX_STOP_RATIO = 0.5
N_OUT_PARTS = 8


def exact_dup_losers(ds: "ray.data.Dataset", n_buckets: int = N_GROUP_BUCKETS) -> np.ndarray:
    """doc_ids that LOSE exact dedup (every group member except the min id).
    Returns a (small) sorted numpy array — sized by the duplicate count, not
    the corpus."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = add_fingerprint(batch).select(["doc_id", "fp"])
        fp_head = np.asarray(
            [int(s[:15], 16) for s in t.column("fp").to_pylist()], dtype=np.int64
        )
        return t.append_column("gbucket", pa.array(_gbucket([fp_head], n_buckets), type=pa.int64()))

    schema = pa.schema([("doc_id", pa.int64())])

    def losers(g: pa.Table) -> pa.Table:
        docs = g.column("doc_id").to_numpy().astype(np.int64)
        fps = g.column("fp").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, fps))
        docs, fps = docs[order], fps[order]
        change = np.zeros(len(docs), dtype=bool)
        if len(docs):
            change[0] = True
            change[1:] = fps[1:] != fps[:-1]
        return pa.table({"doc_id": pa.array(docs[~change], type=pa.int64())}, schema=schema)

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(losers, batch_format="pyarrow")
    )
    parts = [t.column("doc_id").to_numpy() for t in (ray.get(r) for r in out.to_arrow_refs()) if t.num_rows]
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)


def curate_corpus(
    sf_dir: str, out_dir: str, n_parts: int = N_OUT_PARTS
) -> "ray.data.Dataset":
    """Run the curation pipeline (or reuse its committed output) and return
    the kept (doc_id, n_tokens) dataset read back from the sink."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        # Crash-safe commit: write into a tmp dir and rename it into place
        # with the marker already inside. Round 2 wrote part files directly
        # into out_dir and added the marker afterwards — a crash in between
        # left orphan files that a rerun DUPLICATED under new filenames.
        tmp_dir = out_dir.rstrip("/") + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        dropped_ref = ray.put(exact_dup_losers(ds))

        class Curate:
            def __init__(self):
                self.dropped = ray.get(dropped_ref)  # sorted int64

            def __call__(self, batch: pa.Table) -> pa.Table:
                feats = quality_features(batch)
                doc_ids = feats.column("doc_id").to_numpy().astype(np.int64)
                n_tok = feats.column("n_tokens").to_numpy().astype(np.int64)
                ratio = feats.column("stop_ratio").to_numpy().astype(np.float64)
                is_dup = np.zeros(len(doc_ids), dtype=bool)
                if len(self.dropped):
                    pos = np.searchsorted(self.dropped, doc_ids)
                    pos = np.clip(pos, 0, len(self.dropped) - 1)
                    is_dup = self.dropped[pos] == doc_ids
                keep = (
                    (n_tok >= MIN_TOKENS)
                    & (ratio >= LANG_EN_THRESHOLD)
                    & (ratio <= MAX_STOP_RATIO)
                    & ~is_dup
                )
                return pa.table(
                    {
                        "doc_id": pa.array(doc_ids[keep], type=pa.int64()),
                        "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
                        "part": pa.array((doc_ids[keep] % n_parts).astype(np.int32), type=pa.int32()),
                    }
                )

        kept = ds.map_batches(Curate, batch_format="pyarrow", batch_size=8192, concurrency=(1, 8))
        kept.write_parquet(tmp_dir, partition_cols=["part"])
        with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # orphaned partial sink from a crashed run
        os.replace(tmp_dir, out_dir)
    # hive-partitioned readback (part=*/ dirs); prune to the two data columns
    out = ray.data.read_parquet(out_dir, columns=["doc_id", "n_tokens"])
    return out.select_columns(["doc_id", "n_tokens"])
