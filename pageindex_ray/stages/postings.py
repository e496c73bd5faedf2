"""Posting emission + term-partitioned posting-list assembly.

This is THE central shuffle of the engine (SURVEY.md §2.6 A6) — the analogue
of the reference's sequential TOC accumulation chain
(/root/reference/pageindex/page_index.py:578-581, driver-local list mutated
group by group, SURVEY.md §2.4 T4), made stateless + distributed:

    transcripts --map_batches(PostingEmitter)--> (term, doc_id, tf, dl, part)
                --groupby("part").map_groups(assemble)--> compressed shards

Partitioning is by ``part = crc32(term) % P`` — every posting of a term lands
in exactly one partition, so per-term df/cf are complete within their group
and no cross-partition state exists (the single biggest architectural
divergence from the reference, SURVEY.md §4.1 row 2). P balanced hash keys
also keep the shuffle's group sizes even under the Zipfian term distribution:
the unit of shuffle is the partition (many terms), not the term, so a hot
term can never produce a pathological single-term group by itself.

Resume support: the emitter drops postings destined for partitions whose
lineage already validates, so a resumed build does not even shuffle completed
work (FIXTURES.md F5).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
import uuid
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..tokenizer import tokenize_batch
from .codec import encode_posting_blocks

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("idf", pa.float64()),
        (
            "blocks",
            pa.list_(
                pa.struct(
                    [
                        ("first_doc_id", pa.int64()),
                        ("count", pa.int32()),
                        ("max_score", pa.float64()),
                        ("deltas", pa.binary()),
                        ("tfs", pa.binary()),
                        ("dls", pa.binary()),
                    ]
                )
            ),
        ),
    ]
)


def term_partition(term: str, num_partitions: int) -> int:
    """Deterministic, process-independent term->partition hash (crc32)."""
    return zlib.crc32(term.encode("utf-8")) % num_partitions


class PostingEmitter:
    """Actor-pool map_batches stage: transcripts batch -> posting rows.

    __init__ (once per actor): fetch the broadcast conv->base offsets, build
    the term->partition cache. __call__ (per batch): tokenize, count tf per
    (doc, term) with a vectorized pandas group-size, attach doc_len.

    Row expansion is ~ (unique terms per turn) x input rows; batch_size is
    sized accordingly by the caller (SURVEY.md §4.1 memory row).
    """

    def __init__(self, offsets_ref, num_partitions: int, completed_parts=frozenset()):
        off = ray.get(offsets_ref) if not isinstance(offsets_ref, dict) else offsets_ref
        self.base_by_conv = dict(zip(off["conv_ids"].tolist(), off["bases"].tolist()))
        self.num_partitions = num_partitions
        self.completed = frozenset(completed_parts)
        self._part_cache: dict[str, int] = {}

    def _parts_for(self, terms: np.ndarray) -> np.ndarray:
        cache = self._part_cache
        P = self.num_partitions
        out = np.empty(len(terms), dtype=np.int32)
        for i, t in enumerate(terms):
            p = cache.get(t)
            if p is None:
                p = zlib.crc32(t.encode("utf-8")) % P
                cache[t] = p
            out[i] = p
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        base = np.fromiter((self.base_by_conv[c] for c in conv), dtype=np.int64, count=len(conv))
        doc_id = base + turn

        texts = batch.column("text").to_pylist()
        flat_terms, lengths = tokenize_batch(texts)
        if len(flat_terms) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int32()),
                    "dl": pa.array([], type=pa.int32()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        token_doc = np.repeat(doc_id, lengths)
        token_dl = np.repeat(lengths, lengths)  # doc_len rides along per posting

        # tf per (doc, term): vectorized two-key group-size (C hash groupby).
        df = pd.DataFrame({"doc_id": token_doc, "term": flat_terms, "dl": token_dl})
        grouped = df.groupby(["doc_id", "term"], sort=False, observed=True).agg(
            tf=("term", "size"), dl=("dl", "first")
        )
        grouped = grouped.reset_index()

        terms = grouped["term"].to_numpy(dtype=object)
        parts = self._parts_for(terms)
        keep = ~np.isin(parts, list(self.completed)) if self.completed else slice(None)
        return pa.table(
            {
                "term": pa.array(terms[keep], type=pa.string()),
                "doc_id": pa.array(grouped["doc_id"].to_numpy(np.int64)[keep], type=pa.int64()),
                "tf": pa.array(grouped["tf"].to_numpy(np.int32)[keep], type=pa.int32()),
                "dl": pa.array(grouped["dl"].to_numpy(np.int32)[keep], type=pa.int32()),
                "part": pa.array(parts[keep], type=pa.int32()),
            }
        )


def stats_fingerprint(n_docs: int, avgdl: float, cfg) -> str:
    """Lineage fingerprint: any change to corpus stats or scoring config
    invalidates previously committed partitions (resume safety)."""
    payload = json.dumps(
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "k1": cfg.k1,
            "b": cfg.b,
            "block_size": cfg.block_size,
            "num_partitions": cfg.num_partitions,
            "tokenizer": "alnum-lower-v1",
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def assemble_partition(
    group: pd.DataFrame,
    index_dir: str,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    fingerprint: str,
) -> pd.DataFrame:
    """map_groups body: one term-hash partition -> one committed shard file.

    Sorts postings by (term, doc_id), builds delta+varint blocks per term with
    exact per-block max_score, writes ``postings/part-{pid:05d}.parquet``
    atomically (tmp + rename) and a lineage sidecar
    ``_meta/part-{pid:05d}.json`` — the analogue of the reference's JsonLogger
    observability (/root/reference/pageindex/utils.py:313-349) upgraded to a
    resume contract: a partition either commits (checksummed) or it does not
    exist (no silent partial output, unlike the reference's poison-value
    "Error" flow, utils.py:61).
    """
    t0 = time.perf_counter()
    pid = int(group["part"].iloc[0])

    terms = group["term"].to_numpy(dtype=object)
    doc_ids = group["doc_id"].to_numpy(np.int64)
    tfs = group["tf"].to_numpy(np.int64)
    dls = group["dl"].to_numpy(np.int64)
    order = np.lexsort((doc_ids, terms))
    terms, doc_ids, tfs, dls = terms[order], doc_ids[order], tfs[order], dls[order]

    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.append(starts, len(terms))

    out_terms, out_df, out_cf, out_idf, out_blocks = [], [], [], [], []
    for i, term in enumerate(uniq):
        s, e = bounds[i], bounds[i + 1]
        df_t = int(e - s)
        # math.log, not np.log: the oracle uses math.log and the two can
        # differ in the last ulp — idf must be bit-identical everywhere.
        idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
        out_terms.append(term)
        out_df.append(df_t)
        out_cf.append(int(tfs[s:e].sum()))
        out_idf.append(idf)
        out_blocks.append(
            encode_posting_blocks(doc_ids[s:e], tfs[s:e], dls[s:e], idf, k1, b, avgdl, block_size)
        )

    table = pa.table(
        {
            "term": pa.array(out_terms, type=pa.string()),
            "df": pa.array(out_df, type=pa.int64()),
            "cf": pa.array(out_cf, type=pa.int64()),
            "idf": pa.array(out_idf, type=pa.float64()),
            "blocks": pa.array(out_blocks, type=POSTINGS_SCHEMA.field("blocks").type),
        }
    )

    postings_dir = os.path.join(index_dir, "postings")
    meta_dir = os.path.join(index_dir, "_meta")
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    final_path = os.path.join(postings_dir, f"part-{pid:05d}.parquet")
    tmp_path = os.path.join(postings_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp_path)
    os.replace(tmp_path, final_path)
    with open(final_path, "rb") as f:
        file_md5 = hashlib.md5(f.read()).hexdigest()

    wall = time.perf_counter() - t0
    lineage = {
        "part": pid,
        "n_terms": len(uniq),
        "n_postings": int(len(terms)),
        "file_md5": file_md5,
        "fingerprint": fingerprint,
        "wall_s": wall,
    }
    meta_tmp = os.path.join(meta_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(meta_tmp, "w") as f:
        json.dump(lineage, f)
    os.replace(meta_tmp, os.path.join(meta_dir, f"part-{pid:05d}.json"))

    return pd.DataFrame([lineage])


def scan_completed_partitions(index_dir: str, fingerprint: str) -> set[int]:
    """Partitions whose lineage sidecar + shard file validate (resume path)."""
    meta_dir = os.path.join(index_dir, "_meta")
    done: set[int] = set()
    if not os.path.isdir(meta_dir):
        return done
    for name in os.listdir(meta_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(meta_dir, name)) as f:
                lineage = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if lineage.get("fingerprint") != fingerprint:
            continue
        shard = os.path.join(index_dir, "postings", f"part-{lineage['part']:05d}.parquet")
        if not os.path.exists(shard):
            continue
        with open(shard, "rb") as f:
            if hashlib.md5(f.read()).hexdigest() != lineage.get("file_md5"):
                continue
        done.add(int(lineage["part"]))
    return done
