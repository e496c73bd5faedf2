"""Search results as a Ray Dataset: the full match set, never on one node.

Every other retrieval surface returns a driver-side top-k — right for
serving, wrong for the other thing search engines feed at corpus scale:
EXPORT ("give me every turn matching this query, with scores, as a table
I can keep processing"). The reference's analogue is handing the selected
tree nodes to the next pipeline stage (/root/reference/README.md:176-208);
at 10^12 turns the match set of a broad query is itself big data, so the
deterministic engine form is a Dataset-to-Dataset pipeline, not a bigger k:

    read_parquet(postings, filter=term isin q, columns pruned)
      -> map_batches: zero-copy consolidate + decode + per-posting BM25
         contribution (idf broadcast from a tiny driver-side df read)
      -> groupby(doc_id).sum   [the ONE shuffle — match-set-sized, not
                                corpus-sized, and only over scored rows]
      -> map_batches: attach (conv_id, turn_idx) from the broadcast conv
         offsets; drop tombstoned docs

The result streams: consume it with write_parquet / iter_batches or chain
more transforms. Scores equal the serving path's scores (same float64
expression order per posting); the groupby sums a doc's few per-term
contributions in unordered-reduce order, so exported scores match the
oracle within float-sum tolerance (each doc has <= |q| addends) while
RANKING surfaces stay bit-exact on their own paths.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..stages.codec import consolidate_partition_table, decode_consolidated
from ..tokenizer import get_tokenizer
from .build import load_meta
from .tombstones import load_tombstones

def _rd():
    import ray.data

    return ray.data


EXPORT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


def _global_dfs(index_dir: str, terms: list[str]) -> dict[str, int]:
    """Tiny driver-side read: (term, df) rows for the query terms only
    (column-pruned, term-filtered — salted sub-lists sum to the global df,
    the same rule the serving path uses)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "postings"), format="parquet")
    tbl = ds.to_table(columns=["term", "df"], filter=pc.field("term").isin(terms))
    out: dict[str, int] = {}
    for t, df in zip(tbl.column("term").to_pylist(), tbl.column("df").to_numpy()):
        out[t] = out.get(t, 0) + int(df)
    return out


def search_to_dataset(
    index_dir: str,
    query_text: str,
    min_should_match: int = 1,
) -> "ray.data.Dataset":
    """Score EVERY matching turn of ``query_text`` as a streaming Dataset
    with schema (doc_id, score, conv_id, turn_idx). ``min_should_match``:
    keep docs matching at least this many distinct query terms (1 = plain
    OR semantics, == serving-path match set)."""
    from ..sources.readers import read_parquet_clean

    meta = load_meta(index_dir)
    k1 = float(meta["config"]["k1"])
    b = float(meta["config"]["b"])
    avgdl = float(meta["avgdl"])
    n_live = int(meta.get("n_docs_live", meta["n_docs"]))
    spec = get_tokenizer(meta["config"].get("tokenizer", "alnum-lower-v1"))
    terms = sorted(set(spec.tokenize(query_text)))
    if not terms:
        return _rd().from_arrow(EXPORT_SCHEMA.empty_table())

    dfs = _global_dfs(index_dir, terms)
    # drop query terms absent from the index NOW: an all-absent query must
    # return a typed empty Dataset, not a schema-less one from a read whose
    # filter matched nothing
    terms = sorted(dfs)
    if not terms:
        return _rd().from_arrow(EXPORT_SCHEMA.empty_table())
    idf = {
        t: float(np.log((n_live - df + 0.5) / (df + 0.5) + 1.0))
        for t, df in dfs.items()
    }

    from ..state.convtable import ensure_arrow_sidecar

    offsets_path = ensure_arrow_sidecar(index_dir)  # workers mmap it locally
    tomb_ref = ray.put(load_tombstones(index_dir))

    def _score_batch(batch: pa.Table) -> pa.Table:
        # identical per-posting float64 expression order as the shards
        out_d, out_c, out_n = [], [], []
        for term, info in consolidate_partition_table(batch).items():
            w = idf.get(term)
            if w is None:
                continue
            ids, tfs, dls = decode_consolidated(info)
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            factor = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            out_d.append(ids)
            out_c.append(w * factor)
            out_n.append(np.ones(len(ids), dtype=np.int64))
        if not out_d:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "contrib": pa.array([], type=pa.float64()),
                    "n_terms": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d)),
                "contrib": pa.array(np.concatenate(out_c)),
                "n_terms": pa.array(np.concatenate(out_n)),
            }
        )

    def _attach(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy().astype(np.int64)
        scores = batch.column("score").to_numpy().astype(np.float64)
        nt = batch.column("n_terms").to_numpy().astype(np.int64)
        keep = nt >= min_should_match
        tomb = ray.get(tomb_ref)
        if len(tomb):
            keep &= ~np.isin(docs, tomb)
        docs, scores = docs[keep], scores[keep]
        # per-worker mmapped conv table (cached by path) — no driver-shipped
        # object arrays; names materialize only for this batch's rows
        from ..state.convtable import cached_table

        names, turns = cached_table(offsets_path).locate(docs)
        return pa.table(
            {
                "doc_id": pa.array(docs),
                "score": pa.array(scores),
                "conv_id": pa.array(names, type=pa.string()),
                "turn_idx": pa.array(turns, type=pa.int32()),
            }
        )

    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        os.path.join(index_dir, "postings"),
        columns=["term", "df", "cf", "blocks"],
        filter=pc.field("term").isin(terms),
    )
    return (
        ds.map_batches(_score_batch, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("contrib", alias_name="score"), Sum("n_terms", alias_name="n_terms"))
        .map_batches(_attach, batch_format="pyarrow", batch_size=65536)
    )


def export_search(
    index_dir: str, query_text: str, out_dir: str, min_should_match: int = 1
) -> dict:
    """Stream the full match set to partitioned parquet (the 100-TB
    consumption shape: never materialized on the driver). Returns
    {"out_dir", "n_rows"}."""
    # stream into a tmp dir and rename into place: write_parquet APPENDS
    # uniquely-named part files, so writing straight into an existing
    # out_dir would interleave this query's parts with a previous export's
    # (and the footer count below would sum both)
    tmp_dir = out_dir.rstrip("/") + ".tmp"
    for d in (tmp_dir, out_dir):
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
    ds = search_to_dataset(index_dir, query_text, min_should_match)
    ds.write_parquet(tmp_dir)  # streams: blocks flow straight to files
    n = sum(
        pq.ParquetFile(os.path.join(tmp_dir, f)).metadata.num_rows
        for f in os.listdir(tmp_dir)
        if f.endswith(".parquet")
    )
    os.replace(tmp_dir, out_dir)
    return {"out_dir": out_dir, "n_rows": int(n)}
