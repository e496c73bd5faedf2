"""Bigram collocation mining (PMI): which word pairs belong together.

A training-data curation staple (tokenizer-merge candidates, multiword
expressions, boilerplate detection): score each adjacent token pair by
pointwise mutual information

    pmi(x, y) = ln( (c_xy / N2) / ((c_x / N1) * (c_y / N1)) )

where c_xy counts ADJACENT (same-turn) occurrences, N2 = total bigram
occurrences, c_x unigram occurrences, N1 = total tokens. Low-count pairs
are noise-dominated, so a ``min_count`` floor applies before ranking
(standard practice; also what bounds the driver-side final top-k).

Shape at scale: one streaming pass over the corpus; per batch, bigram and
unigram counts are PRE-AGGREGATED inside map_batches (a batch's counts
table is vocabulary-bounded, far smaller than its token stream), so the
one groupby shuffle moves distinct-key rows, not occurrences. The
min_count filter runs distributed BEFORE anything reaches the driver; only
the surviving collocation candidates (tiny: the interesting tail) are
ranked driver-side with the exact (pmi desc, w1 asc, w2 asc) tie-break.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tokenizer import get_tokenizer

COLL_SCHEMA = pa.schema(
    [
        ("w1", pa.string()),
        ("w2", pa.string()),
        ("n", pa.int64()),
        ("pmi", pa.float64()),
    ]
)


def _count_batch(batch: pa.Table, spec_name: str) -> pa.Table:
    """(conv-agnostic) per-batch pre-aggregation: rows
    (kind='u', w1=term, w2='', n) and (kind='b', w1, w2, n), plus one
    (kind='t') counter row carrying the batch's bigram-occurrence total.
    Tokenization is the Arrow C kernel path (same as posting emission)."""
    import pyarrow.compute as pc

    spec = get_tokenizer(spec_name)
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    text_col = pc.fill_null(text_col, "")
    lists = spec.arrow_token_lists(text_col)
    flat_a = lists.flatten()
    parents = lists.value_parent_indices().to_numpy()
    nonempty = pc.not_equal(flat_a, "")
    flat_a = flat_a.filter(nonempty)
    parents = parents[nonempty.to_numpy(zero_copy_only=False)]
    flat = np.asarray(flat_a.to_pylist(), dtype="U")
    out_w1: list[np.ndarray] = []
    out_w2: list[np.ndarray] = []
    out_kind: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    if len(flat):
        uniq, cnt = np.unique(flat, return_counts=True)
        out_w1.append(uniq)
        out_w2.append(np.full(len(uniq), "", dtype="U1"))
        out_kind.append(np.full(len(uniq), "u", dtype="U1"))
        out_n.append(cnt.astype(np.int64))
        # bigrams: adjacent token indices whose rows match (never crosses
        # a row boundary; empties already filtered keep order intact)
        left_idx = np.flatnonzero(parents[1:] == parents[:-1])
        if len(left_idx):
            f = flat
            l, r = f[left_idx], f[left_idx + 1]
            pair = np.char.add(np.char.add(l, " "), r)
            uniq_p, cnt_p = np.unique(pair, return_counts=True)
            halves = np.char.partition(uniq_p, " ")
            out_w1.append(halves[:, 0])
            out_w2.append(halves[:, 2])
            out_kind.append(np.full(len(uniq_p), "b", dtype="U1"))
            out_n.append(cnt_p.astype(np.int64))
            # the bigram-occurrence TOTAL must be counted before any
            # min_count cut — carried as a dedicated counter row
            out_w1.append(np.asarray([""], dtype="U1"))
            out_w2.append(np.asarray([""], dtype="U1"))
            out_kind.append(np.asarray(["t"], dtype="U1"))
            out_n.append(np.asarray([len(left_idx)], dtype=np.int64))
    if not out_w1:
        return pa.table(
            {
                "kind": pa.array([], type=pa.string()),
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "kind": pa.array(np.concatenate(out_kind).tolist(), type=pa.string()),
            "w1": pa.array(np.concatenate(out_w1).tolist(), type=pa.string()),
            "w2": pa.array(np.concatenate(out_w2).tolist(), type=pa.string()),
            "n": pa.array(np.concatenate(out_n)),
        }
    )


def bigram_pmi(
    transcripts_path: str,
    min_count: int = 5,
    k: int = 50,
    tokenizer: str = "alnum-lower-v1",
) -> pa.Table:
    """Top-``k`` collocations by (pmi desc, w1 asc, w2 asc) among bigrams
    with at least ``min_count`` adjacent occurrences. Returns
    (w1, w2, n, pmi)."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from ..sources.readers import read_parquet_clean

    def _gate(t: pa.Table) -> pa.Table:
        # distributed min_count gate: bigram rows below the floor never
        # leave their reducer; unigram + total-counter rows all survive
        # (the vocabulary is the small side by construction)
        keep = pc.or_(
            pc.invert(pc.equal(t.column("kind"), "b")),
            pc.greater_equal(t.column("n"), min_count),
        )
        return t.filter(keep)

    ds = read_parquet_clean(transcripts_path, columns=["text"])
    counts = (
        ds.map_batches(
            _count_batch,
            fn_kwargs={"spec_name": tokenizer},
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby(["kind", "w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_gate, batch_format="pyarrow")
    )
    tables = [t for t in counts.iter_batches(batch_format="pyarrow") if t.num_rows]
    if not tables:
        return COLL_SCHEMA.empty_table()
    tbl = pa.concat_tables(tables)
    kind = np.asarray(tbl.column("kind").to_pylist())
    w1 = np.asarray(tbl.column("w1").to_pylist(), dtype=object)
    w2 = np.asarray(tbl.column("w2").to_pylist(), dtype=object)
    n = tbl.column("n").to_numpy().astype(np.int64)

    uni = {t: int(c) for t, c in zip(w1[kind == "u"], n[kind == "u"])}
    n1 = float(sum(uni.values()))
    n2 = float(n[kind == "t"].sum())
    bmask = kind == "b"
    bw1, bw2, bn = w1[bmask], w2[bmask], n[bmask]
    if not len(bn) or n2 == 0.0:
        return COLL_SCHEMA.empty_table()
    cx = np.asarray([uni[t] for t in bw1], dtype=np.float64)
    cy = np.asarray([uni[t] for t in bw2], dtype=np.float64)
    c = bn.astype(np.float64)
    # expression order mirrors the DuckDB twin term-for-term
    pmi = np.log((c / n2) / ((cx / n1) * (cy / n1)))
    order = np.lexsort((bw2, bw1, -pmi))[:k]
    return pa.table(
        {
            "w1": pa.array(bw1[order].tolist(), type=pa.string()),
            "w2": pa.array(bw2[order].tolist(), type=pa.string()),
            "n": pa.array(bn[order]),
            "pmi": pa.array(pmi[order]),
        }
    )
