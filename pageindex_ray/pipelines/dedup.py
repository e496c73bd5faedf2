"""Deduplication pipelines over a documents table (doc_id:int64, text:string).

The reference needs no dedup (a single PDF has no duplicate pages,
SURVEY.md §2.8); these are the training-data-scale operators a 100 TB corpus
pipeline requires. All follow the same Ray Data shape:

    map_batches (vectorized hash/sketch per doc)        [stateless or actor]
      -> groupby(bucket key)                            [the only shuffle]
      -> per-group candidate generation / first-wins

Exact dedup groups by full-content md5 (the groupby IS the dedup); MinHash-LSH
shingles -> seeded permutations -> band buckets; SimHash buckets by the top
bits of the 64-bit fingerprint. Candidate verification (exact Jaccard /
Hamming) happens per bucket, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashes import MinHasher, hamming64, jaccard, simhash64
from ..functions.text import md5_fingerprints


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_fingerprint(batch: pa.Table) -> pa.Table:
    return batch.append_column("fp", md5_fingerprints(batch.column("text")))


def exact_dedup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep the lowest doc_id per exact content hash.

    hash-partitioned groupby + per-group min — first-wins semantics. Returns
    (doc_id, fp) of the survivors.
    """
    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [int(g["doc_id"].min())], "fp": [g["fp"].iloc[0]]})

    return (
        ds.map_batches(add_fingerprint, batch_format="pyarrow")
        .select_columns(["doc_id", "fp"])
        .groupby("fp")
        .map_groups(keep_first, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHashEmitter:
    """Actor-pool stage: doc -> (band_id, band_key, doc_id) LSH bucket rows.
    The permutation family is built once per actor in __init__."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_k: int = 3):
        self.hasher = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_band, out_key, out_doc = [], [], []
        for did, text in zip(doc_ids, texts):
            sig = self.hasher.signature(text or "")
            for band_id, key in enumerate(self.hasher.band_keys(sig, self.num_bands)):
                out_band.append(band_id)
                out_key.append(key)
                out_doc.append(int(did))
        return pa.table(
            {
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds: "ray.data.Dataset", num_perm: int = 64, num_bands: int = 16, shingle_k: int = 3
) -> "ray.data.Dataset":
    """LSH candidate pairs: docs sharing any band bucket. Output
    (doc_a, doc_b) with doc_a < doc_b, deduplicated across bands."""

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        if len(ids) < 2 or len(ids) > 1000:  # skew guard: degenerate buckets
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = (
        ds.map_batches(
            MinHashEmitter,
            fn_constructor_args=(num_perm, num_bands, shingle_k),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=(1, 8),
        )
        .groupby(["band_id", "band_key"])
        .map_groups(pairs_of_bucket, batch_format="pandas")
    )
    # same pair can surface from several bands -> distinct
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(dedup_pairs, batch_format="pandas")


def minhash_dedup(
    ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Near-dup clusters: LSH candidates -> exact-Jaccard verify -> union-find.

    Returns (doc_id, canonical_id): canonical_id == min doc_id of the cluster.
    The verify step broadcasts the text column via ray.put (documents tables
    at sandbox scale); at 100 TB the pair list would instead be joined back to
    the corpus by doc_id bucket (SURVEY.md §2.5 J1 scale path) — the pair
    volume, not the corpus, is what stays small.
    """
    texts_tbl = ds.select_columns(["doc_id", "text"]).to_pandas()
    text_by_id = dict(zip(texts_tbl["doc_id"], texts_tbl["text"]))
    text_ref = ray.put(text_by_id)

    class VerifyJaccard:
        def __init__(self):
            self.texts = ray.get(text_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("doc_a").to_numpy()
            b = batch.column("doc_b").to_numpy()
            sims = np.asarray(
                [jaccard(self.texts[int(x)], self.texts[int(y)], shingle_k) for x, y in zip(a, b)]
            )
            keep = sims >= jaccard_threshold
            return pa.table(
                {
                    "doc_a": pa.array(a[keep], type=pa.int64()),
                    "doc_b": pa.array(b[keep], type=pa.int64()),
                    "jaccard": pa.array(sims[keep], type=pa.float64()),
                }
            )

    verified = minhash_candidate_pairs(ds, num_perm, num_bands, shingle_k).map_batches(
        VerifyJaccard, batch_format="pyarrow", concurrency=(1, 4)
    ).to_arrow_refs()
    edges = pa.concat_tables([ray.get(r) for r in verified])

    # union-find on the driver: candidate set is tiny relative to the corpus
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(edges.column("doc_a").to_pylist(), edges.column("doc_b").to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    all_ids = sorted(text_by_id)
    canon = [find(i) if i in parent else i for i in all_ids]
    return pa.table(
        {
            "doc_id": pa.array(all_ids, type=pa.int64()),
            "canonical_id": pa.array(canon, type=pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

def add_simhash(batch: pa.Table) -> pa.Table:
    sims = np.asarray([simhash64(t or "") for t in batch.column("text").to_pylist()], dtype=np.uint64)
    return batch.append_column("simhash", pa.array(sims.astype(np.int64), type=pa.int64()))


def simhash_candidates(ds: "ray.data.Dataset", max_hamming: int = 3, prefix_bits: int = 16):
    """Near-dup candidates: bucket by the top ``prefix_bits`` of the simhash
    (docs within small Hamming distance usually share a prefix band), verify
    Hamming distance exactly within buckets. Returns (doc_a, doc_b, hamming)."""

    def bucket(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy().astype(np.uint64)
        pre = (sh >> np.uint64(64 - prefix_bits)).astype(np.int64)
        return batch.append_column("bucket", pa.array(pre, type=pa.int64()))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        sh = g["simhash"].to_numpy(np.int64).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        if len(ids) < 2 or len(ids) > 2000:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        hd = hamming64(sh[ia], sh[ib])
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ia][keep], "doc_b": ids[ib][keep], "hamming": hd[keep].astype(np.int64)}
        )

    return (
        ds.map_batches(add_simhash, batch_format="pyarrow", batch_size=1024)
        .select_columns(["doc_id", "simhash"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (SQL-expressible, unlike the sketch variants)
# --------------------------------------------------------------------------

def jaccard_near_dup(
    ds: "ray.data.Dataset", shingle_k: int = 3, threshold: float = 0.8
) -> "ray.data.Dataset":
    """EXACT word-``shingle_k``-gram Jaccard similarity for every document
    pair sharing at least one shingle; keep pairs with jac >= threshold.

    Pairs with zero shared shingles have Jaccard 0 and can never pass the
    threshold, so "shares >= 1 shingle" blocking loses nothing — this is the
    classic inverted-index similarity join, exact where MinHash-LSH
    (``minhash_dedup``) is probabilistic.

    Shape:
      map_batches     distinct shingles per doc -> (shingle, doc_id, n_sh)
      groupby(shingle) -> per-group sorted pairs carrying (na, nb)
      groupby(doc_a, doc_b) count -> intersection size
      map_batches     jac = inter / (na + nb - inter), filter >= threshold

    Scale notes: the pair blow-up is quadratic in shingle df; word 3-grams
    are Zipf-tailed far flatter than unigrams, but a truly hot shingle at
    100 TB would be df-capped at candidate-gen and its pairs recovered by an
    exact verify join on doc_id buckets (same J1 scale path as
    ``minhash_dedup``). Here groups stay exact.
    """
    from ..tokenizer import tokenize

    def emit_shingles(batch: pa.Table) -> pa.Table:
        out_sh: list[str] = []
        out_doc: list[int] = []
        out_n: list[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = tokenize(text or "")
            sh = {
                " ".join(toks[i : i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)
            }
            for s in sh:
                out_sh.append(s)
                out_doc.append(int(did))
                out_n.append(len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_sh, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "n_sh": pa.array(out_n, type=pa.int64()),
            }
        )

    def pairs_of_shingle(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        ns = g["n_sh"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids, ns = ids[order], ns[order]
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "na": [], "nb": []}
            ).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[ia], "doc_b": ids[ib], "na": ns[ia], "nb": ns[ib]}
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        inter = np.int64(len(g))
        na = np.int64(g["na"].iloc[0])
        nb = np.int64(g["nb"].iloc[0])
        jac = float(inter) / float(na + nb - inter)
        if jac < threshold:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jac": []})
        return pd.DataFrame(
            {
                "doc_a": [int(g["doc_a"].iloc[0])],
                "doc_b": [int(g["doc_b"].iloc[0])],
                "jac": [jac],
            }
        )

    return (
        ds.map_batches(emit_shingles, batch_format="pyarrow", batch_size=1024)
        .groupby("shingle")
        .map_groups(pairs_of_shingle, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(finish, batch_format="pandas")
    )
