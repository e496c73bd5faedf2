"""Deduplication pipelines over a documents table (doc_id:int64, text:string).

The reference needs no dedup (a single PDF has no duplicate pages,
SURVEY.md §2.8); these are the training-data-scale operators a 100 TB corpus
pipeline requires. All follow the same Ray Data shape:

    map_batches (vectorized hash/sketch per doc)        [stateless or actor]
      -> groupby(bucket key)                            [the only shuffle]
      -> per-group candidate generation / first-wins
      -> pair-verify JOIN back to the corpus by doc_id  [no driver text
         materialization — the corpus streams through a hash shuffle while
         only the (small) pair list is ever held whole]

Exact dedup groups by full-content md5 (the groupby IS the dedup); MinHash-LSH
shingles -> seeded permutations -> band buckets; SimHash buckets each of the
four disjoint 16-bit slices of the 64-bit fingerprint (pigeonhole: <=3 flipped
bits leave at least one slice untouched, so recall at max_hamming<=3 is exact
up to the bucket-size skew guard). Candidate verification (exact Jaccard /
Hamming) happens per pair via the verify join, never all-pairs.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import ray
import ray.data

from ..functions.hashes import MinHasher, hamming64, jaccard, simhash64
from ..functions.text import md5_fingerprints


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_fingerprint(batch: pa.Table) -> pa.Table:
    # replace_schema_metadata(None): parquet blocks carry pandas metadata
    # that fresh pa.table outputs lack; mixed schemas make Ray's
    # schema-dedup hash warn on every shuffle (cosmetic but noisy)
    return batch.replace_schema_metadata(None).append_column(
        "fp", md5_fingerprints(batch.column("text"))
    )


def exact_dedup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep the lowest doc_id per exact content hash.

    hash-partitioned groupby + per-group min — first-wins semantics. Returns
    (doc_id, fp) of the survivors.
    """
    schema = pa.schema([("doc_id", pa.int64()), ("fp", pa.string())])

    def keep_first(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array([int(ids.min())], type=pa.int64()),
                "fp": pa.array([g.column("fp")[0].as_py()], type=pa.string()),
            },
            schema=schema,
        )

    return (
        ds.map_batches(add_fingerprint, batch_format="pyarrow")
        .select_columns(["doc_id", "fp"])
        .groupby("fp")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# pair-verify join (shared by MinHash-LSH and exact-Jaccard near-dup)
# --------------------------------------------------------------------------

_PAIR_REQ_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("p_a", pa.int64()), ("p_b", pa.int64()), ("text", pa.string())]
)


def _pair_text_join(pairs: "ray.data.Dataset", corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Shuffle-join candidate pairs back to the corpus by doc_id and emit one
    group per pair carrying both texts (SURVEY.md §2.5 J1 scale path).

    Shape:  pairs -> 2 request rows each (doc_id, p_a, p_b, text=null)
            corpus -> (doc_id, -1, -1, text)
            union -> groupby(doc_id): attach text to each request row
                  -> groupby(p_a, p_b): the two sides of every pair

    The corpus is never materialized on the driver — it streams through one
    hash shuffle keyed by doc_id; per-group state is one document's text plus
    its (bounded) pair requests. Output rows: (p_a, p_b, text) x2 per pair.
    """

    def to_requests(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "p_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
                "p_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
                "text": pa.nulls(2 * len(a), type=pa.string()),
            },
            schema=_PAIR_REQ_SCHEMA,
        )

    def corpus_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fill = np.full(n, -1, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "p_a": pa.array(fill, type=pa.int64()),
                "p_b": pa.array(fill, type=pa.int64()),
                "text": batch.column("text").cast(pa.string()),
            },
            schema=_PAIR_REQ_SCHEMA,
        )

    attach_schema = pa.schema([("p_a", pa.int64()), ("p_b", pa.int64()), ("text", pa.string())])

    def attach(g: pa.Table) -> pa.Table:
        p_a = g.column("p_a").to_numpy()
        is_doc = p_a == -1
        n_req = int((~is_doc).sum())
        if not n_req:
            return attach_schema.empty_table()
        doc_rows = np.flatnonzero(is_doc)
        text = g.column("text")[doc_rows[0]].as_py() if len(doc_rows) else None
        return pa.table(
            {
                "p_a": pa.array(p_a[~is_doc], type=pa.int64()),
                "p_b": pa.array(g.column("p_b").to_numpy()[~is_doc], type=pa.int64()),
                "text": pa.array([text] * n_req, type=pa.string()),
            },
            schema=attach_schema,
        )

    reqs = pairs.map_batches(to_requests, batch_format="pyarrow")
    docs = corpus.map_batches(corpus_rows, batch_format="pyarrow")
    return reqs.union(docs).groupby("doc_id").map_groups(attach, batch_format="pyarrow")


def verify_pairs_jaccard(
    pairs: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    threshold: float,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """Exact word-shingle Jaccard for each candidate pair via the distributed
    text join; keeps (doc_a, doc_b, jac) with jac >= threshold."""

    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jac", pa.float64())])

    def verify(g: pa.Table) -> pa.Table:
        if g.num_rows != 2:
            return schema.empty_table()  # one side missing from the corpus
        ta, tb = g.column("text")[0].as_py(), g.column("text")[1].as_py()
        jac = jaccard(ta or "", tb or "", shingle_k)
        if jac < threshold:
            return schema.empty_table()
        return pa.table(
            {
                "doc_a": pa.array([g.column("p_a")[0].as_py()], type=pa.int64()),
                "doc_b": pa.array([g.column("p_b")[0].as_py()], type=pa.int64()),
                "jac": pa.array([jac], type=pa.float64()),
            },
            schema=schema,
        )

    sides = _pair_text_join(pairs, corpus)
    return sides.groupby(["p_a", "p_b"]).map_groups(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHashEmitter:
    """Actor-pool stage: doc -> (band_id, band_key, doc_id) LSH bucket rows.
    The permutation family is built once per actor in __init__; signatures
    are computed for the WHOLE batch as one (P, total_shingles) matrix with a
    segmented min (functions.hashes.MinHasher.signature_batch)."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_k: int = 3):
        self.hasher = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        texts = batch.column("text").to_pylist()
        sigs = self.hasher.signature_batch(texts)  # (n, P)
        keys = self.hasher.band_keys_batch(sigs, self.num_bands)  # (n, B) int64
        n = len(doc_ids)
        band_ids = np.tile(np.arange(self.num_bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_key": pa.array(keys.reshape(-1), type=pa.int64()),
                "doc_id": pa.array(np.repeat(doc_ids, self.num_bands), type=pa.int64()),
            }
        )


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _dedup_pair_rows(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (doc_a, doc_b): the same pair surfaces from several buckets."""

    def first(g: pa.Table) -> pa.Table:
        return g.select(["doc_a", "doc_b"]).slice(0, 1).cast(_PAIR_SCHEMA)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> "ray.data.Dataset":
    """LSH candidate pairs: docs sharing any band bucket. Output
    (doc_a, doc_b) with doc_a < doc_b, deduplicated across bands."""

    def pairs_of_bucket(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy().astype(np.int64))
        if len(ids) < 2 or len(ids) > max_bucket:  # skew guard: degenerate buckets
            return _PAIR_SCHEMA.empty_table()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"doc_a": pa.array(ids[ia], type=pa.int64()), "doc_b": pa.array(ids[ib], type=pa.int64())},
            schema=_PAIR_SCHEMA,
        )

    pairs = (
        ds.map_batches(
            MinHashEmitter,
            fn_constructor_args=(num_perm, num_bands, shingle_k),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=(1, 8),
        )
        .groupby(["band_id", "band_key"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
    )
    return _dedup_pair_rows(pairs)


def minhash_verified_edges(
    ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """LSH candidates -> exact-Jaccard verify via the distributed pair join.
    -> (doc_a, doc_b, jac) edges. No stage materializes the corpus."""
    pairs = minhash_candidate_pairs(ds, num_perm, num_bands, shingle_k)
    return verify_pairs_jaccard(pairs, ds, jaccard_threshold, shingle_k)


def minhash_dedup(
    ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """Near-dup clusters: LSH candidates -> exact-Jaccard verify -> union-find.

    Returns (doc_id, canonical_id): canonical_id == min doc_id of the cluster.

    Scale shape: candidate generation and verification are fully distributed
    (band-bucket groupby + pair-text shuffle join); the only driver-side step
    is union-find over the VERIFIED edge list, which is genuinely small (its
    size is the number of true near-dup pairs, not the corpus), and the final
    (doc_id -> canonical) assignment is a map_batches over the corpus with
    the (tiny) non-identity cluster map broadcast via ray.put.
    """
    edges = minhash_verified_edges(ds, jaccard_threshold, num_perm, num_bands, shingle_k)
    edge_tbls = [t for t in (ray.get(r) for r in edges.to_arrow_refs()) if t.num_rows]
    edge_tbl = (
        pa.concat_tables(edge_tbls)
        if edge_tbls
        else pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jac", pa.float64())]).empty_table()
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(edge_tbl.column("doc_a").to_pylist(), edge_tbl.column("doc_b").to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    canon_map = {x: find(x) for x in parent}
    canon_map = {x: c for x, c in canon_map.items() if c != x}
    canon_ref = ray.put(canon_map)

    class AssignCanonical:
        def __init__(self):
            self.canon = ray.get(canon_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy().astype(np.int64)
            canon = np.fromiter(
                (self.canon.get(int(i), int(i)) for i in ids), dtype=np.int64, count=len(ids)
            )
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "canonical_id": pa.array(canon, type=pa.int64()),
                }
            )

    return ds.select_columns(["doc_id"]).map_batches(
        AssignCanonical, batch_format="pyarrow", concurrency=(1, 4)
    )


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

SIMHASH_BANDS = 4  # 4 disjoint 16-bit slices: exact recall for hamming <= 3


def add_simhash(batch: pa.Table) -> pa.Table:
    sims = np.asarray([simhash64(t or "") for t in batch.column("text").to_pylist()], dtype=np.uint64)
    return batch.replace_schema_metadata(None).append_column(
        "simhash", pa.array(sims.astype(np.int64), type=pa.int64())
    )


def simhash_candidates(
    ds: "ray.data.Dataset", max_hamming: int = 3, max_bucket: int = 2000
) -> "ray.data.Dataset":
    """Near-dup pairs: bucket each of the four disjoint 16-bit slices of the
    simhash (multi-band; pigeonhole guarantees every pair within Hamming
    distance 3 shares at least one untouched slice — no prefix blind spot),
    verify Hamming exactly within buckets, distinct across bands.
    Returns (doc_a, doc_b, hamming)."""

    def bucket(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy().astype(np.uint64)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        n = len(ids)
        bands, keys = [], []
        for t in range(SIMHASH_BANDS):
            sl = ((sh >> np.uint64(16 * t)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.append(np.full(n, t, dtype=np.int32))
            keys.append(sl)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bands), type=pa.int32()),
                "band_key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.tile(ids, SIMHASH_BANDS), type=pa.int64()),
                "simhash": pa.array(
                    np.tile(sh.astype(np.int64), SIMHASH_BANDS), type=pa.int64()
                ),
            }
        )

    hschema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())])

    def verify(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy().astype(np.int64)
        sh = g.column("simhash").to_numpy().astype(np.int64).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        if len(ids) < 2 or len(ids) > max_bucket:
            return hschema.empty_table()
        ia, ib = np.triu_indices(len(ids), k=1)
        hd = hamming64(sh[ia], sh[ib])
        keep = hd <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ia][keep], type=pa.int64()),
                "doc_b": pa.array(ids[ib][keep], type=pa.int64()),
                "hamming": pa.array(hd[keep].astype(np.int64), type=pa.int64()),
            },
            schema=hschema,
        )

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1).cast(hschema)

    pairs = (
        ds.map_batches(add_simhash, batch_format="pyarrow", batch_size=1024)
        .select_columns(["doc_id", "simhash"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(verify, batch_format="pyarrow")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (SQL-expressible, unlike the sketch variants)
# --------------------------------------------------------------------------

def jaccard_near_dup(
    ds: "ray.data.Dataset",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_df: int = 256,
) -> "ray.data.Dataset":
    """EXACT word-``shingle_k``-gram Jaccard similarity for every document
    pair sharing at least one shingle with df <= ``max_df``; keep pairs with
    jac >= threshold.

    Pairs with zero shared shingles have Jaccard 0 and can never pass the
    threshold, so "shares >= 1 shingle" blocking loses nothing. The df cap is
    the hot-shingle skew guard (mirrors minhash_candidate_pairs' bucket cap):
    a shingle seen in > max_df docs generates NO pairs — its O(df^2) pair
    blow-up is the scale-killer — but its contribution to every verified
    pair's Jaccard is still EXACT, because similarity is computed by the
    pair-verify join over the full shingle sets of both texts, not by
    counting co-occurrence rows. A qualifying pair is missed only if ALL its
    shared shingles are hot (at threshold 0.8 that needs a pathological
    corpus where every shared shingle appears in >max_df docs).
    """
    from ..tokenizer import tokenize

    def emit_shingles(batch: pa.Table) -> pa.Table:
        out_sh: list[str] = []
        out_doc: list[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = tokenize(text or "")
            sh = {
                " ".join(toks[i : i + shingle_k])
                for i in range(len(toks) - shingle_k + 1)
            }
            out_sh.extend(sh)
            out_doc.extend([int(did)] * len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_sh, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )

    def pairs_of_shingle(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy().astype(np.int64)
        if len(ids) < 2 or len(ids) > max_df:  # df cap: hot-shingle skew guard
            return _PAIR_SCHEMA.empty_table()
        ids = np.sort(ids)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"doc_a": pa.array(ids[ia], type=pa.int64()), "doc_b": pa.array(ids[ib], type=pa.int64())},
            schema=_PAIR_SCHEMA,
        )

    pairs = (
        ds.map_batches(emit_shingles, batch_format="pyarrow", batch_size=1024)
        .groupby("shingle")
        .map_groups(pairs_of_shingle, batch_format="pyarrow")
    )
    candidates = _dedup_pair_rows(pairs)
    return verify_pairs_jaccard(candidates, ds, threshold, shingle_k)
