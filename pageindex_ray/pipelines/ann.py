"""Approximate / exact nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch computes a (Q x B) float64 matmul, keeping only
its per-batch top-k per query (a correct partial: the global top-k is a
subset of the union of per-batch top-k). The driver merges Q x (#batches x k)
partial rows — tiny.

Scale path: ``ivf_ann`` — seeded k-means-lite centroids (sampled fit on the
driver, broadcast), cluster assignment as a map_batches stage, and search
restricted to the ``nprobe`` closest clusters. Exact on the probed subset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flat values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


class CosineTopK:
    """map_batches stage: per-batch partial cosine top-k against the
    broadcast query matrix (fetched once per actor)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.query_ids = q["ids"]
        qm = q["matrix"]
        self.qnorm = np.linalg.norm(qm, axis=1)
        self.qm = qm
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy()
        m = _as_matrix(batch.column("embedding"))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (self.qm @ m.T) / (self.qnorm[:, None] * norms[None, :])
        out_q, out_v, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])  # +1 allows dropping self-match later
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
            out_q.extend([int(self.query_ids[qi])] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_ann(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k for each query vector. Tie-break (sim desc, vec_id
    asc). Returns (query_id, rank, vec_id, sim)."""
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix})
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).to_pandas()

    rows = {"query_id": [], "rank": [], "vec_id": [], "sim": []}
    for qid, g in partials.groupby("query_id", sort=True):
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable").head(k)
        n = len(g)
        rows["query_id"].extend([int(qid)] * n)
        rows["rank"].extend(range(n))
        rows["vec_id"].extend(g["vec_id"].astype(np.int64).tolist())
        rows["sim"].extend(g["sim"].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
        }
    )


def embedding_near_dup(ds: "ray.data.Dataset", threshold: float = 0.3) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: (a, b, sim) with a < b and
    cosine >= threshold.

    Sandbox path: the (small) full matrix is broadcast once and every batch
    computes its block-row of the similarity matrix — O(n^2/B) per batch,
    embarrassingly parallel, no shuffle. At 100 TB the same kernel runs per
    LSH bucket (random-hyperplane bucketing -> groupby -> per-bucket block
    matmul) so the quadratic term is bounded by bucket size; the bucketing
    stage is exactly the MinHash-LSH shape in pipelines/dedup.py.
    """
    full = ds.to_pandas().sort_values("vec_id")
    ids_all = full["vec_id"].to_numpy(np.int64)
    mat_all = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    norm_all = np.linalg.norm(mat_all, axis=1)
    norm_all[norm_all == 0] = 1.0
    ref = ray.put({"ids": ids_all, "mat": mat_all, "norm": norm_all})

    class BlockRow:
        def __init__(self):
            d = ray.get(ref)
            self.ids, self.mat, self.norm = d["ids"], d["mat"], d["norm"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy()
            bm = _as_matrix(batch.column("embedding"))
            bnorm = np.linalg.norm(bm, axis=1)
            bnorm[bnorm == 0] = 1.0
            sims = (bm @ self.mat.T) / (bnorm[:, None] * self.norm[None, :])
            ai, bj = np.nonzero(sims >= threshold)
            a = bids[ai]
            bcol = self.ids[bj]
            keep = a < bcol  # dedupe: emit each unordered pair once
            return pa.table(
                {
                    "vec_a": pa.array(a[keep], type=pa.int64()),
                    "vec_b": pa.array(bcol[keep], type=pa.int64()),
                    "sim": pa.array(sims[ai[keep], bj[keep]], type=pa.float64()),
                }
            )

    out = ds.map_batches(
        BlockRow, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    ).to_pandas()
    out = out.sort_values(["vec_a", "vec_b"], kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def fit_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    """Seeded k-means-lite on a driver-side sample (Lloyd, few iterations)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_ann(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    exclude_self: bool = True,
) -> pa.Table:
    """IVF-style ANN: restrict the scan to the nprobe closest centroids per
    query. Exact within the probed subset; recall measured against
    brute_force_ann in tests."""
    sample = ds.limit(sample_rows).to_pandas()
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = fit_centroids(sm, n_clusters)
    cent_ref = ray.put(cent)

    qd = ((query_matrix[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]

    class ProbedTopK(CosineTopK):
        def __init__(self, queries_ref, k):
            super().__init__(queries_ref, k)
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch.column("embedding"))
            d = ((m[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            vec_ids = batch.column("vec_id").to_numpy()
            parts = []
            for qi, pset in enumerate(probe_sets):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                sub = m[mask]
                subids = vec_ids[mask]
                norms = np.linalg.norm(sub, axis=1)
                norms[norms == 0] = 1.0
                row = (self.qm[qi] @ sub.T) / (self.qnorm[qi] * norms)
                kk = min(self.k + 1, len(row))
                idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
                parts.append((qi, subids[idx], row[idx]))
            out_q = [int(self.query_ids[qi]) for qi, ids, _ in parts for _ in ids]
            out_v = [int(v) for _, ids, _ in parts for v in ids]
            out_s = [float(s) for _, _, ss in parts for s in ss]
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_v, type=pa.int64()),
                    "sim": pa.array(out_s, type=pa.float64()),
                }
            )

    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix})
    partials = ds.map_batches(
        ProbedTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).to_pandas()

    rows = {"query_id": [], "rank": [], "vec_id": [], "sim": []}
    for qid, g in partials.groupby("query_id", sort=True):
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable").head(k)
        rows["query_id"].extend([int(qid)] * len(g))
        rows["rank"].extend(range(len(g)))
        rows["vec_id"].extend(g["vec_id"].astype(np.int64).tolist())
        rows["sim"].extend(g["sim"].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
        }
    )
