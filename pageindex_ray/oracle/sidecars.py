"""Deterministic sketch sidecars for the driver's SQL oracles.

The seeded sketch families (MinHash band keys, SimHash fingerprints,
random-hyperplane band keys, IVF centroid assignments) are not expressible
in ANSI SQL, so their pipelines were rows-only checks in round 1. The fix
(VERDICT.md next-round task 2): precompute the per-item sketch values ONCE,
deterministically, WITHOUT Ray (plain pyarrow + the same pure kernels the
distributed stages call), and write them to /tmp parquet sidecars. The
DuckDB oracle then replicates the ENTIRE pipeline — bucketing, skew guards,
pair generation, exact verification, even connected components (recursive
CTE) — over those sidecars, and the driver's rows+schema+hash compare
becomes a full value-exact gate for the distributed implementation.

What this verifies: every distributed step (band groupby, bucket guards,
pair dedup, the pair-text verify join, union-find, probed scan, top-k merge).
What it assumes: the sketch kernel itself (one pure function evaluated
per-item) — covered separately by pytest property tests in
tests/test_dedup_ann.py.

Analogue of the reference's golden-output discipline
(/root/reference/results-original/ — fixed inputs, committed expected
structures); here the goldens are derived deterministically at import time
instead of committed, because they depend on the driver-generated testdata.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# one shared parameterization for engine queries() calls AND the SQL twins
MINHASH_NUM_PERM = 64
MINHASH_NUM_BANDS = 16
MINHASH_SHINGLE_K = 3
MINHASH_MAX_BUCKET = 1000
MINHASH_THRESHOLD = 0.8

SIMHASH_MAX_HAMMING = 3
SIMHASH_MAX_BUCKET = 2000  # engine's per-band skew guard, modeled in the SQL twin

HYPER_N_PLANES = 8
HYPER_N_BANDS = 4
HYPER_SEED = 13
HYPER_MAX_BUCKET = 4000
HYPER_THRESHOLD = 0.3

IVF_N_CLUSTERS = 16
IVF_NPROBE = 4
IVF_SAMPLE_ROWS = 2048
IVF_N_QUERIES = 5

_ROOT = "/tmp/pageindex_ray_sidecars"


def sidecar_dir(sf_dir: str) -> str:
    return os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))


def _write_atomic(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ensure_sidecars(sf_dir: str) -> dict[str, str]:
    """Idempotently materialize all sketch sidecars for one testdata dir.
    Returns {name: parquet path}. Pure single-process numpy — no Ray."""
    out_dir = sidecar_dir(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "minhash_bands": os.path.join(out_dir, "minhash_bands.parquet"),
        "simhash": os.path.join(out_dir, "simhash.parquet"),
        "hyperplane_bands": os.path.join(out_dir, "hyperplane_bands.parquet"),
        "ivf_assign": os.path.join(out_dir, "ivf_assign.parquet"),
        "ivf_probes": os.path.join(out_dir, "ivf_probes.parquet"),
        "bpe_pieces": os.path.join(out_dir, "bpe_pieces.parquet"),
        "bpe_pieces_conv": os.path.join(out_dir, "bpe_pieces_conv.parquet"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    from ..functions.hashes import MinHasher, simhash64

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_ids = docs.column("doc_id").to_numpy().astype(np.int64)
    texts = docs.column("text").to_pylist()

    # --- MinHash band keys (identical family/seed as MinHashEmitter) -------
    hasher = MinHasher(num_perm=MINHASH_NUM_PERM, shingle_k=MINHASH_SHINGLE_K)
    sigs = hasher.signature_batch(texts)
    keys = hasher.band_keys_batch(sigs, MINHASH_NUM_BANDS)  # (n, B) int64
    n = len(doc_ids)
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, MINHASH_NUM_BANDS), type=pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(MINHASH_NUM_BANDS, dtype=np.int32), n), type=pa.int32()
                ),
                "band_key": pa.array(keys.reshape(-1), type=pa.int64()),
            }
        ),
        paths["minhash_bands"],
    )

    # --- SimHash fingerprints ---------------------------------------------
    sh = np.asarray([simhash64(t or "") for t in texts], dtype=np.uint64)
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "simhash": pa.array(sh.astype(np.int64), type=pa.int64()),
            }
        ),
        paths["simhash"],
    )

    # --- hyperplane band keys + IVF assignment over embeddings ------------
    from ..pipelines.ann import assign_clusters, fit_centroids, ivf_probe_sets

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vec_ids = emb.column("vec_id").to_numpy().astype(np.int64)
    ecol = emb.column("embedding").combine_chunks()
    flat = ecol.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(vec_ids), -1)
    dim = mat.shape[1]

    rng = np.random.default_rng(HYPER_SEED)
    planes = rng.standard_normal((HYPER_N_BANDS, HYPER_N_PLANES, dim))
    weights = (1 << np.arange(HYPER_N_PLANES)).astype(np.int64)
    band_rows = {"vec_id": [], "band_id": [], "band_key": []}
    for t in range(HYPER_N_BANDS):
        bits = (mat @ planes[t].T) > 0
        band_rows["vec_id"].append(vec_ids)
        band_rows["band_id"].append(np.full(len(vec_ids), t, dtype=np.int32))
        band_rows["band_key"].append(bits @ weights)
    _write_atomic(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(band_rows["vec_id"]), type=pa.int64()),
                "band_id": pa.array(np.concatenate(band_rows["band_id"]), type=pa.int32()),
                "band_key": pa.array(np.concatenate(band_rows["band_key"]), type=pa.int64()),
            }
        ),
        paths["hyperplane_bands"],
    )

    cent = fit_centroids(mat[:IVF_SAMPLE_ROWS], IVF_N_CLUSTERS)
    assign = assign_clusters(mat, cent)
    _write_atomic(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, type=pa.int64()),
                "cluster": pa.array(assign.astype(np.int32), type=pa.int32()),
            }
        ),
        paths["ivf_assign"],
    )
    # --- true-BPE (piece -> token count) map ------------------------------
    # one row per DISTINCT pre-tokenizer piece of the documents text, token
    # count from the committed merge table (functions/bpe.py); the SQL twin
    # re-extracts pieces with the shared RE2 pattern and joins this map
    from ..functions.bpe import BPE, PIECE_RE

    bpe = BPE()
    distinct_pieces = sorted({p for t in texts for p in PIECE_RE.findall(t or "")})
    _write_atomic(
        pa.table(
            {
                "piece": pa.array(distinct_pieces, type=pa.string()),
                "n_tokens": pa.array(
                    np.fromiter(
                        (bpe.n_tokens(p) for p in distinct_pieces),
                        dtype=np.int64,
                        count=len(distinct_pieces),
                    ),
                    type=pa.int64(),
                ),
            }
        ),
        paths["bpe_pieces"],
    )

    # --- true-BPE map over the transcripts' FIRST-TURN texts ---------------
    # one row per distinct piece of each conversation's first turn — the
    # vocabulary the BpeRaritySummaryModel enrichment entry ranks; the SQL
    # twin joins this map to reproduce the model's rarity ordering exactly
    from ..sources.transcripts import ensure_corpus

    tpath, _ = ensure_corpus(sf_dir)
    tt = pq.read_table(tpath, columns=["conv_id", "turn_idx", "text"])
    conv = np.asarray(tt.column("conv_id").to_pylist(), dtype=object)
    turn = tt.column("turn_idx").to_numpy().astype(np.int64)
    ttexts = tt.column("text").to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv))
    conv, ttexts = conv[order], ttexts[order]
    change = np.zeros(len(conv), dtype=bool)
    if len(conv):
        change[0] = True
        change[1:] = conv[1:] != conv[:-1]
    first_texts = ttexts[np.flatnonzero(change)]
    conv_pieces = sorted({p for t in first_texts for p in PIECE_RE.findall(t or "")})
    _write_atomic(
        pa.table(
            {
                "piece": pa.array(conv_pieces, type=pa.string()),
                "n_tokens": pa.array(
                    np.fromiter(
                        (bpe.n_tokens(p) for p in conv_pieces),
                        dtype=np.int64,
                        count=len(conv_pieces),
                    ),
                    type=pa.int64(),
                ),
            }
        ),
        paths["bpe_pieces_conv"],
    )

    qmask = vec_ids < IVF_N_QUERIES
    order = np.argsort(vec_ids[qmask])
    qids = vec_ids[qmask][order]
    qmat = mat[qmask][order]
    probe = ivf_probe_sets(qmat, cent, IVF_NPROBE)
    _write_atomic(
        pa.table(
            {
                "query_id": pa.array(np.repeat(qids, IVF_NPROBE), type=pa.int64()),
                "cluster": pa.array(probe.reshape(-1).astype(np.int32), type=pa.int32()),
            }
        ),
        paths["ivf_probes"],
    )
    return paths
