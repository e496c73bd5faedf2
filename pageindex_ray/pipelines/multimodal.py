"""Multimodal column plumbing: opaque binary payloads + actor-pool decode.

The container has no image/audio libraries, so the DECODE KERNEL IS A STUB
(deterministic fake features / NotImplementedError for real codecs) — but the
Ray-side plumbing is real and tested: binary columns with typed metadata,
small batch sizes for wide rows, actor-pool map_batches with per-actor setup,
and a typed feature-table output schema.

Payloads here are synthesized deterministically from the documents table
(payload = utf-8 bytes of text), so the driver's SQL oracle can verify the
metadata path exactly (octet_length / md5 twins).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("modality", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_payloads(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> opaque binary column (deterministic stand-in for real
    image/audio blobs). Small batch_size: binary rows are wide."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [(t or "").encode("utf-8") for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "modality": pa.array(["text-blob"] * len(payloads), type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=1024)


class PayloadDecoder:
    """Actor-pool decode stage: real codec loading would happen ONCE here in
    __init__ (model/codec handle per actor); __call__ decodes per batch.

    ``features`` mode emits deterministic fake features (byte stats + md5)
    standing in for embeddings; ``decode`` mode raises NotImplementedError —
    the real image/audio decoder is not available in this environment.
    """

    def __init__(self, mode: str = "features"):
        if mode not in ("features", "decode"):
            raise ValueError(mode)
        self.mode = mode
        # real implementation: self.codec = load_codec(); here: a marker
        self.codec_loaded = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "decode":
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this container; use mode='features' for the plumbing path"
            )
        payloads = batch.column("payload").to_pylist()
        md5s = [hashlib.md5(p).hexdigest() for p in payloads]
        first = [int(p[0]) if len(p) else -1 for p in payloads]
        mean_byte = [float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0 for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": batch.column("n_bytes"),
                "payload_md5": pa.array(md5s, type=pa.string()),
                "first_byte": pa.array(first, type=pa.int64()),
                "mean_byte": pa.array(mean_byte, type=pa.float64()),
            }
        )


def multimodal_features(ds: "ray.data.Dataset", concurrency=(1, 4)) -> "ray.data.Dataset":
    """Full plumbing path: synthesize payloads -> actor-pool feature extract."""
    return synthesize_payloads(ds).map_batches(
        PayloadDecoder,
        fn_constructor_args=("features",),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage (video-style payloads): the payload is
    chunked into fixed-size frames and every ``stride``-th FULL frame is
    emitted with its digest. A real implementation would seek/decode frames
    with a codec handle loaded once in __init__; the chunking/striding/
    fan-out plumbing here is the real, tested part.

    Frame boundaries are defined on BYTES of the payload; the SQL oracle
    mirrors them with substr on the source text, exact for the ASCII test
    corpus."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb = self.frame_bytes
        ids = batch.column("doc_id").to_numpy()
        out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for did, p in zip(ids, batch.column("payload").to_pylist()):
            for j in range(0, len(p) // fb, self.stride):
                out["doc_id"].append(int(did))
                out["frame_idx"].append(j)
                out["frame_md5"].append(hashlib.md5(p[j * fb : (j + 1) * fb]).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "frame_md5": pa.array(out["frame_md5"], type=pa.string()),
            }
        )


class ByteResizer:
    """Actor-pool resize stage: nearest-neighbor downsample of the payload
    byte stream to a fixed length (the 1-D analogue of image resize; a real
    image implementation swaps the gather for a pixel-grid gather after
    decode). Index rule floor(i*nb/L) uses exact integer floor division —
    identical to the oracle's floor(i*nb/L::DOUBLE) because i*nb is exactly
    representable and /L is a power-of-two division."""

    def __init__(self, out_len: int = 64):
        self.out_len = out_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = self.out_len
        grid = np.arange(L, dtype=np.int64)
        sigs = []
        for p in batch.column("payload").to_pylist():
            nb = len(p)
            if nb == 0:
                sigs.append("")
                continue
            idx = (grid * nb) // L
            sigs.append(np.frombuffer(p, dtype=np.uint8)[idx].tobytes().decode("latin-1"))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "resized": pa.array(sigs, type=pa.string())}
        )


def multimodal_frames(ds: "ray.data.Dataset", frame_bytes: int = 256, stride: int = 4):
    return synthesize_payloads(ds).map_batches(
        FrameSampler,
        fn_constructor_args=(frame_bytes, stride),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    )


def multimodal_resize(ds: "ray.data.Dataset", out_len: int = 64):
    return synthesize_payloads(ds).map_batches(
        ByteResizer,
        fn_constructor_args=(out_len,),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    )
