"""Sketch/hash kernels for near-duplicate detection: MinHash, SimHash,
word-shingle Jaccard.

All hashing is seeded/derived from md5 (process-independent — Python's
built-in ``hash`` is salted per process and would break determinism across
Ray workers, the same class of bug as the reference's unseeded
``random.sample`` at /root/reference/pageindex/page_index.py:912).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..tokenizer import tokenize

_MERSENNE = (1 << 61) - 1


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-shingles of the token stream -> uint64 hashes."""
    toks = tokenize(text)
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.asarray([_hash64(s) for s in set(joined)], dtype=np.uint64))


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i*x + b_i) mod p.

    Construct once per actor (__init__ of a map_batches class) — the a/b
    parameter draw is seeded, so every worker builds the identical family.
    """

    def __init__(self, num_perm: int = 64, seed: int = 7, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (P, n): ((a*x + b) mod p) computed in python-int-free vectorized form
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[str]:
        """LSH band bucket keys: md5 of each band's bytes."""
        r = self.num_perm // num_bands
        return [
            hashlib.md5(sig[i * r : (i + 1) * r].tobytes()).hexdigest()
            for i in range(num_bands)
        ]


def simhash64(text: str) -> int:
    """64-bit SimHash over token frequencies (sign of weighted bit votes)."""
    toks = tokenize(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    hashes = np.asarray([_hash64(t) for t in uniq], dtype=np.uint64)
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
    out_bits = (votes > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word k-shingle Jaccard similarity (verification step)."""
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0
