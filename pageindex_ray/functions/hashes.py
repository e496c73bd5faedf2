"""Sketch/hash kernels for near-duplicate detection: MinHash, SimHash,
word-shingle Jaccard.

All hashing is seeded/derived from md5 (process-independent — Python's
built-in ``hash`` is salted per process and would break determinism across
Ray workers, the same class of bug as the reference's unseeded
``random.sample`` at /root/reference/pageindex/page_index.py:912).

Vectorization strategy (the MinHash emit stage is the hottest sketch loop in
the repo): md5 is computed once per UNIQUE token via a bounded per-process
cache; shingle hashes are a vectorized multiply-mix over the token-hash
array (sliding window, no per-shingle string building); the permutation
family is applied to a whole batch's concatenated shingles in one (P, total)
matrix with a segmented min per document.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..tokenizer import tokenize

_MERSENNE = (1 << 61) - 1
_P61 = np.uint64(_MERSENNE)

# order-sensitive odd mixing constants for shingle window combination
_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
    dtype=np.uint64,
)


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


# token -> uint64 hash, bounded per-process cache (tokens are Zipfian; the
# cache turns per-shingle md5 into amortized one-md5-per-unique-token)
_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = _hash64(t)
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


def _window_mix(th: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive hash of every length-``k`` sliding window of the token
    hash array (vectorized): h(w) = xor_i mix_i * th[w+i]  (uint64 wrap)."""
    n = len(th) - k + 1
    acc = _MIX[0] * th[:n]
    for i in range(1, k):
        acc = np.bitwise_xor(acc, _MIX[i % len(_MIX)] * th[i : i + n])
    # final avalanche so neighbouring windows sharing k-1 tokens decorrelate
    acc = np.bitwise_xor(acc, acc >> np.uint64(33)) * np.uint64(0xFF51AFD7ED558CCD)
    return np.bitwise_xor(acc, acc >> np.uint64(29))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-shingles of the token stream -> uint64 hashes.

    A document shorter than ``k`` tokens contributes its whole token stream
    as one shingle (so two short near-identical docs still compare)."""
    toks = tokenize(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    kk = min(k, len(th))
    return np.unique(_window_mix(th, kk))


def shingle_hash_batch(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Batch form: -> (flat uint64 hashes, per-doc counts). Each doc's
    shingles are distinct and sorted; docs with no tokens contribute 0."""
    parts = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        sh = shingle_hashes(text or "", k)
        counts[i] = len(sh)
        parts.append(sh)
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    return flat, counts


def _mulmod_p61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1), exact, fully vectorized in uint64.

    a, x must be < 2^61. 128-bit product via 32-bit limbs, folded with
    2^61 === 1 (mod p): a*x = hh*2^64 + hl*2^32 + ll === hh*8 + hl' + ll'.
    """
    a_hi, a_lo = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    x_hi, x_lo = x >> np.uint64(32), x & np.uint64(0xFFFFFFFF)
    hh = a_hi * x_hi  # < 2^58
    hl = a_hi * x_lo + a_lo * x_hi  # < 2^62
    ll = a_lo * x_lo  # < 2^64
    hl_hi, hl_lo = hl >> np.uint64(29), hl & np.uint64((1 << 29) - 1)
    s = hh * np.uint64(8) + hl_hi + (hl_lo << np.uint64(32))  # < 2^63
    s = s + (ll >> np.uint64(61)) + (ll & _P61)
    s = (s >> np.uint64(61)) + (s & _P61)
    s = (s >> np.uint64(61)) + (s & _P61)
    return np.where(s >= _P61, s - _P61, s)


def _mod_p61(x: np.ndarray) -> np.ndarray:
    s = (x >> np.uint64(61)) + (x & _P61)
    s = (s >> np.uint64(61)) + (s & _P61)
    return np.where(s >= _P61, s - _P61, s)


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i*x + b_i) mod p,
    p = 2^61 - 1, computed EXACTLY (split multiply mod p — no silent uint64
    wrap), so the family really is the documented universal family.

    Construct once per actor (__init__ of a map_batches class) — the a/b
    parameter draw is seeded, so every worker builds the identical family.
    """

    def __init__(self, num_perm: int = 64, seed: int = 7, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def _apply(self, sh: np.ndarray) -> np.ndarray:
        """(P, n) permuted values of a shingle-hash array."""
        x = _mod_p61(sh)[None, :]
        return _mod_p61(_mulmod_p61(self.a[:, None], x) + self.b[:, None])

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        return self._apply(sh).min(axis=1)

    def signature_batch(self, texts) -> np.ndarray:
        """(n_docs, P) signatures for a batch: ONE (P, total_shingles)
        permutation matrix + a segmented min per document."""
        flat, counts = shingle_hash_batch(texts, self.shingle_k)
        n = len(counts)
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        perm = self._apply(flat)  # (P, total)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        nonempty = counts > 0
        seg_starts = starts[nonempty]
        # minimum.reduceat over each permutation row, segment boundaries = docs
        mins = np.minimum.reduceat(perm, seg_starts, axis=1)  # (P, n_nonempty)
        sigs[nonempty] = mins.T
        return sigs

    def band_keys_batch(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(n_docs, num_bands) int64 LSH bucket keys: multiply-xor mix of each
        band's r signature values (vectorized; replaces per-band md5)."""
        n, P = sigs.shape
        r = P // num_bands
        bands = sigs[:, : num_bands * r].reshape(n, num_bands, r)
        acc = np.zeros((n, num_bands), dtype=np.uint64)
        for j in range(r):
            acc = (acc ^ bands[:, :, j]) * _MIX[j % len(_MIX)]
        acc ^= acc >> np.uint64(31)
        return acc.view(np.int64)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[int]:
        return self.band_keys_batch(sig[None, :], num_bands)[0].tolist()


def simhash64(text: str) -> int:
    """64-bit SimHash over token frequencies (sign of weighted bit votes)."""
    toks = tokenize(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    hashes = _token_hashes(list(uniq))
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


def jaccard_from_hashes(sa: np.ndarray, sb: np.ndarray) -> float:
    """Jaccard of two distinct-sorted shingle-hash arrays."""
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0
