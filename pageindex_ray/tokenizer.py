"""The single shared tokenizer used by the engine, the oracle, and tests.

Reference analogue: ``count_tokens`` (/root/reference/pageindex/utils.py:23-31)
resolves a tiktoken encoding on every call; here the pattern is compiled once
at module import and shared by every consumer, and the normalization
(casefold + alnum-run extraction) is deliberately chosen so that DuckDB can
replicate it exactly for the driver's oracle-SQL comparison:

    Python:  re.findall(r"[a-z0-9]+", text.lower())
    DuckDB:  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')

Byte-identical tokenization between oracle and engine is a hard requirement
(SURVEY.md §2.9); any change here changes doc_len, df, idf and therefore every
BM25 score.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9]+")

# SQL fragment producing the identical token list for a text column `{col}`.
SQL_TOKENIZE = "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def tokenize(text: str) -> list[str]:
    """text -> list of normalized tokens (lowercase alnum runs)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def token_count(text: str) -> int:
    return len(tokenize(text))


def tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish batch tokenize.

    Returns (flat_terms, row_lengths): all tokens of all rows concatenated,
    plus the per-row token count, so callers can rebuild row offsets with
    ``np.repeat`` / ``np.cumsum`` without Python-level row loops downstream.
    """
    findall = TOKEN_RE.findall
    toks_per_row = [findall(t.lower()) if t else [] for t in texts]
    lengths = np.fromiter((len(t) for t in toks_per_row), dtype=np.int64, count=len(toks_per_row))
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=object), lengths
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in toks_per_row:
        n = len(toks)
        if n:
            flat[pos : pos + n] = toks
            pos += n
    return flat, lengths


# ---------------------------------------------------------------------------
# Pluggable tokenizer registry (SURVEY.md §2.11)
# ---------------------------------------------------------------------------
#
# Reference analogue: the ``pdf_parser=`` backend choice
# (/root/reference/pageindex/utils.py:417,427) — a STRING-keyed selection of
# the text-extraction backend, so the choice can be persisted in config and
# resolved identically by every consumer. Here a tokenizer is declared as a
# regex SPEC rather than a free-form Python callable: the build's hot path
# tokenizes with Arrow C kernels (utf8_lower + split_pattern_regex /
# count_substring_regex) and the driver's oracle tokenizes in DuckDB SQL —
# a spec keeps all three representations (scalar Python, Arrow-vectorized,
# SQL) derivable from one definition and therefore byte-identical, where an
# opaque callable would force a per-row Python loop in the emit stage and
# break oracle parity. Custom tokenizers register a spec
# (``register_tokenizer``); the chosen NAME is persisted in the index's
# meta.json and the query engine resolves the same spec at serving time.

from dataclasses import dataclass as _dataclass

# a-z lowering LUT for the ASCII fast path (byte-identical to utf8_lower on
# pure-ASCII buffers)
_ASCII_LOWER_LUT = np.arange(256, dtype=np.uint8)
_ASCII_LOWER_LUT[ord("A") : ord("Z") + 1] += 32


def _token_byte_lut(token_pattern: str):
    """256-bool token-byte LUT for patterns of the form ``[<class>]+`` with a
    literal ASCII char class (ranges, \\t\\n\\r escapes, optional ^). None
    for anything richer — callers keep the regex kernel. The LUT drives the
    emit fast path: on a pure-ASCII buffer, 'token byte' is a per-byte
    property, so tokenization is numpy boundary arithmetic instead of RE2."""
    m = re.fullmatch(r"\[(\^?)((?:[^\]\\]|\\.)+)\]\+", token_pattern)
    if not m:
        return None
    neg, body = m.group(1) == "^", m.group(2)
    esc = {"t": "\t", "n": "\n", "r": "\r", "\\": "\\", "]": "]", "^": "^", "-": "-"}
    items: list[tuple[str, bool]] = []  # (char, was_escaped)
    i = 0
    while i < len(body):
        if body[i] == "\\":
            if i + 1 >= len(body) or body[i + 1] not in esc:
                return None
            items.append((esc[body[i + 1]], True))
            i += 2
        else:
            items.append((body[i], False))
            i += 1
    lut = np.zeros(256, dtype=bool)
    j = 0
    while j < len(items):
        # a range needs an UNESCAPED dash in the middle; the endpoints may
        # themselves be escaped chars (re treats [\t-z] as the range 9..122)
        if j + 2 < len(items) and items[j + 1] == ("-", False):
            lo, hi = ord(items[j][0]), ord(items[j + 2][0])
            if lo > hi or hi > 127:
                return None
            lut[lo : hi + 1] = True
            j += 3
        else:
            o = ord(items[j][0])
            if o > 127:
                return None
            lut[o] = True
            j += 1
    if neg:
        lut = ~lut
        # non-ASCII bytes never reach the LUT (the fast path bails on them)
        lut[128:] = False
    return lut


@_dataclass(frozen=True)
class TokenizerSpec:
    """One tokenizer in its three equivalent forms.

    ``token_pattern`` matches a single token run (findall / count kernels),
    ``split_pattern`` matches the inter-token separators (Arrow list-split
    kernel; empties are filtered) — the two must be complements over the
    (optionally lowercased) input for the forms to agree.
    """

    name: str
    token_pattern: str
    split_pattern: str
    lowercase: bool = True

    def __post_init__(self):
        object.__setattr__(self, "_re", re.compile(self.token_pattern))
        object.__setattr__(self, "_byte_lut", _token_byte_lut(self.token_pattern))

    # scalar (query-side, oracle helper, tests)
    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        return self._re.findall(text.lower() if self.lowercase else text)

    # Arrow-vectorized (build hot path): text array -> list<string> of tokens
    def arrow_token_lists(self, arr):
        import pyarrow.compute as pc

        if self.lowercase:
            arr = pc.utf8_lower(arr)
        return pc.split_pattern_regex(arr, self.split_pattern)

    # Emit hot path: text array -> (flat nonempty tokens, int64 parent rows).
    # Semantically identical to arrow_token_lists + flatten + drop-empties;
    # on a pure-ASCII buffer with a simple char-class spec it runs as numpy
    # boundary arithmetic (byte LUT + run detection) instead of the RE2
    # split kernel — measured ~6x on the sf4 emit stage, exact-identity
    # pinned by test_arrow_flat_tokens_fast_path_identity.
    def arrow_flat_tokens(self, arr):
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        fast = self._flat_tokens_ascii(arr)
        if fast is not None:
            return fast
        lists = self.arrow_token_lists(arr)
        flat = lists.flatten()
        parents = lists.value_parent_indices().to_numpy()
        nonempty = pc.not_equal(flat, "")
        mask = nonempty.to_numpy(zero_copy_only=False)
        return flat.filter(nonempty), parents[mask].astype(np.int64)

    def _flat_tokens_ascii(self, arr):
        """None unless the spec has a byte LUT AND the buffer is pure ASCII
        (a single non-ASCII byte anywhere falls the whole batch back to the
        regex path — per-byte token classes are only sound for ASCII)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        lut = self._byte_lut
        if lut is None or not isinstance(arr, pa.StringArray):
            return None
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        empty_out = (
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.int64),
        )
        if len(arr) == 0:
            return empty_out
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        lo, hi = int(offsets[0]), int(offsets[-1])
        if hi == lo:
            return empty_out
        data = np.frombuffer(bufs[2], dtype=np.uint8)[lo:hi]
        if int(data.max()) >= 128:
            return None
        # composed class LUT (class-of-lowered-byte) classifies RAW bytes in
        # one pass; lowering is applied only to the surviving token bytes
        is_tok = (lut[_ASCII_LOWER_LUT] if self.lowercase else lut)[data]
        n = len(data)
        rel_off = offsets.astype(np.int64) - lo
        # token starts: a token byte not preceded by one, or at a row start
        prev = np.empty(n, dtype=bool)
        prev[0] = False
        prev[1:] = is_tok[:-1]
        rs = rel_off[:-1]
        prev[rs[rs < n]] = False
        starts = np.flatnonzero(is_tok & ~prev)
        if len(starts) == 0:
            return empty_out
        # token ends: a token byte not followed by one, or at a row end
        nxt = np.empty(n, dtype=bool)
        nxt[-1] = False
        nxt[:-1] = is_tok[1:]
        re_ = rel_off[1:] - 1
        nxt[re_[(re_ >= 0) & (re_ < n)]] = False
        ends = np.flatnonzero(is_tok & ~nxt)
        lengths = ends - starts + 1
        total = int(lengths.sum())
        if total >= (1 << 31):
            return None  # int32 offsets would overflow; regex path handles it
        # parents via per-row token counts (searchsorted on the 16k row
        # offsets over the sorted starts — ~30x fewer comparisons than
        # searchsorted per token) then one repeat
        row_tok_counts = np.diff(np.searchsorted(starts, rel_off))
        parents = np.repeat(
            np.arange(len(arr), dtype=np.int64), row_tok_counts
        )
        cum = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(lengths, out=cum[1:])
        # tokens are disjoint ascending byte runs, so their concatenation is
        # exactly the token-class bytes in buffer order: ONE boolean
        # compress, no index gather; py_buffer wraps numpy zero-copy
        out_bytes = data[is_tok]
        if self.lowercase:
            out_bytes = _ASCII_LOWER_LUT[out_bytes]
        flat = pa.Array.from_buffers(
            pa.utf8(),
            len(starts),
            [None, pa.py_buffer(cum.astype(np.int32)), pa.py_buffer(out_bytes)],
        )
        return flat, parents

    # Arrow-vectorized token COUNT (docmap doc_len): nulls count as 0
    def arrow_token_count(self, arr):
        import pyarrow.compute as pc

        if self.lowercase:
            arr = pc.utf8_lower(arr)
        return pc.fill_null(pc.count_substring_regex(arr, self.token_pattern), 0)

    # DuckDB twin producing the identical token list for column `col`
    def sql(self, col: str) -> str:
        src = f"lower({col})" if self.lowercase else col
        return (
            f"list_filter(string_split_regex({src}, "
            f"'{self.split_pattern}'), x -> x <> '')"
        )


DEFAULT_TOKENIZER = "alnum-lower-v1"

_REGISTRY: dict[str, TokenizerSpec] = {}


def register_tokenizer(spec: TokenizerSpec) -> TokenizerSpec:
    """Register (or replace) a tokenizer spec under its name."""
    _REGISTRY[spec.name] = spec
    return spec


def resolve_tokenizer(t) -> "TokenizerSpec":
    """Name -> registry lookup; a TokenizerSpec passes through. Stages that
    run in Ray WORKER processes take the spec OBJECT (cloudpickled with the
    task), not the name: a custom spec registered on the driver does not
    exist in a fresh worker's registry."""
    return t if isinstance(t, TokenizerSpec) else get_tokenizer(t)


def get_tokenizer(name: str) -> TokenizerSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown tokenizer {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


# The default spec IS the module-level tokenize()/TOKEN_RE contract above.
register_tokenizer(
    TokenizerSpec(
        name=DEFAULT_TOKENIZER,
        token_pattern=r"[a-z0-9]+",
        split_pattern=r"[^a-z0-9]+",
        lowercase=True,
    )
)
# Whitespace tokenizer: punctuation stays attached to words (the classic
# "surface form" variant).
register_tokenizer(
    TokenizerSpec(
        name="ws-lower-v1",
        token_pattern=r"[^ \t\n\r]+",
        split_pattern=r"[ \t\n\r]+",
        lowercase=True,
    )
)
# Case-preserving alphanumeric runs.
register_tokenizer(
    TokenizerSpec(
        name="alnum-case-v1",
        token_pattern=r"[A-Za-z0-9]+",
        split_pattern=r"[^A-Za-z0-9]+",
        lowercase=False,
    )
)
