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
