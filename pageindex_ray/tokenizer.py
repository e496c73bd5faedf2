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
