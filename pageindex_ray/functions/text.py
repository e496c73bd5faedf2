"""Text-analysis scalar functions for training-data pipelines.

Each function is a vectorized per-batch kernel (pyarrow.compute / numpy / a
single C-speed pandas op) meant to run inside ``map_batches`` — the analogue
of the reference's per-page text transforms (``transform_dots_to_colon``,
/root/reference/pageindex/page_index.py:220-224; ``count_tokens``,
utils.py:23-31), but batch-columnar instead of per-string.

Every deterministic function here has an exact DuckDB-SQL twin used by the
driver's oracle comparison; the constants (stopword list, thresholds) are
module-level so both sides read the same values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenizer import TOKEN_RE

# Shared with sources/transcripts.py vocabulary head; a fixed, ordered list so
# the SQL twin can inline the identical set.
STOPWORDS_EN = (
    "the of and to a in is it you that he was for on are with as his they be "
    "at one have this from or had by word but what some we can out other were "
    "all there when up use your how said an each she"
).split()

LANG_EN_THRESHOLD = 0.05  # stopword ratio >= threshold -> "en"


def token_counts(texts: pa.Array) -> pa.Array:
    """Number of tokens per row (== len(tokenize(text)))."""
    return pc.count_substring_regex(pc.utf8_lower(texts), "[a-z0-9]+")


def stopword_counts(texts: pa.Array) -> np.ndarray:
    """Tokens per row that are in STOPWORDS_EN: ONE flattened token stream,
    one np.isin membership pass, one scatter-add back to rows (the per-row
    isin-and-sum loop this replaces allocated an array per document)."""
    from ..tokenizer import tokenize_batch

    stop = np.asarray(STOPWORDS_EN, dtype=object)
    flat, lengths = tokenize_batch(texts.to_pylist())
    out = np.zeros(len(lengths), dtype=np.int64)
    if len(flat):
        rows = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        np.add.at(out, rows, np.isin(flat, stop).astype(np.int64))
    return out


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: n_chars, n_tokens, stopword ratio, mean token
    length. Ratios are float64 divisions of exact ints — bit-identical to the
    SQL twin."""
    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts).cast(pa.int64())
    n_tokens = token_counts(texts).cast(pa.int64())
    n_stop = stopword_counts(texts)
    # total token characters = sum of token lengths (chars minus separators):
    # count of [a-z0-9] characters in the lowered text.
    n_alnum = pc.count_substring_regex(pc.utf8_lower(texts), "[a-z0-9]").cast(pa.int64())

    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    denom = np.maximum(nt, 1.0)
    stop_ratio = n_stop.astype(np.float64) / denom
    mean_tok_len = n_alnum.to_numpy(zero_copy_only=False).astype(np.float64) / denom
    return batch.append_column("n_chars", n_chars) \
        .append_column("n_tokens", n_tokens) \
        .append_column("n_stopwords", pa.array(n_stop, type=pa.int64())) \
        .append_column("stop_ratio", pa.array(stop_ratio, type=pa.float64())) \
        .append_column("mean_tok_len", pa.array(mean_tok_len, type=pa.float64()))


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """N-gram-free heuristic language ID: English stopword-ratio threshold.
    Deterministic and SQL-expressible; 'und' for empty token streams."""
    feats = quality_features(batch, text_col)
    ratio = feats.column("stop_ratio").to_numpy()
    n_tokens = feats.column("n_tokens").to_numpy()
    pred = np.where(n_tokens == 0, "und", np.where(ratio >= LANG_EN_THRESHOLD, "en", "other"))
    return batch.append_column("pred_lang", pa.array(pred.astype(object), type=pa.string()))


def md5_fingerprints(texts: pa.Array) -> pa.Array:
    """Content fingerprint: md5 hex of utf-8 text (DuckDB md5() twin)."""
    return pa.array(
        [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts.to_pylist()],
        type=pa.string(),
    )


def rolling_fingerprint(texts: pa.Array, window: int = 8, mod: int = 1 << 61) -> pa.Array:
    """Polynomial rolling-hash document fingerprint over the token stream:
    hash = sum(base^i * h(token_i)) mod p over a leading window — cheap
    near-duplicate prefilter (not SQL-expressible; verified by unit test)."""
    base = 1000003
    out = np.zeros(len(texts), dtype=np.int64)
    findall = TOKEN_RE.findall
    for i, t in enumerate(texts.to_pylist()):
        toks = findall(t.lower())[:window] if t else []
        h = 0
        for tok in toks:
            th = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            h = (h * base + th) % mod
        out[i] = h
    return pa.array(out, type=pa.int64())
