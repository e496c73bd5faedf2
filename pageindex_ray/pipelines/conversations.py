"""Conversation-level (document-hierarchy) pipelines over transcripts.

These carry the reference's tree-roll-up capabilities onto the
conv_id/turn_idx hierarchy:

- ``conv_text_fingerprint``: materialize each conversation's full text in
  turn order — the analogue of ``add_node_text`` (concat of a node's page
  texts, /root/reference/pageindex/utils.py:554-564) — fingerprinted (md5)
  so the result stays small.
- ``conv_summaries``: extractive first-turn summary per conversation — the
  minimal deterministic stand-in for ``generate_node_summary`` / the asyncio
  summary fan-out (utils.py:580-598); an actor-pool map over groups, state
  (the "model") constructed once per actor.
- ``conv_salient_summary``: the semantic upgrade of the same capability —
  idf-weighted salience picks the turn carrying the most corpus-rare
  vocabulary (integer micro-idf sums, so distributed accumulation order
  can't flip the argmax), extract from THAT turn.
- ``event_type_mode``: most-frequent-value aggregate — the pattern of
  ``calculate_page_offset`` (mode of page-offset differences,
  page_index.py:386-406): groupby count -> argmax with deterministic
  tie-break (highest count, then lexicographically smallest value).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.transcripts import ensure_corpus
from ..sources.readers import read_parquet_clean
from ..tokenizer import tokenize


def _conv_bucket_col(conv: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic macro bucket for string conv ids (zlib.crc32 — stable
    across processes, unlike hash())."""
    import zlib

    return np.fromiter(
        (zlib.crc32(str(c).encode("utf-8")) % n_buckets for c in conv),
        dtype=np.int64,
        count=len(conv),
    )


def _bucketed_by_conv(ds: "ray.data.Dataset", fn, n_buckets: int = 256) -> "ray.data.Dataset":
    """Group a transcripts-shaped dataset by conv macro bucket (hundreds of
    groups instead of one Ray group per conversation — at 10^10+ convs the
    per-group Python call would dominate) and apply ``fn`` per bucket."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        return batch.replace_schema_metadata(None).append_column(
            "gbucket", pa.array(_conv_bucket_col(conv, n_buckets), type=pa.int64())
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(fn, batch_format="pyarrow")
    )


def conv_text_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """Per conversation: n_turns and md5 of the turn-ordered concatenated
    text (space-joined) — validates stable turn ordering end-to-end.
    Conversations are processed per macro bucket: one lexsort finds every
    conversation's run; the join+md5 per conversation is the actual work."""
    tpath, _ = ensure_corpus(sf_dir)
    ds = read_parquet_clean(tpath, columns=["conv_id", "turn_idx", "text"])
    schema = pa.schema([("conv_id", pa.string()), ("n_turns", pa.int64()), ("text_md5", pa.string())])

    def concat(g: pa.Table) -> pa.Table:
        conv = np.asarray(g.column("conv_id").to_pylist(), dtype=object)
        turn = g.column("turn_idx").to_numpy().astype(np.int64)
        texts = g.column("text").to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, conv))
        conv, texts = conv[order], texts[order]
        change = np.zeros(len(conv), dtype=bool)
        if len(conv):
            change[0] = True
            change[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(conv))
        out_c, out_n, out_h = [], [], []
        for s, e in zip(starts, ends):
            joined = " ".join(t if t is not None else "" for t in texts[s:e])
            out_c.append(conv[s])
            out_n.append(int(e - s))
            out_h.append(hashlib.md5(joined.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "conv_id": pa.array(out_c, type=pa.string()),
                "n_turns": pa.array(out_n, type=pa.int64()),
                "text_md5": pa.array(out_h, type=pa.string()),
            },
            schema=schema,
        )

    return _bucketed_by_conv(ds, concat)


class ExtractiveSummarizer:
    """Actor-pool 'model' stage: __init__ = LOAD-ONCE, __call__ = summarize
    per batch. The load-once slot is pluggable: ``model_factory`` (any
    zero-arg callable returning an object with ``__call__(texts) ->
    summaries``) is invoked exactly once per actor at construction — the
    shape a real model-backed enrichment needs (the reference's
    ``generate_node_summary`` / ``generate_doc_description``,
    /root/reference/pageindex/utils.py:580-610, re-resolves its client per
    call; here the handle lives for the actor's lifetime and inference is
    batched). Default model: deterministic extractive (first ``n_tokens``
    tokens of the conversation's first turn)."""

    def __init__(self, n_tokens: int = 10, model_factory=None):
        self.n_tokens = n_tokens
        self.model = model_factory() if model_factory is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("first_text").to_pylist()
        if self.model is not None:
            summaries = [str(s) for s in self.model(texts)]  # batched inference
        else:
            summaries = [" ".join(tokenize(t)[: self.n_tokens]) for t in texts]
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "summary": pa.array(summaries, type=pa.string()),
            }
        )


def conv_summaries(sf_dir: str, model_factory=None, concurrency=(1, 4)) -> "ray.data.Dataset":
    tpath, _ = ensure_corpus(sf_dir)
    ds = read_parquet_clean(tpath, columns=["conv_id", "turn_idx", "text"])
    schema = pa.schema([("conv_id", pa.string()), ("first_text", pa.string())])

    def first_turn(g: pa.Table) -> pa.Table:
        conv = np.asarray(g.column("conv_id").to_pylist(), dtype=object)
        turn = g.column("turn_idx").to_numpy().astype(np.int64)
        texts = g.column("text").to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, conv))
        conv, texts = conv[order], texts[order]
        change = np.zeros(len(conv), dtype=bool)
        if len(conv):
            change[0] = True
            change[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(change)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], type=pa.string()),
                "first_text": pa.array(texts[starts], type=pa.string()),
            },
            schema=schema,
        )

    firsts = _bucketed_by_conv(ds, first_turn)
    return firsts.map_batches(
        ExtractiveSummarizer,
        fn_constructor_args=(10, model_factory),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )


class SalienceScorer:
    """Actor-pool stage: per-turn idf salience against the broadcast corpus
    df table — the deterministic replacement for the reference's per-node
    LLM summary fan-out (``generate_summaries_for_structure`` +
    ``generate_node_summary``, /root/reference/pageindex/utils.py:580-610):
    where the reference asks a model "what is this part about", this scores
    each turn by how much corpus-rare vocabulary it carries.

    Salience is an INTEGER: sum of floor(idf * 1e6) over the turn's distinct
    terms — integer summation is order-independent, so the distributed
    accumulation, the driver, and the DuckDB oracle agree exactly (the same
    reason the relational pipelines aggregate money in cents).

    The df table is ray.put once and fetched per actor; at 10^12-doc vocab
    sizes the broadcast becomes a term-keyed join (SURVEY.md §2.5 J1 scale
    note) — same pipeline shape, bigger small side."""

    def __init__(self, df_ref, n_docs: int):
        import math

        self.df = ray.get(df_ref)
        self.n = n_docs
        self._idf_cache: dict[str, int] = {}
        self._log = math.log

    def _idf_micro(self, term: str) -> int:
        v = self._idf_cache.get(term)
        if v is None:
            df = self.df.get(term, 0)
            v = int(self._log((self.n - df + 0.5) / (df + 0.5) + 1.0) * 1_000_000)
            self._idf_cache[term] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..tokenizer import tokenize_batch

        texts = batch.column("text").to_pylist()
        flat, lengths = tokenize_batch(t or "" for t in texts)
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), lengths)
        # distinct (row, term) pairs -> idf per UNIQUE term (Zipf: far fewer
        # than tokens) -> one scatter-add per batch; dedup via an Arrow
        # group_by (hash-dedup in C++, no pandas boxing of the token column)
        if len(flat):
            pairs = pa.table(
                {"row": pa.array(rows, type=pa.int64()), "term": pa.array(flat, type=pa.string())}
            ).group_by(["row", "term"]).aggregate([])
            uniq, inv = np.unique(
                pairs.column("term").to_numpy(zero_copy_only=False), return_inverse=True
            )
            idf_u = np.fromiter(
                (self._idf_micro(t) for t in uniq), dtype=np.int64, count=len(uniq)
            )
            sal = np.zeros(len(texts), dtype=np.int64)
            np.add.at(sal, pairs.column("row").to_numpy(), idf_u[inv])
        else:
            sal = np.zeros(len(texts), dtype=np.int64)
        sal_arr = pa.array(sal, type=pa.int64(), mask=lengths == 0)  # token-less -> null
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "text": batch.column("text"),
                "sal": sal_arr,
            }
        )


def conv_salient_summary(sf_dir: str) -> "ray.data.Dataset":
    """Per conversation: the most SALIENT turn (max idf-weighted distinct
    vocabulary; tie-break lowest turn_idx) and its first-10-token extract.
    Turns with zero tokens are not candidates; a conversation whose turns are
    all empty yields no row (same rule as the SQL twin).

    Shape: df aggregate (partial per-batch distinct counts -> term groupby)
    -> broadcast -> salience map_batches (actor pool) -> per-conv argmax."""
    from ray.data.aggregate import Sum

    tpath, _ = ensure_corpus(sf_dir)
    ds = read_parquet_clean(tpath, columns=["conv_id", "turn_idx", "text"])

    df_partial_schema = pa.schema([("term", pa.string()), ("pdf", pa.int64())])

    def df_partial(batch: pa.Table) -> pa.Table:
        from ..tokenizer import tokenize_batch

        flat, lengths = tokenize_batch(t or "" for t in batch.column("text").to_pylist())
        if not len(flat):
            return df_partial_schema.empty_table()
        rows = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        distinct = pa.table(
            {"row": pa.array(rows, type=pa.int64()), "term": pa.array(flat, type=pa.string())}
        ).group_by(["row", "term"]).aggregate([])
        counts = distinct.group_by("term").aggregate([("row", "count")])
        return counts.rename_columns(["term", "pdf"]).cast(df_partial_schema)

    n_docs = ds.count()
    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()
    )
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype(int))))

    pick_schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("summary", pa.string())]
    )

    def pick(g: pa.Table) -> pa.Table:
        sal_list = g.column("sal").to_pylist()
        valid = np.asarray([s is not None for s in sal_list], dtype=bool)
        if not valid.any():
            return pick_schema.empty_table()
        conv = np.asarray(g.column("conv_id").to_pylist(), dtype=object)[valid]
        turn = g.column("turn_idx").to_numpy().astype(np.int64)[valid]
        texts = g.column("text").to_numpy(zero_copy_only=False)[valid]
        sal = np.asarray([s for s in sal_list if s is not None], dtype=np.int64)
        # per conversation: (sal desc, turn asc) winner = run start after
        # this lexsort (conv primary, -sal, then turn)
        order = np.lexsort((turn, -sal, conv))
        conv, turn, texts = conv[order], turn[order], texts[order]
        change = np.zeros(len(conv), dtype=bool)
        change[0] = True
        change[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(change)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], type=pa.string()),
                "turn_idx": pa.array(turn[starts].astype(np.int32), type=pa.int32()),
                "summary": pa.array(
                    [" ".join(tokenize(texts[s] or "")[:10]) for s in starts], type=pa.string()
                ),
            },
            schema=pick_schema,
        )

    scored = ds.map_batches(
        SalienceScorer,
        fn_constructor_args=(df_ref, n_docs),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    return _bucketed_by_conv(scored, pick)


def event_type_mode(sf_dir: str) -> pa.Table:
    """Mode of event_type: tiny groupby-count + deterministic argmax."""
    from ray.data.aggregate import Count

    counts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"), columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    counts = counts.sort_values(["n", "event_type"], ascending=[False, True], kind="stable")
    top = counts.iloc[0]
    return pa.table(
        {
            "event_type": pa.array([top["event_type"]], type=pa.string()),
            "n": pa.array([int(top["n"])], type=pa.int64()),
        }
    )
