"""Conversation-level (document-hierarchy) pipelines over transcripts.

These carry the reference's tree-roll-up capabilities onto the
conv_id/turn_idx hierarchy:

- ``conv_text_fingerprint``: materialize each conversation's full text in
  turn order — the analogue of ``add_node_text`` (concat of a node's page
  texts, /root/reference/pageindex/utils.py:554-564) — fingerprinted (md5)
  so the result stays small.
- ``conv_summaries``: extractive stub summary per conversation — the
  deterministic stand-in for ``generate_node_summary`` / the asyncio
  summary fan-out (utils.py:580-598); an actor-pool map over groups, state
  (the "model") constructed once per actor.
- ``event_type_mode``: most-frequent-value aggregate — the pattern of
  ``calculate_page_offset`` (mode of page-offset differences,
  page_index.py:386-406): groupby count -> argmax with deterministic
  tie-break (highest count, then lexicographically smallest value).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.transcripts import ensure_corpus
from ..tokenizer import tokenize


def conv_text_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """Per conversation: n_turns and md5 of the turn-ordered concatenated
    text (space-joined) — validates stable turn ordering end-to-end."""
    tpath, _ = ensure_corpus(sf_dir)
    ds = ray.data.read_parquet(tpath, columns=["conv_id", "turn_idx", "text"])

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        joined = " ".join(t if t is not None else "" for t in g["text"])
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "n_turns": [len(g)],
                "text_md5": [hashlib.md5(joined.encode("utf-8")).hexdigest()],
            }
        )

    return ds.groupby("conv_id").map_groups(concat, batch_format="pandas")


class ExtractiveSummarizer:
    """Actor-pool 'model' stage: __init__ = load-once (here: config only;
    a real model handle in production), __call__ = summarize per batch.
    Summary = first ``n_tokens`` tokens of the conversation's first turn."""

    def __init__(self, n_tokens: int = 10):
        self.n_tokens = n_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("first_text").to_pylist()
        summaries = [" ".join(tokenize(t)[: self.n_tokens]) for t in texts]
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "summary": pa.array(summaries, type=pa.string()),
            }
        )


def conv_summaries(sf_dir: str) -> "ray.data.Dataset":
    tpath, _ = ensure_corpus(sf_dir)
    ds = ray.data.read_parquet(tpath, columns=["conv_id", "turn_idx", "text"])

    def first_turn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        return pd.DataFrame({"conv_id": [g["conv_id"].iloc[0]], "first_text": [g["text"].iloc[0]]})

    firsts = ds.groupby("conv_id").map_groups(first_turn, batch_format="pandas")
    return firsts.map_batches(
        ExtractiveSummarizer,
        fn_constructor_args=(10,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )


def event_type_mode(sf_dir: str) -> pa.Table:
    """Mode of event_type: tiny groupby-count + deterministic argmax."""
    from ray.data.aggregate import Count

    counts = (
        ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type"])
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
