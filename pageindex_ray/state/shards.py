"""Stateful posting shards: the query-side actor pool.

SURVEY.md §2.4 T5: long-lived actors each owning a disjoint set of
term-hash partitions, loading their compressed posting shards from Parquet
ONCE in __init__ and serving term lookups from memory thereafter — the
canonical "state loaded once per worker" pattern the reference lacks (it
re-creates its OpenAI client per call, /root/reference/pageindex/utils.py:35).

Shard ownership: partition pid is owned by actor ``pid % num_shards``;
``term -> crc32(term) % P -> actor`` is a pure function, so routing needs no
directory service. Actors return COMPRESSED blocks (+ df/idf); decoding and
scoring happen at the caller — at 10^12 docs only the query's own posting
bytes cross the wire, never decoded arrays.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray

from ..stages.codec import consolidate_blocks


@ray.remote
class PostingShard:
    """Owns the posting rows of a set of term-hash partitions.

    Block lists are converted to the consolidated numpy/bytes form at load
    time (once), so ``fetch`` ships a handful of arrays + byte strings per
    term instead of thousands of per-block dicts — near-zero-copy through
    the object store."""

    def __init__(self, index_dir: str, part_ids: list[int]):
        # term -> LIST of consolidated sub-lists: a salted hot term can have
        # sub-lists in more than one partition owned by this shard.
        self.terms: dict[str, list[dict]] = {}
        for pid in sorted(part_ids):
            path = os.path.join(index_dir, "postings", f"part-{pid:05d}.parquet")
            if not os.path.exists(path):
                continue  # empty partition (no terms hashed to it)
            table = pq.read_table(path)
            for row in table.to_pylist():
                info = consolidate_blocks(row["blocks"])
                info["df"] = row["df"]  # partition-local (partial for salted terms)
                info["cf"] = row["cf"]
                info["part"] = pid
                self.terms.setdefault(row["term"], []).append(info)

    def num_terms(self) -> int:
        return len(self.terms)

    def fetch(self, terms: list[str]) -> dict[str, list[dict]]:
        """Consolidated posting sub-lists for the requested terms (missing
        terms are simply absent from the result)."""
        return {t: self.terms[t] for t in terms if t in self.terms}
