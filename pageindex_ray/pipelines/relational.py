"""Relational operator demos over the TPC-H-ish test tables.

These exercise the generic engine surface (filter, projection, partial
aggregation, broadcast join, sort/top-k, windowed grouping) against exact
DuckDB SQL oracles.

Float policy: monetary sums use exact integer-cent arithmetic
(``floor(x*100 + 0.5)`` per row, identical expression in SQL) so distributed
aggregation order cannot perturb the result — a groupby SUM of float64 is
order-dependent in the last ulp, int64 is not. (The analogue of pinning the
accumulation order for BM25 scores, SURVEY.md §7.3.)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ..sources.readers import read_parquet_clean


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.floor(pc.add(pc.multiply(col, pa.scalar(100.0)), pa.scalar(0.5))).cast(pa.int64())


def q1_pricing(sf_dir: str) -> pa.Table:
    """Pricing summary per (returnflag, linestatus): partial per-batch
    aggregation inside map_batches, then a tiny final groupby (the
    combiner-then-shuffle pattern, SURVEY.md §2.6 A6)."""
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    # fixed partial schema: an empty input batch must emit the SAME schema
    # as a populated one; Arrow-native group_by keeps the whole partial
    # zero-conversion (a pandas detour re-boxes every key string AND attaches
    # unhashable pandas schema metadata that defeats Ray's schema dedup)
    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("sum_qty_cents", pa.int64()),
            ("sum_base_cents", pa.int64()),
            ("sum_disc_cents", pa.int64()),
            ("partial_count", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_c": _cents(batch.column("l_quantity")),
                "base_c": _cents(batch.column("l_extendedprice")),
                "disc_c": _cents(disc_price),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_c", "sum"), ("qty_c", "count")]
        )
        g = g.select(
            ["l_returnflag", "l_linestatus", "qty_c_sum", "base_c_sum", "disc_c_sum", "qty_c_count"]
        ).rename_columns(partial_schema.names)
        return g.cast(partial_schema)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("partial_count", alias_name="count_order"),
        )
    )
    return out.to_pandas().pipe(pa.Table.from_pandas, preserve_index=False)


def top_revenue_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k orders by discounted revenue; broadcast-join order metadata onto
    the tiny top-k result (never a full shuffle join for a k-row lookup)."""
    from ray.data.aggregate import Sum

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("rev_c", pa.int64())])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "rev_c": _cents(rev)})
        g = t.group_by("l_orderkey").aggregate([("rev_c", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c"]).cast(rev_schema)

    top = (
        li.map_batches(revenue, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="revenue_cents"))
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )

    # k-row lookup side: read only the needed order rows (predicate pushdown)
    keys = top["l_orderkey"].tolist()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("o_orderkey"), pa.array(keys))),
        batch_format="pyarrow",
    ).to_pandas()
    merged = top.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    merged = merged.sort_values(
        ["revenue_cents", "l_orderkey"], ascending=[False, True], kind="stable"
    )[["l_orderkey", "revenue_cents", "o_custkey"]]
    return pa.Table.from_pandas(merged, preserve_index=False)


def customer_nation_rollup(sf_dir: str) -> pa.Table:
    """customer ⋈ nation ⋈ region rollup via broadcast hash join: the dim
    tables are ray.put once and looked up per batch (SURVEY.md §2.5 J1)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    # broadcast as dense position-indexed arrays (nationkeys are 0..24):
    # per-batch lookup is then a vectorized numpy take, not a dict loop
    max_nk = int(dim["n_nationkey"].max())
    n_by_key = np.empty(max_nk + 1, dtype=object)
    r_by_key = np.empty(max_nk + 1, dtype=object)
    n_by_key[dim["n_nationkey"].to_numpy()] = dim["n_name"].to_numpy()
    r_by_key[dim["n_nationkey"].to_numpy()] = dim["r_name"].to_numpy()
    dim_ref = ray.put((n_by_key, r_by_key))

    annotate_schema = pa.schema(
        [
            ("r_name", pa.string()),
            ("n_name", pa.string()),
            ("sum_acctbal_cents", pa.int64()),
            ("n_customers", pa.int64()),
        ]
    )

    class Annotate:
        def __init__(self):
            self.n_by_key, self.r_by_key = ray.get(dim_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch.column("c_nationkey").to_numpy()
            t = pa.table(
                {
                    "r_name": pa.array(self.r_by_key[nk], type=pa.string()),
                    "n_name": pa.array(self.n_by_key[nk], type=pa.string()),
                    "bal_c": _cents(batch.column("c_acctbal")),
                }
            )
            g = t.group_by(["r_name", "n_name"]).aggregate(
                [("bal_c", "sum"), ("bal_c", "count")]
            )
            return g.rename_columns(annotate_schema.names).cast(annotate_schema)

    from ray.data.aggregate import Sum

    out = (
        read_parquet_clean(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_nationkey", "c_acctbal"]
        )
        .map_batches(Annotate, batch_format="pyarrow", batch_size=65536, concurrency=(1, 4))
        .groupby(["r_name", "n_name"])
        .aggregate(
            Sum("sum_acctbal_cents", alias_name="sum_acctbal_cents"),
            Sum("n_customers", alias_name="n_customers"),
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_sessions(sf_dir: str, gap_seconds: int = 1800, n_buckets: int = 256) -> pa.Table:
    """Per-user sessionization: sort-within-group + gap rule — the windowed /
    as-of pattern (SURVEY.md §2.5 J3). Exact ints.

    Users are grouped into macro buckets (user_id % n_buckets); ONE lexsort
    per bucket orders every user's events, and the gap rule is evaluated
    vectorized across the whole bucket with run-boundary resets — no
    per-user Python call (at 10^8+ users, per-group map_groups would
    dominate; same pattern as pipelines/dedup.py macro-bucketing)."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("n_sessions", pa.int64())]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        # normalize ANY timestamp unit via an Arrow cast to ns (round 2
        # assumed timestamp[us] and multiplied by 1000 — silently 1000x off
        # for ms- or ns-unit inputs)
        ts_ns = batch.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "ts_ns": pa.array(ts_ns, type=pa.int64()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "gbucket": pa.array(uid % n_buckets, type=pa.int64()),
            }
        )

    def sessionize(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy().astype(np.int64)
        ts = g.column("ts_ns").to_numpy().astype(np.int64)
        eid = g.column("event_id").to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        if n == 0:
            return schema.empty_table()
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = uid[1:] != uid[:-1]
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = 0
        gaps[1:] = ts[1:] - ts[:-1]
        new_session = (gaps > gap_seconds * 1_000_000_000) & ~change
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, n))
        extra = np.add.reduceat(new_session.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(lens, type=pa.int64()),
                "n_sessions": pa.array(extra + 1, type=pa.int64()),
            },
            schema=schema,
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(sessionize, batch_format="pyarrow")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_tumbling(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate: per (event_type, 1h epoch bucket) counts
    and value cents — the streaming-window shape expressed as a bucketed
    groupby over event time (SURVEY.md §2.10 note: Ray Data is batch; windows
    are bucket columns). Bucket is exact int64 epoch-hours."""
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())  # unit-safe
        hour = pc.floor(pc.divide(ts_us.cast(pa.float64()), pa.scalar(3_600_000_000.0))).cast(pa.int64())
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour_bucket": hour,
                "value_c": _cents(batch.column("value")),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("value_c", alias_name="sum_value_cents"), Count(alias_name="n_events"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def parts_by_brand(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"), columns=["p_brand", "p_retailprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"p_brand": batch.column("p_brand"), "retail_c": _cents(batch.column("p_retailprice"))}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("retail_c", alias_name="sum_retail_cents"), Count(alias_name="n_parts"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_by_type(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"), "value_c": _cents(batch.column("value"))}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("value_c", alias_name="sum_value_cents"), Count(alias_name="n_events"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
