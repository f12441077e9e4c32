"""Relational query pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator surface — filtered reads with
column pruning, vectorized projections, partial-then-final grouped
aggregation, broadcast semi-joins, hash joins (Dataset.join), sort/top-k,
and windowed/sessionized event processing — each with a DuckDB-checkable
ANSI-SQL oracle (driver contract in __ray_entry__.py).

Float determinism: money sums are computed on ``round(value * 10^k)``
int64 values (the inputs have ≤2-decimal money and ≤2-decimal rates, so the
scaled products are mathematically integral and rounding is exact in both
engines). Sums are then bit-identical regardless of summation order, and
derived averages divide identical integers — so value-hash comparison
against DuckDB is exact, not approximate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _join_partitions(driving: rd.Dataset, rows_per_partition: int = 250_000,
                     cap: int = 1024) -> int:
    """Hash-join partition count sized by DATA VOLUME, not CPU count: each
    all-to-all partition carries ~0.1 s of fixed scheduling/exchange cost
    on this box, so small inputs want few partitions while 100 TB wants
    thousands. ``driving.count()`` on an untransformed parquet read is a
    metadata lookup, not a scan."""
    try:
        n = driving.count()
    except Exception:
        return 8
    return max(4, min(cap, n // rows_per_partition + 1))


# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — filter + partial agg + groupby
# ---------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])

    cutoff = np.datetime64(Q1_CUTOFF, "us")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        disc_price = ext * (1 - disc)
        charge = disc_price * (1 + tax)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_i": pa.array(np.rint(qty).astype(np.int64)),
                "base_c": pa.array(np.rint(ext * 100).astype(np.int64)),
                "disc_c4": pa.array(np.rint(disc_price * 10_000).astype(np.int64)),
                "charge_c6": pa.array(np.rint(charge * 1_000_000).astype(np.int64)),
                "disc_c": pa.array(np.rint(disc * 100).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_i", alias_name="sum_qty"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c4", alias_name="sum_disc_c4"),
            Sum("charge_c6", alias_name="sum_charge_c6"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    agg["avg_qty"] = agg["sum_qty"] / agg["count_order"]
    agg["avg_price"] = agg["sum_base_c"] / 100.0 / agg["count_order"]
    agg["avg_disc"] = agg["sum_disc_c"] / 100.0 / agg["count_order"]
    agg = agg.drop(columns=["sum_disc_c"])
    return agg.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)                  AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)       AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
                                                                               AS sum_disc_c4,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT)
                                                                               AS sum_charge_c6,
       count(*)                                                                AS count_order,
       sum(CAST(round(l_quantity) AS BIGINT)) / CAST(count(*) AS DOUBLE)       AS avg_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*)    AS avg_price,
       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*)         AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: top orders by revenue — broadcast semi-join + hash join + top-k
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_keys = (
        cust.filter(expr=f"c_mktsegment == '{Q3_SEGMENT}'")
        .to_pandas()["c_custkey"]
        .to_numpy()
    )
    # broadcast the (small) key set once; semi-join via the pc.is_in C
    # kernel inside stateless tasks — no actor pool, no per-row Python
    keys_ref = ray.put(pa.array(cust_keys))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def semi_join(t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        return t.filter(
            pc.is_in(t["o_custkey"], value_set=cached_broadcast(keys_ref))
        )

    orders_f = orders.map_batches(semi_join, batch_format="pyarrow")

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_c4": pa.array(np.rint(ext * (1 - disc) * 10_000).astype(np.int64)),
            }
        )

    n_part = _join_partitions(line)
    joined = line.map_batches(rev, batch_format="pyarrow").join(
        orders_f, join_type="inner", num_partitions=n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    # grouped sum on the join output, then per-batch top-10 so only 10
    # rows/block reach the driver (never the full grouped table)
    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_c4", "l_orderkey"],
                              ascending=[False, True]).head(10)

    out = (
        joined.groupby(["l_orderkey", "o_orderdate"])  # orderdate is
        # functionally dependent on the order key — grouping by both avoids
        # a (non-numeric) Min aggregate on the timestamp
        .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
        .map_batches(topk, batch_format="pandas")
        .to_pandas()
    )
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    out = out.sort_values(["revenue_c4", "o_orderkey"],
                          ascending=[False, True]).head(10).reset_index(drop=True)
    # Ray's hash-aggregate downcasts timestamp group keys to datetime64[s];
    # DuckDB returns datetime64[us] and the driver's value hash is
    # width-sensitive for datetimes — restore microsecond precision
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out[["o_orderkey", "o_orderdate", "revenue_c4"]]


Q3_SQL = f"""
SELECT o.o_orderkey, o.o_orderdate,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_c4 DESC, o.o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: revenue by nation — broadcast dimension joins + grouped sum
# ---------------------------------------------------------------------------


def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue by nation: lineitem revenue is partial-aggregated by orderkey
    inside map_batches, hash-joined DISTRIBUTED against orders (both
    fact-scale tables — neither is materialized on the driver), then the
    custkey→nation mapping (dimension-only, broadcast once as an Arrow
    table) turns the join output into 25 partial sums per batch."""
    nation = _read(sf_dir, "nation").to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust_nation = pd.Series(
        cust["c_nationkey"].map(nation_name).to_numpy(),
        index=cust["c_custkey"].to_numpy(),
    )
    lut_ref = ray.put(cust_nation)  # dimension-only broadcast

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_by_order(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.rint(ext * (1 - disc) * 10_000).astype(np.int64)
        df = pd.DataFrame(
            {"l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
             "rev_c4": rev}
        )
        g = df.groupby("l_orderkey", as_index=False)["rev_c4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_part = _join_partitions(line)
    joined = line.map_batches(rev_by_order, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial_by_nation(t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        lut = cached_broadcast(lut_ref)
        names = pd.Series(
            t["o_custkey"].to_numpy(zero_copy_only=False)
        ).map(lut)
        df = pd.DataFrame(
            {"n_name": names,
             "rev_c4": t["rev_c4"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("n_name", as_index=False)["rev_c4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(partial_by_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
        .to_pandas()
        .sort_values(["revenue_c4", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )
    return out[["n_name", "revenue_c4"]]


Q5_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue_c4 DESC, n.n_name
"""


# ---------------------------------------------------------------------------
# events: tumbling-window aggregate + sessionization
# ---------------------------------------------------------------------------


def events_hourly_window(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts // 3_600_000_000) * 3_600_000_000
        val = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pa.array(hour).cast(pa.timestamp("us")),
                "value_c": pa.array(np.rint(val * 100).astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="sum_value_c"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    # Ray's hash-aggregate downcasts the timestamp key to datetime64[s];
    # match DuckDB's microsecond width for the driver's value hash
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


EVENTS_WINDOW_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""

SLIDE_STEP_MIN = 15
SLIDE_WINDOW_MIN = 60


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate (1 h window, 15 min step): each event lands
    in WINDOW/STEP = 4 windows — emitted vectorized per batch (no row
    loops), then a grouped sum over the small (type, window) key space. The
    SQL oracle materializes the same 4 offsets with a VALUES cross join."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    k = SLIDE_WINDOW_MIN // SLIDE_STEP_MIN
    step_us = SLIDE_STEP_MIN * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        base = (ts // step_us) * step_us  # latest step boundary ≤ ts
        offs = (np.arange(k) * step_us)[None, :]
        starts = (base[:, None] - offs).reshape(-1)  # (n*k,) window starts
        return pa.table(
            {
                "event_type": pa.array(np.repeat(types, k)),
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                "value_c": pa.array(np.repeat(val, k)),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="sum_value_c"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


EVENTS_SLIDING_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL {SLIDE_STEP_MIN} MINUTE, ts)
         - k.k * INTERVAL {SLIDE_STEP_MIN} MINUTE AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
GROUP BY 1, 2 ORDER BY 1, 2
"""

SESSION_GAP_MIN = 30


SESSION_ROWS_PER_PARTITION = 500_000


def _hash_partitions(n_rows: int) -> int:
    """Bounded partition count for the co-partition-by-user pattern: the
    per-group Python-call count is the PARTITION count, not the user
    count — at 10^8 users that is ~10^3 interpreter calls instead of
    10^8 (each one a vectorized pass)."""
    return max(8, min(1024, n_rows // SESSION_ROWS_PER_PARTITION + 1))


def events_sessionize(sf_dir: str) -> pd.DataFrame:
    """Per-user session count + longest session length (gap > 30 min starts
    a new session). Scale shape: hash-co-partition by user (ONE shuffle,
    bounded partition count), then ONE vectorized pass per partition —
    sort by (user, ts), session breaks via a segmented diff (a user
    boundary always starts a session), per-user stats via pandas'
    C-level groupby. Never one Python call per user. The SQL oracle uses
    window functions."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    n_part = _hash_partitions(ds.count())

    gap = np.timedelta64(SESSION_GAP_MIN * 60, "s")

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((uid % n_part).astype(np.int64)))

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy()
        new_sess = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        sess_id = np.cumsum(new_sess)  # globally increasing across users
        sizes = (
            pd.DataFrame({"user_id": uid, "sess": sess_id})
            .groupby(["user_id", "sess"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out = sizes.groupby("user_id", sort=False).agg(
            n_sessions=("sess", "size"),
            n_events=("n", "sum"),
            max_session_events=("n", "max"),
        ).reset_index()
        return out.astype(
            {"n_sessions": "int64", "n_events": "int64",
             "max_session_events": "int64"}
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out[["user_id", "n_sessions", "n_events", "max_session_events"]]


EVENTS_SESSION_SQL = f"""
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM d
), sizes AS (
  SELECT user_id, sess_id, count(*) AS n FROM s GROUP BY user_id, sess_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT)  AS n_sessions,
       CAST(sum(n) AS BIGINT)    AS n_events,
       CAST(max(n) AS BIGINT)    AS max_session_events
FROM sizes GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# top-k customers by spend — groupby + sort + limit + broadcast name lookup
# ---------------------------------------------------------------------------


def top_customers(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "total_c": pa.array(np.rint(v * 100).astype(np.int64)),
            }
        )

    agg = (
        orders.map_batches(cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("total_c", alias_name="spend_c"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    agg = agg.merge(cust, left_on="o_custkey", right_on="c_custkey")
    agg = agg.sort_values(["spend_c", "o_custkey"], ascending=[False, True]).head(10)
    return agg[["o_custkey", "c_name", "spend_c", "n_orders"]].reset_index(drop=True)


TOP_CUSTOMERS_SQL = """
SELECT o.o_custkey, c.c_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
       count(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY o.o_custkey, c.c_name
ORDER BY spend_c DESC, o.o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# distinct / set-op coverage
# ---------------------------------------------------------------------------


def part_type_counts(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "part", ["p_type", "p_size", "p_retailprice"])
        .groupby("p_type")
        .aggregate(
            Count(alias_name="n_parts"),
            Min("p_size", alias_name="min_size"),
            Max("p_size", alias_name="max_size"),
        )
        .to_pandas()
        .sort_values("p_type")
        .reset_index(drop=True)
    )
    return out


PART_TYPE_SQL = """
SELECT p_type, count(*) AS n_parts,
       min(p_size) AS min_size, max(p_size) AS max_size
FROM part GROUP BY p_type ORDER BY p_type
"""


def q6_revenue_forecast(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: one filtered scan + a global sum — the pure
    column-pruned predicate-pushdown case (no shuffle at all: per-batch
    partial sums, one tiny final add)."""
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1996-01-01", "us")

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        m = ((ship >= lo) & (ship < hi)
             & (disc >= 0.05 - 1e-9) & (disc <= 0.07 + 1e-9) & (qty < 24))
        rev = np.rint(ext[m] * disc[m] * 10_000).astype(np.int64).sum()
        return pa.table({"rev_c4": pa.array([int(rev)], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64())})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_c4": [int(p["rev_c4"].sum())],
                         "n_items": [int(p["n"].sum())]})


Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
            AS BIGINT) AS revenue_c4,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def region_supplier_stats(sf_dir: str) -> pd.DataFrame:
    """Suppliers per region with account-balance stats: two broadcast
    dimension joins (region ⋈ nation are tiny) + grouped aggregation over
    the supplier table."""
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    n2r = dict(zip(nation["n_nationkey"],
                   nation["n_regionkey"].map(
                       dict(zip(region["r_regionkey"], region["r_name"])))))
    lut_ref = ray.put(n2r)

    def tag(t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        lut = cached_broadcast(lut_ref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        bal = t["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r_name": pa.array(pd.Series(nk).map(lut), pa.string()),
                "bal_c": pa.array(np.rint(bal * 100).astype(np.int64)),
            }
        )

    out = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"),
                   Sum("bal_c", alias_name="sum_bal_c"),
                   Min("bal_c", alias_name="min_bal_c"),
                   Max("bal_c", alias_name="max_bal_c"))
        .to_pandas()
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    return out


REGION_SUPPLIER_SQL = """
SELECT r.r_name,
       count(*) AS n_suppliers,
       CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_c,
       CAST(min(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS min_bal_c,
       CAST(max(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_bal_c
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name ORDER BY r.r_name
"""


# ---------------------------------------------------------------------------
# as-of join — events matched to each user's latest prior order. Ray Data
# has no asof join; the canonical distributed shape is: align both sides
# to a shared schema, co-partition by key (ONE shuffle via groupby), then
# a per-group sorted merge (pandas merge_asof). DuckDB's native ASOF JOIN
# is the oracle.
# ---------------------------------------------------------------------------


def events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """For every event: the same user's most recent order at ts ≥
    orderdate (ties on (custkey, orderdate) broken by max orderkey on both
    sides for determinism). Inner semantics — events with no prior order
    are dropped. Returns (event_id, user_id, ts, o_orderkey, o_orderdate).

    Scale shape: both sides are aligned to one schema with a hash(user)
    partition key, co-partitioned with ONE shuffle (bounded partition
    count), then each partition runs a single ``pd.merge_asof(...,
    by="user_id")`` — the per-user matching happens inside pandas' C
    merge, never one Python call per user."""
    n_rows = (_read(sf_dir, "events", ["event_id"]).count()
              + _read(sf_dir, "orders", ["o_orderkey"]).count())
    n_part = _hash_partitions(n_rows)

    def _part_col(uid_arr) -> pa.Array:
        uid = uid_arr.to_numpy(zero_copy_only=False)
        return pa.array((uid % n_part).astype(np.int64))

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "t": t["ts"],
                "event_id": t["event_id"].cast(pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "part": _part_col(t["user_id"].cast(pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["o_custkey"].cast(pa.int64()),
                "t": t["o_orderdate"],
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "part": _part_col(t["o_custkey"].cast(pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        is_event = g["event_id"].notna()
        evg = g[is_event][["event_id", "user_id", "t"]].sort_values(
            ["t", "event_id"], kind="mergesort")
        odg = g[~is_event][["user_id", "o_orderkey", "t"]]
        if not len(evg) or not len(odg):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype=g["t"].dtype),
                    "o_orderkey": pd.Series(dtype="int64"),
                    "o_orderdate": pd.Series(dtype=g["t"].dtype),
                }
            )
        # tie-break: one order per (user, timestamp) (max orderkey)
        odg = odg.groupby(["user_id", "t"], as_index=False)["o_orderkey"].max()
        odg = odg.sort_values("t", kind="mergesort")
        odg["o_orderdate"] = odg["t"]
        m = pd.merge_asof(evg, odg, on="t", by="user_id",
                          direction="backward")
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "ts": m["t"],
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "o_orderdate": m["o_orderdate"],
            }
        )

    out = (
        ev.union(od)
        .groupby("part")
        .map_groups(asof_part, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["ts"] = out["ts"].astype("datetime64[us]")
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out


EVENTS_ASOF_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
FROM events e
ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# range join — per event, how many events (any user) landed in the
# preceding RANGE_WIN_MIN minutes (self-inclusive). Ray Data has no range
# join; the scale shape is interval bucketing: probe rows land in their
# own time bucket, build rows in their bucket AND the next one, so every
# probe finds its full window inside ONE co-partitioned group — the
# group count is bounded by the time span, not the row count. The oracle
# is DuckDB's native range (IE) join.
# ---------------------------------------------------------------------------

RANGE_WIN_MIN = 5


def events_range_join_counts(sf_dir: str) -> pd.DataFrame:
    """(event_id, n_win): count of events with ts in (e.ts − 5 min, e.ts]
    across all users. Within each bucket group the count is two vectorized
    searchsorted probes on the sorted build-side timestamps."""
    win_us = RANGE_WIN_MIN * 60 * 1_000_000
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def emit(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = ts // win_us
        # probe copy (role 0) in its own bucket; build copies (role 1) in
        # own + next bucket so any probe's window is fully local
        return pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([bucket, bucket, bucket + 1])),
                "role": pa.array(np.repeat(
                    np.array([0, 1, 1], np.int8), len(ts))),
                "ts_us": pa.array(np.concatenate([ts, ts, ts])),
                "event_id": pa.array(np.concatenate([ids, ids, ids])),
            }
        )

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g["role"] == 0]
        if not len(probes):
            return pd.DataFrame({"event_id": [], "n_win": []}).astype(
                {"event_id": "int64", "n_win": "int64"})
        build = np.sort(g[g["role"] == 1]["ts_us"].to_numpy())
        ts = probes["ts_us"].to_numpy()
        n = (np.searchsorted(build, ts, side="right")
             - np.searchsorted(build, ts - win_us, side="right"))
        return pd.DataFrame(
            {"event_id": probes["event_id"].astype("int64"),
             "n_win": n.astype("int64")}
        )

    return (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_group, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


EVENTS_RANGE_SQL = f"""
SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_win
FROM events a JOIN events b
  ON b.ts > a.ts - INTERVAL {RANGE_WIN_MIN} MINUTE AND b.ts <= a.ts
GROUP BY a.event_id ORDER BY a.event_id
"""


# ---------------------------------------------------------------------------
# events_props_extract: semi-structured JSON projection + grouped aggregate
# ---------------------------------------------------------------------------


def events_props_extract(sf_dir: str) -> pd.DataFrame:
    """Per-event-type stats over the integer ``k`` field inside the
    ``props`` JSON column: (event_type, n_events, sum_k, min_k, max_k).

    The extraction kernel is a VECTORIZED regex projection (pandas C
    engine) specialized to the column's fixed object shape — the
    simdjson-style "raw-filter then parse" pattern; no per-row
    json.loads. n_events counts every row; sum/min/max skip rows where
    the key is absent, matching SQL NULL semantics (tested on a fixture
    with missing keys; a type with NO k anywhere raises loudly rather
    than faking a 0 where SQL would return NULL). Per-batch partial
    combine, then a tiny groupby over (event_types × batches) rows."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        et = pd.Series(t["event_type"].to_pylist())
        ks = (
            pd.Series(t["props"].to_pylist())
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        g = pd.DataFrame({"event_type": et, "k": ks}).groupby(
            "event_type", sort=False
        )["k"]
        out = pd.DataFrame(
            {
                "n": g.size(),
                "s": g.sum(),    # NaN-skipping; 0.0 for an all-missing batch
                "mn": g.min(),   # NaN for an all-missing batch — stays float
                "mx": g.max(),   # in the partial so the FINAL min/max can
            }                    # still skip it (SQL NULL-skip semantics)
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "n": pa.array(out["n"].astype("int64"), pa.int64()),
                "s": pa.array(out["s"].astype("int64"), pa.int64()),
                "mn": pa.array(out["mn"], pa.float64()),
                "mx": pa.array(out["mx"], pa.float64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        p.groupby("event_type", sort=True)
        .agg(n_events=("n", "sum"), sum_k=("s", "sum"),
             min_k=("mn", "min"), max_k=("mx", "max"))
        .reset_index()
    )
    for c in ("n_events", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    return out


EVENTS_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# events_running_total: per-user ordered window cumsum (window function)
# ---------------------------------------------------------------------------


def events_running_total(sf_dir: str) -> pd.DataFrame:
    """(event_id, user_id, running_cents): cumulative integer-cents sum per
    user in (ts, event_id) order — the ranked-window-function shape
    (sum OVER PARTITION BY ... ORDER BY ... ROWS UNBOUNDED PRECEDING).

    Scale shape: the sessionize pattern — hash-co-partition by user (ONE
    shuffle, bounded partition count), then ONE vectorized pass per
    partition (sort + pandas C-level grouped cumsum). Cents are quantized
    with the same floor(x*100 + 0.5) IEEE expression the SQL spells, so
    the int64 running sums are bit-exact at any partitioning."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_part = _hash_partitions(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((uid % n_part).astype(np.int64)))

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.floor(
            g["value"].to_numpy(dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        run = (
            pd.Series(cents).groupby(
                g["user_id"].to_numpy(), sort=False).cumsum()
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "user_id": g["user_id"].astype("int64").to_numpy(),
                "running_cents": run.astype("int64").to_numpy(),
            }
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(running_part, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return out[["event_id", "user_id", "running_cents"]]


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q1_rollup: GROUP BY ROLLUP (grouping-sets surface)
# ---------------------------------------------------------------------------


def q1_rollup(sf_dir: str) -> pd.DataFrame:
    """Q1's scaled-integer sums with ROLLUP subtotals: one row per
    (returnflag, linestatus), per returnflag ('ALL' linestatus), and a
    grand total ('ALL', 'ALL').

    Scale shape: ONE distributed partial+final aggregate produces the base
    cells; every rollup level is then derived from that TINY result by
    additivity (integer sums re-sum exactly) — no second pass over the
    fact table, which is how grouping sets should execute at 100 TB."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_shipdate"])
    cutoff = np.datetime64(Q1_CUTOFF, "us")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_i": pa.array(np.rint(qty).astype(np.int64)),
                "base_c": pa.array(np.rint(ext * 100).astype(np.int64)),
            }
        )

    base = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_i", alias_name="sum_qty"),
            Sum("base_c", alias_name="sum_base_c"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    cols = ["sum_qty", "sum_base_c", "count_order"]
    lvl1 = base.groupby("l_returnflag", as_index=False)[cols].sum()
    lvl1["l_linestatus"] = "ALL"
    total = pd.DataFrame([base[cols].sum()])
    total["l_returnflag"] = "ALL"
    total["l_linestatus"] = "ALL"
    out = pd.concat([base, lvl1, total], ignore_index=True)
    for c in cols:
        out[c] = out[c].astype("int64")
    return (
        out[["l_returnflag", "l_linestatus"] + cols]
        .sort_values(["l_returnflag", "l_linestatus"], kind="mergesort")
        .reset_index(drop=True)
    )


Q1_ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)            AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       count(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# customers_without_orders: distributed ANTI-JOIN on the relational surface
# ---------------------------------------------------------------------------


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """(c_custkey, c_name, acctbal_cents) for customers with NO orders in
    1995-H1 — the relational anti-join surface (the crawl engine's
    seen-filter is the same shape fused into actors; this is the generic
    Dataset form). The date slice keeps the check non-vacuous: every
    customer in the synthetic data has SOME order, ~half sat out 1995-H1.

    Scale shape: the orders side is date-filtered at the scan, collapsed
    to DISTINCT custkeys (per-batch partial distinct, then one groupby —
    far fewer rows into the join), then a native hash ``left_anti`` join;
    both sides co-partitioned by the key, nothing broadcast or collected."""
    from ._schema import heal_blocks

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1995-07-01", "us")

    def distinct_part(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        return pa.table({"o_custkey": pc.unique(t.filter(m)["o_custkey"])})

    okeys = (
        orders.map_batches(distinct_part, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    # aggregate -> join edge: empty hash partitions emit zero-column blocks
    # that poison the Acero join (pipelines/_schema.py)
    okeys = heal_blocks(okeys) or okeys
    n_part = _join_partitions(cust)
    out = (
        cust.join(okeys, join_type="left_anti", num_partitions=n_part,
                  on=("c_custkey",))
        .to_pandas()
    )
    if "c_acctbal" not in out.columns:   # all-matched => schema-less empty
        return pd.DataFrame(
            {"c_custkey": [], "c_name": [], "acctbal_cents": []}
        ).astype({"c_custkey": "int64", "c_name": "object",
                  "acctbal_cents": "int64"})
    out["acctbal_cents"] = np.rint(
        out["c_acctbal"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
    return (
        out[["c_custkey", "c_name", "acctbal_cents"]]
        .astype({"c_custkey": "int64"})
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= DATE '1995-01-01'
    AND o.o_orderdate <  DATE '1995-07-01'
)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# q4_order_priority: EXISTS semi-join + grouped count (TPC-H Q4 shape)
# ---------------------------------------------------------------------------


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, order_count) for 1995-Q3 orders having at least
    one RETURNED lineitem (l_returnflag = 'R'; the synthetic lineitem has
    no commit/receipt dates) — the TPC-H Q4 EXISTS semi-join shape,
    executed as a native hash ``left_semi`` join.

    Scale shape: the lineitem side collapses to DISTINCT qualifying orderkeys
    inside map_batches (partial distinct + one groupby) before the join;
    the final count groups the (small) surviving orders."""
    from ._schema import heal_blocks

    lo = np.datetime64("1995-07-01", "us")
    hi = np.datetime64("1995-10-01", "us")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                                      "o_orderdate"])

    def in_window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def late_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["l_returnflag"], pa.scalar("R"))
        return pa.table(
            {"o_orderkey": pc.unique(t.filter(m)["l_orderkey"])})

    lk = (
        line.map_batches(late_keys, batch_format="pyarrow")
        .groupby("o_orderkey")
        .count()
        .select_columns(["o_orderkey"])
    )
    lk = heal_blocks(lk) or lk
    n_part = _join_partitions(line)
    out = (
        orders.map_batches(in_window, batch_format="pyarrow")
        .join(lk, join_type="left_semi", num_partitions=n_part,
              on=("o_orderkey",))
        .groupby("o_orderpriority")
        .count()
        .to_pandas()
        .rename(columns={"count()": "order_count"})
    )
    out["order_count"] = out["order_count"].astype("int64")
    return (
        out[["o_orderpriority", "order_count"]]
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1995-07-01' AND o.o_orderdate < DATE '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# events_pivot: per-user event-type count matrix (PIVOT surface)
# ---------------------------------------------------------------------------

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view): the
    PIVOT operator as pre-projected conditional aggregates — each batch
    one-hot expands event_type into fixed count columns, then ONE
    groupby-sum produces the pivoted matrix directly. No pivot-specific
    shuffle: at 100 TB this is exactly one partial+final aggregate pass.
    (The column set is a declared constant; discovering it would be one
    tiny distinct scan first.)"""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def onehot(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        cols = {"user_id": t["user_id"]}
        for ty in PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.cast(
                pc.equal(et, pa.scalar(ty)), pa.int64())
        return pa.table(cols)

    out = (
        ds.map_batches(onehot, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{ty}", alias_name=f"n_{ty}")
                     for ty in PIVOT_TYPES])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for ty in PIVOT_TYPES:
        out[f"n_{ty}"] = out[f"n_{ty}"].astype("int64")
    return out[["user_id"] + [f"n_{ty}" for ty in PIVOT_TYPES]]


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# user_window_activity: FULL OUTER join of two window aggregates
# ---------------------------------------------------------------------------

ACTIVITY_W1 = ("2024-01-02 00:00:00", "2024-01-02 06:00:00")
ACTIVITY_W2 = ("2024-01-05 00:00:00", "2024-01-05 06:00:00")


def user_window_activity(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_w1, n_w2): per-user event counts in two disjoint time
    windows, FULL OUTER joined — users active in only one window appear
    with 0 on the other side (both one-sided classes are non-empty in the
    synthetic data, so the outer semantics are actually exercised).

    Scale shape: each window aggregates independently (filter at the
    batch, partial+final count), then one hash full_outer join of the two
    small per-user tables; missing sides become integer zeros (never NULL
    keys — the driver's sort-based value hash chokes on mixed None)."""
    from ._schema import heal_blocks

    def window_counts(lo: str, hi: str, out_col: str) -> rd.Dataset:
        lo64 = np.datetime64(lo.replace(" ", "T"), "us")
        hi64 = np.datetime64(hi.replace(" ", "T"), "us")
        ds = _read(sf_dir, "events", ["user_id", "ts"])

        def in_window(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(t["ts"], pa.scalar(lo64)),
                        pc.less(t["ts"], pa.scalar(hi64)))
            return t.filter(m).select(["user_id"])

        agg = (
            ds.map_batches(in_window, batch_format="pyarrow")
            .groupby("user_id")
            .count()
            .rename_columns({"count()": out_col})
        )
        return heal_blocks(agg) or agg

    w1 = window_counts(*ACTIVITY_W1, "n_w1")
    w2 = window_counts(*ACTIVITY_W2, "n_w2").rename_columns(
        {"user_id": "user_id_r"})
    out = (
        w1.join(w2, join_type="full_outer",
                num_partitions=_join_partitions(_read(sf_dir, "events")),
                on=("user_id",), right_on=("user_id_r",))
        .to_pandas()
    )
    for c in ("n_w1", "n_w2"):
        out[c] = out[c].fillna(0).astype("int64")
    return (
        out[["user_id", "n_w1", "n_w2"]]
        .astype({"user_id": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )


USER_WINDOW_ACTIVITY_SQL = f"""
WITH w1 AS (
  SELECT user_id, count(*) AS n_w1 FROM events
  WHERE ts >= TIMESTAMP '{ACTIVITY_W1[0]}' AND ts < TIMESTAMP '{ACTIVITY_W1[1]}'
  GROUP BY user_id
), w2 AS (
  SELECT user_id, count(*) AS n_w2 FROM events
  WHERE ts >= TIMESTAMP '{ACTIVITY_W2[0]}' AND ts < TIMESTAMP '{ACTIVITY_W2[1]}'
  GROUP BY user_id
)
SELECT COALESCE(w1.user_id, w2.user_id) AS user_id,
       CAST(COALESCE(w1.n_w1, 0) AS BIGINT) AS n_w1,
       CAST(COALESCE(w2.n_w2, 0) AS BIGINT) AS n_w2
FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# distinct_kmv_sketch: mergeable distinct-count sketch (K-minimum-values)
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_HASH_HEX = 12                 # 48-bit hash space
KMV_SPACE = 1 << (4 * KMV_HASH_HEX)


def distinct_kmv_sketch(sf_dir: str) -> pd.DataFrame:
    """One-row (k, kth_min_h, est_distinct): a K-minimum-values distinct
    sketch over lineitem.l_orderkey — the mergeable-sketch operator shape.
    h(v) = first 12 hex digits of md5(str(v)) (48-bit, the same pinned
    spec corpus_sample_stratified uses), the sketch is the K smallest
    DISTINCT hash values, and est = (k-1)·2^48 // kth_min — all integer,
    so the sketch AND the estimate are bit-stable against a relational
    DuckDB oracle (accuracy itself is pytest-gated vs the exact count).

    Scale shape: each batch emits its own ≤K minimum distinct hashes
    (per-batch partial sketch — the mergeable property), the tiny partial
    pool is deduplicated and bottom-K'd in one distributed sort+limit;
    no full distinct shuffle of the key column ever happens."""
    from ._schema import heal_blocks

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    if ds.count() == 0:
        # an all-empty read never runs the partial (zero-row blocks skip
        # map_batches) and the schema-less pool would crash the groupby —
        # return the degenerate sketch directly
        return pd.DataFrame(
            {"k": [0], "kth_min_h": [0], "est_distinct": [0]}
        ).astype("int64")

    def partial_kmv(t: pa.Table) -> pa.Table:
        vals = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        hv = np.fromiter(
            (int(hashlib.md5(str(int(v)).encode()).hexdigest()[:KMV_HASH_HEX],
                 16) for v in vals),
            dtype=np.int64, count=len(vals),
        )
        hv.sort()
        return pa.table({"hv": pa.array(hv[:KMV_K])})

    pool = ds.map_batches(partial_kmv, batch_format="pyarrow")
    # dedup the partial pool (the same key can appear in many batches),
    # then global bottom-K
    dedup = pool.groupby("hv").count().select_columns(["hv"])
    dedup = heal_blocks(dedup) or dedup
    kmin = dedup.sort("hv").limit(KMV_K).to_pandas()["hv"]
    k = int(len(kmin))
    if k == 0:
        return pd.DataFrame({"k": [0], "kth_min_h": [0], "est_distinct": [0]}
                            ).astype("int64")
    kth = int(kmin.max())
    est = (k - 1) * KMV_SPACE // kth if kth > 0 else 0
    return pd.DataFrame(
        {"k": [k], "kth_min_h": [kth], "est_distinct": [est]}
    ).astype("int64")


DISTINCT_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT CAST(concat('0x',
         substr(md5(CAST(l_orderkey AS VARCHAR)), 1, {KMV_HASH_HEX}))
         AS BIGINT) AS hv
  FROM lineitem
), kmin AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K})
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(max(hv) AS BIGINT) AS kth_min_h,
       CAST((count(*) - 1) * {KMV_SPACE} // max(hv) AS BIGINT) AS est_distinct
FROM kmin
"""


# ---------------------------------------------------------------------------
# heavy_hitters_topk: provably-exact top-K via Misra-Gries candidate pruning
# ---------------------------------------------------------------------------

HH_TOPK = 20
HH_MG_K = 4096               # per-batch summary bound (≤ MG_K keys/batch)
HH_DRIVER_LIMIT = 2_000_000  # candidate partial-count rows: driver merge below


def heavy_hitters_topk(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """Exact top-K most frequent event users WITHOUT ever shuffling the
    full key column — the second mergeable-sketch family next to
    distinct_kmv_sketch (frequency instead of cardinality).

    Pass 1 keeps, per batch, only keys with local count > n_b/(MG_K+1):
    the Misra-Gries survivor set (≤ MG_K keys), computed vectorized off
    the batch histogram. Any key with GLOBAL count > N/(MG_K+1) must
    clear that bar in at least one batch (pigeonhole over the batch
    partition), so the candidate union provably contains every
    sufficiently-heavy key. Pass 2 exactly counts candidates only
    (sorted-array broadcast membership). The result is certified exact by
    checking the K-th count strictly exceeds N/(MG_K+1) — every excluded
    key is bounded below that — and FAILS LOUDLY when the distribution is
    too flat to certify (the dedup_clusters fail-loud rule; raise
    HH_MG_K to certify flatter distributions).

    Scale: per-batch summaries ≤ MG_K rows; candidate partial counts
    ≤ n_batches × MG_K rows, merged on the driver below HH_DRIVER_LIMIT
    and via a distributed groupby-sum above (mode forces either;
    equality-tested)."""
    from ray.data.aggregate import Sum as _Sum

    from ._schema import heal_blocks

    ds = _read(sf_dir, "events", ["user_id"])
    n_total = ds.count()
    if n_total == 0:
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "user_id": pd.Series(dtype="int64"),
                             "n_events": pd.Series(dtype="int64")})

    def mg_survivors(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(u, return_counts=True)
        keep = cnts * (HH_MG_K + 1) > len(u)
        return pa.table(
            {"user_id": pa.array(vals[keep].astype(np.int64), pa.int64())})

    sur = ds.map_batches(mg_survivors, batch_format="pyarrow").to_pandas()
    # an all-empty survivor set comes back zero-COLUMN (schema loss on
    # empty typed blocks) — that means NOTHING was heavy enough to track,
    # which is the uncertifiable case below
    cand = (np.unique(sur["user_id"].to_numpy(dtype=np.int64))
            if "user_id" in sur.columns else np.array([], dtype=np.int64))
    ref = ray.put(cand)

    def count_candidates(t: pa.Table, _ref=ref) -> pa.Table:
        a = ray.get(_ref)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            m = np.zeros(len(u), dtype=bool)
        else:
            idx = np.searchsorted(a, u)
            idx[idx >= len(a)] = 0
            m = a[idx] == u
        vals, cnts = np.unique(u[m], return_counts=True)
        return pa.table({
            "user_id": pa.array(vals.astype(np.int64), pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    empty_counts = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
    if len(cand) == 0:
        # nothing was heavy enough to track — fall through to the
        # certification check, which rejects this as uncertifiable
        counts = empty_counts
    else:
        partials = ds.map_batches(count_candidates, batch_format="pyarrow")
        if mode == "auto":
            # partial rows ≤ n_blocks × |cand|; size blocks off the row
            # count (~100k rows/block is the read-bounded layout's order)
            est_rows = len(cand) * max(1, n_total // 100_000)
            mode = ("driver" if est_rows <= HH_DRIVER_LIMIT
                    else "distributed")
        if mode == "driver":
            counts = (
                partials.to_pandas()
                .groupby("user_id", as_index=False)["n"].sum()
            )
        else:
            merged = heal_blocks(
                partials.groupby("user_id")
                .aggregate(_Sum("n", alias_name="n"))
            )
            counts = (merged.to_pandas() if merged is not None
                      else empty_counts)

    top = (
        counts.sort_values(["n", "user_id"], ascending=[False, True],
                           kind="mergesort")
        .head(HH_TOPK)
        .reset_index(drop=True)
    )
    # certification — two independent exactness certificates:
    # (a) coverage: candidate counts sum to N ⇒ the candidate set IS the
    #     full key set, nothing was pruned;
    # (b) bound: ≥ K candidates and the K-th count strictly beats
    #     N/(MG_K+1), the ceiling on every key the sketch may have dropped.
    kth = int(top["n"].iloc[-1]) if len(top) else 0
    covered = int(counts["n"].sum()) == n_total
    bound_ok = len(counts) >= HH_TOPK and kth * (HH_MG_K + 1) > n_total
    if not (covered or bound_ok):
        raise RuntimeError(
            f"heavy_hitters_topk: cannot certify exact top-{HH_TOPK} — "
            f"K-th count {kth} ≤ N/(MG_K+1) = {n_total}/{HH_MG_K + 1} and "
            "candidates do not cover all events; the distribution is too "
            "flat for this summary bound. Raise HH_MG_K."
        )
    out = pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "user_id": top["user_id"].to_numpy(dtype=np.int64),
        "n_events": top["n"].to_numpy(dtype=np.int64),
    })
    return out.astype({"rank": "int64", "user_id": "int64",
                       "n_events": "int64"})


HEAVY_HITTERS_SQL = f"""
SELECT CAST(rank AS BIGINT) AS rank, user_id,
       CAST(n_events AS BIGINT) AS n_events
FROM (
  SELECT user_id, count(*) AS n_events,
         row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank
  FROM events GROUP BY user_id
) WHERE rank <= {HH_TOPK} ORDER BY rank
"""
