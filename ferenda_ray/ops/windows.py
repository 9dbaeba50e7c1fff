"""Windowed / ordered operators Ray Data lacks natively: as-of join,
gap-based sessionization, per-key running totals, and a multi-source
termset union + semi-join.

These are the "custom operator" tier of SURVEY §2 (reference analogs:
the news/TOC ordered groupings `documentrepository.py:3153-3300`, the
keyword termset union/semi-join `sources/general/keyword.py:105-222`).
Each is built as hash-bucketed ``groupby(bucket).map_groups`` with the
per-group work fully vectorized in pandas — the partitioning assumption
is that ONE KEY's rows fit in a worker's heap (true for per-user event
streams; a hot key would be split by a secondary time-range salt).

Bucketing by ``hash(key) % num_buckets`` instead of grouping by the raw
key keeps the number of groups (and hence map_groups tasks) bounded and
lets each task process thousands of keys vectorized; ``num_buckets``
scales with the cluster, not with key cardinality.

Money/value sums use exact int64 cents (see relational._cents) so
results are bit-identical to the sequential DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ferenda_ray.ops.relational import _t
from ferenda_ray.util import bucket_keys

SESSION_GAP_MIN = 30


def _bucket_col(df: pd.DataFrame, key: str, num_buckets: int) -> pd.DataFrame:
    # df may be a slice of the batch (rename/filter upstream) — assign on
    # a copy to avoid pandas SettingWithCopyWarning chained-write ambiguity
    df = df.copy()
    # vectorized: int keys hash via splitmix, strings via ONE polars
    # hash kernel — never per-row python+sha1 (bucket = co-location
    # only; nothing persisted depends on the hash choice)
    df["bucket"] = bucket_keys(df[key].to_numpy(), num_buckets)
    return df


# -- as-of join -----------------------------------------------------------

def events_asof_orders(sf_dir: str, num_buckets: int = 16):
    """As-of join: each event matched to the same user's most recent
    order at-or-before the event time (inner semantics — events with no
    prior order drop out).

    Both sides are hash-bucketed on the user key and UNIONed into one
    Dataset with a ``side`` tag; one shuffle co-locates each key's rows,
    then ``pandas.merge_asof`` runs per bucket. This is the scale path:
    no broadcast (orders is a fact table), one all-to-all keyed by the
    join key, skew bounded by per-user row counts.
    """
    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id"])
    od = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def tag_ev(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"user_id": "key", "ts": "t"})
        df["side"] = 0
        df["o_orderkey"] = pd.Series([pd.NA] * len(df), dtype="Int64")
        df["o_totalprice"] = 0.0
        return _bucket_col(df, "key", num_buckets)

    def tag_od(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"o_custkey": "key", "o_orderdate": "t"})
        df["side"] = 1
        df["event_id"] = pd.Series([pd.NA] * len(df), dtype="Int64")
        df["o_orderkey"] = df["o_orderkey"].astype("Int64")
        cols = ["event_id", "t", "key", "side", "o_orderkey", "o_totalprice"]
        return _bucket_col(df[cols], "key", num_buckets)

    both = ev.map_batches(tag_ev, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g.side == 0][["event_id", "key", "t"]].copy()
        right = g[g.side == 1][["key", "t", "o_orderkey", "o_totalprice"]].copy()
        if left.empty or right.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "ts": pd.Series(dtype="datetime64[us]"),
                                 "o_orderkey": pd.Series(dtype="int64"),
                                 "o_totalprice": pd.Series(dtype="float64")})
        # deterministic: one order per (key, date) — keep max orderkey
        right = (right.sort_values(["key", "t", "o_orderkey"])
                 .groupby(["key", "t"], as_index=False).tail(1))
        left = left.sort_values(["t", "event_id"], kind="mergesort")
        right = right.sort_values("t", kind="mergesort")
        m = pd.merge_asof(left, right, on="t", by="key", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        out = pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["key"].astype("int64"),
            "ts": m["t"],
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "o_totalprice": m["o_totalprice"].astype("float64"),
        })
        return out

    return both.groupby("bucket").map_groups(asof, batch_format="pandas")


EVENTS_ASOF_ORDERS_SQL = """
WITH o AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                               ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


# -- range (interval) join ------------------------------------------------

def lineitems_shipped_within(sf_dir: str, days: int = 30,
                             num_buckets: int = 16):
    """Range (interval) join: per order, how many of its lineitems
    shipped inside [o_orderdate, o_orderdate + days). Same union+bucket
    cogroup shape as the as-of join; the per-bucket interval match is a
    vectorized pandas equi-merge on the key followed by an interval
    mask (per-key row counts bound the blowup — the partitioning
    assumption)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    od = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderdate"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"l_orderkey": "key"})
        df["side"] = 0
        df["o_orderdate"] = pd.Series([pd.NaT] * len(df),
                                      dtype="datetime64[us]")
        return _bucket_col(df, "key", num_buckets)

    def tag_od(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"o_orderkey": "key"})
        df["side"] = 1
        df["l_linenumber"] = pd.Series([pd.NA] * len(df), dtype="Int64")
        df["l_shipdate"] = pd.Series([pd.NaT] * len(df),
                                     dtype="datetime64[us]")
        cols = ["key", "l_linenumber", "l_shipdate", "side", "o_orderdate"]
        return _bucket_col(df[cols], "key", num_buckets)

    width = pd.Timedelta(days=days)

    def interval_count(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                              "n_shipped": pd.Series(dtype="int64")})
        left = g[g.side == 0][["key", "l_linenumber", "l_shipdate"]]
        right = g[g.side == 1][["key", "o_orderdate"]]
        if left.empty or right.empty:
            return empty
        m = right.merge(left, on="key", how="inner")
        m = m[(m.l_shipdate >= m.o_orderdate)
              & (m.l_shipdate < m.o_orderdate + width)]
        if m.empty:
            return empty
        out = (m.groupby("key", as_index=False)
               .agg(n_shipped=("l_linenumber", "size"))
               .rename(columns={"key": "o_orderkey"}))
        return out.astype({"o_orderkey": "int64", "n_shipped": "int64"})

    both = li.map_batches(tag_li, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))
    return both.groupby("bucket").map_groups(interval_count,
                                             batch_format="pandas")


LINEITEMS_SHIPPED_WITHIN_SQL = """
SELECT o.o_orderkey, count(*) AS n_shipped
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
"""


# -- gap sessionization ---------------------------------------------------

def user_sessions(sf_dir: str, gap_min: int = SESSION_GAP_MIN,
                  num_buckets: int = 16):
    """Gap-based sessionization (the engine's streaming-window analog):
    a new session starts when a user's inter-event gap exceeds
    ``gap_min`` minutes. Per user: session and event counts."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_col(df, "user_id", num_buckets)

    gap = pd.Timedelta(minutes=gap_min)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g.user_id.ne(g.user_id.shift())
        new_sess = new_user | (g.ts - g.ts.shift() > gap)
        out = (pd.DataFrame({"user_id": g.user_id, "new_s": new_sess.astype("int64")})
               .groupby("user_id", as_index=False)
               .agg(n_sessions=("new_s", "sum"), n_events=("new_s", "size")))
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(sessions, batch_format="pandas"))


USER_SESSIONS_SQL = f"""
WITH g AS (
    SELECT user_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id
"""


# -- per-key running total ------------------------------------------------

def events_running_total(sf_dir: str, num_buckets: int = 16):
    """Ordered cumulative sum per user (window-function analog of the
    news/TOC ordered renderings): each event with the user's running
    value total. Exact int64-cents cumsum → bit-identical to the
    oracle's window sum."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["value_c"] = (df["value"] * 100).round().astype("int64")
        return _bucket_col(df.drop(columns=["value"]), "user_id", num_buckets)

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        csum = g.groupby("user_id")["value_c"].cumsum()
        return pd.DataFrame({"user_id": g.user_id, "ts": g.ts,
                             "event_id": g.event_id,
                             "running_value": csum / 100.0})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(running, batch_format="pandas"))


EVENTS_RUNNING_TOTAL_SQL = """
SELECT user_id, ts, event_id,
       sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) / 100.0 AS running_value
FROM events
"""


# -- multi-source termset union + semi-join -------------------------------

def users_in_both(sf_dir: str):
    """Keyword-termset analog (reference ``keyword.py:105-222``): union
    two per-source key aggregates, keep keys present in BOTH sources
    (semi-join), with per-source counts. Two small pre-aggregated
    shuffles instead of a row-level join."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    od = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def count_ev(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = b.group_by("user_id").aggregate([("user_id", "count")])
        return pa.table({"user_id": g.column("user_id"),
                         "n_events": pc.cast(g.column("user_id_count"),
                                             pa.int64()),
                         "n_orders": pa.array([0] * g.num_rows, pa.int64())})

    def count_od(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = b.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({"user_id": g.column("o_custkey"),
                         "n_events": pa.array([0] * g.num_rows, pa.int64()),
                         "n_orders": pc.cast(g.column("o_custkey_count"),
                                             pa.int64())})

    both = (ev.map_batches(count_ev, batch_format="pyarrow")
            .union(od.map_batches(count_od, batch_format="pyarrow"))
            .groupby("user_id")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_orders", alias_name="n_orders")))
    return both.filter(
        expr="n_events > 0 and n_orders > 0")


USERS_IN_BOTH_SQL = """
SELECT e.user_id, e.n_events, o.n_orders
FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
  ON e.user_id = o.o_custkey
"""


# -- funnel analysis (ordered-sequence detection per user) -----------------

FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_stages(sf_dir: str, num_buckets: int = 16):
    """Per-user funnel progression: furthest step of
    view → click → purchase reached IN ORDER (each step strictly after
    the previous step's first occurrence). Same hash-bucket
    partitioning as :func:`user_sessions` — one shuffle on
    ``hash(user_id) % B``, then fully vectorized per bucket (no
    per-user Python loop). Output (user_id, funnel_stage 0-3)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_col(df, "user_id", num_buckets)

    def stages(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": g.user_id.unique()})
        prev = None  # user_id -> first ts of the previous step, in order
        reached = pd.Series(0, index=users.user_id, dtype="int64")
        for i, step in enumerate(FUNNEL_STEPS, start=1):
            ev = g[g.event_type == step]
            if prev is not None:
                cut = ev.user_id.map(prev)
                ev = ev[ev.ts > cut.fillna(pd.Timestamp.max)]
            first = ev.groupby("user_id").ts.min()
            reached.loc[first.index] = i
            prev = first
        return pd.DataFrame({"user_id": reached.index,
                             "funnel_stage": reached.to_numpy()})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(stages, batch_format="pandas")
            .sort("user_id"))


FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.t2 IS NOT NULL THEN 3
                 WHEN c.t1 IS NOT NULL THEN 2
                 WHEN v.t0 IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
ORDER BY user_id
"""


# -- hopping (sliding) window aggregate ------------------------------------

HOP_SIZE_MIN = 60
HOP_STEP_MIN = 15


def hopping_window_stats(sf_dir: str, size_min: int = HOP_SIZE_MIN,
                         hop_min: int = HOP_STEP_MIN):
    """Hopping-window aggregate (size 60 min, hop 15 min): every event
    counts toward ``size/hop`` overlapping windows — the sliding-window
    streaming primitive (tumbling = the special case ``hop == size``,
    already covered by ``events_hourly``).

    Scale shape: per-batch PARTIAL aggregation to (event_type,
    hop-bucket) happens BEFORE the ×(size/hop) window expansion, so the
    shuffle carries expanded partials (bounded by #types × #buckets ×
    k per block), never expanded raw events. Value sums ride as exact
    int64 cents end-to-end (bit-identical to the sequential oracle).
    """
    import numpy as np
    import polars as pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ferenda_ray.ops.relational import _cents, _unscale

    assert size_min % hop_min == 0
    k = size_min // hop_min
    hop_s = hop_min * 60

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        secs = (b.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[s]").astype(np.int64))
        t = pa.table({"event_type": b.column("event_type"),
                      "hb": pa.array(secs // hop_s, pa.int64()),
                      "c": _cents(b.column("value"))})
        g = (pl.from_arrow(t).group_by("event_type", "hb")
             .agg(pl.len().alias("n"), pl.col("c").sum()))
        # expand each hop-bucket partial into the k windows it feeds
        exp = (g.join(pl.DataFrame({"off": list(range(k))}), how="cross")
               .with_columns((pl.col("hb") - pl.col("off")).alias("wb"))
               .select("event_type", "wb", "n", "c"))
        return exp.to_arrow()

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "wb"])
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("c", alias_name="value_c")))

    def stamp(b: pa.Table) -> pa.Table:
        import numpy as np

        ws = (b.column("wb").to_numpy(zero_copy_only=False)
              * hop_s).astype("datetime64[s]").astype("datetime64[us]")
        return (b.append_column("window_start",
                                pa.array(ws, pa.timestamp("us")))
                .drop_columns(["wb"]))

    return _unscale(agg.map_batches(stamp, batch_format="pyarrow"),
                    {"sum_value": ("value_c", 100.0, None)},
                    drop=["value_c"])


HOPPING_WINDOW_SQL = f"""
WITH e AS (
    SELECT event_type,
           epoch(date_trunc('second', ts))::BIGINT
               // {HOP_STEP_MIN * 60} AS hb,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM events
), w AS (
    SELECT event_type, c,
           unnest(range(hb - {HOP_SIZE_MIN // HOP_STEP_MIN - 1}, hb + 1))
               AS wb
    FROM e
)
SELECT event_type,
       count(*) AS n_events,
       make_timestamp(wb * {HOP_STEP_MIN * 60} * 1000000)
           AS window_start,
       CAST(sum(c) AS BIGINT) / 100.0 AS sum_value
FROM w GROUP BY event_type, wb
"""


# -- tumbling-window top-k (trending leaderboard) ---------------------------

TOPK_WINDOW_H = 6
TOPK_K = 3


def windowed_topk_users(sf_dir: str, window_h: int = TOPK_WINDOW_H,
                        k: int = TOPK_K):
    """Per tumbling ``window_h``-hour window, the top-``k`` users by
    event count (ties → lower user_id) — the trending/leaderboard
    streaming primitive on top of the windowing tier (hopping/
    tumbling aggregates above).

    Scale shape: per-batch PARTIAL (window, user) counts collapse
    before the one coarse window-hash-bucket exchange; the exact
    per-window ranking happens vectorized inside each bucket task
    (every row of a window lands in its bucket). The shuffle carries
    (wb, user_id, n) partials bounded by #windows × #users-per-batch,
    never raw events."""
    import numpy as np
    import polars as pl

    from ferenda_ray.util import bucket_ints

    win_s = window_h * 3600
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        secs = (b.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[s]").astype(np.int64))
        t = pa.table({"user_id": b.column("user_id"),
                      "wb": pa.array(secs // win_s, pa.int64())})
        g = (pl.from_arrow(t).group_by("wb", "user_id")
             .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow())
        w = g.column("wb").to_numpy(zero_copy_only=False)
        return g.append_column("bucket", pa.array(bucket_ints(w, 32)))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["wb", "user_id"], as_index=False)["n"].sum()
             .sort_values(["wb", "n", "user_id"],
                          ascending=[True, False, True],
                          kind="mergesort"))
        s["rank"] = s.groupby("wb").cumcount() + 1
        s = s[s["rank"] <= k]
        return s.astype({"wb": "int64", "user_id": "int64",
                         "n": "int64", "rank": "int64"})

    ranked = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket").map_groups(topk, batch_format="pandas"))

    def stamp(b: pa.Table) -> pa.Table:
        import numpy as np

        ws = (b.column("wb").to_numpy(zero_copy_only=False)
              * win_s).astype("datetime64[s]").astype("datetime64[us]")
        return pa.table({
            "window_start": pa.array(ws, pa.timestamp("us")),
            "rank": b.column("rank"),
            "user_id": b.column("user_id"),
            "n_events": b.column("n"),
        })

    return ranked.map_batches(stamp, batch_format="pyarrow")


WINDOWED_TOPK_SQL = f"""
WITH e AS (
    SELECT user_id,
           epoch(date_trunc('second', ts))::BIGINT
               // {TOPK_WINDOW_H * 3600} AS wb
    FROM events
), c AS (
    SELECT wb, user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM e GROUP BY wb, user_id
)
SELECT make_timestamp(wb * {TOPK_WINDOW_H * 3600} * 1000000)
           AS window_start,
       CAST(row_number() OVER (PARTITION BY wb
                               ORDER BY n_events DESC, user_id)
            AS BIGINT) AS rank,
       user_id, n_events
FROM c
QUALIFY rank <= {TOPK_K}
"""


# -- watermark / late-event accounting --------------------------------

LATENESS_SEC = 300


def late_events(sf_dir: str, lateness_sec: int = LATENESS_SEC,
                num_buckets: int = 32):
    """Watermark semantics over the event log (the streaming-engine
    late-data primitive, evaluated batch-exactly): treating
    ``event_id`` as the arrival sequence, the watermark at each
    arrival is the running MAX event-time over all arrivals so far;
    an event is LATE iff its own event-time trails that watermark by
    more than ``lateness_sec``. Returns per-event-type totals
    ``(n_events, n_late, max_lag_us)`` in exact integer microseconds.

    Distributed exact prefix-MAX with no global sort and O(buckets)
    driver state (the ``pack_sequences`` offset pattern,
    ``ops/text.py``): bucket by ``event_id`` RANGE (order-preserving),
    reduce each bucket's max event-time to the driver, exclusive-scan
    those few scalars into per-bucket seeds, broadcast back; each
    bucket then computes its inclusive running max locally. At 10^12
    events the exchange volume is one (bucket, max) row per bucket
    plus the final per-type counters."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min

    def to_us(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"event_id": b.column("event_id"),
                         "ts_us": us,
                         "event_type": b.column("event_type")})

    from ferenda_ray import bsp

    ev = bsp.spill_dataset(
        rd.read_parquet(_t(sf_dir, "events"),
                        columns=["event_id", "ts", "event_type"])
        .map_batches(to_us, batch_format="pyarrow"), "late_events")

    bounds = ev.aggregate(Min("event_id"), Max("event_id"))
    lo, hi = bounds["min(event_id)"], bounds["max(event_id)"]
    if lo is None or hi is None:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "max_lag_us": pa.array([], pa.int64())}))
    span = max(1, (hi - lo + num_buckets) // num_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        d = b.column("event_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((d - lo) // span, pa.int32()))

    bucketed = ev.map_batches(add_bucket, batch_format="pyarrow")
    per_bucket = {r["bucket"]: r["max(ts_us)"] for r in
                  bucketed.groupby("bucket").aggregate(Max("ts_us"))
                  .take_all()}
    seeds, acc = {}, np.iinfo(np.int64).min
    for bkt in sorted(per_bucket):
        seeds[bkt] = acc
        acc = max(acc, per_bucket[bkt])
    seed_ref = ray.put(seeds)
    late_us = int(lateness_sec) * 1_000_000

    def account(g: pd.DataFrame) -> pd.DataFrame:
        from ferenda_ray.state import fetch

        seed = fetch(seed_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("event_id", kind="mergesort")
        ts = g["ts_us"].to_numpy()
        wm = np.maximum(np.maximum.accumulate(ts), seed)
        out = pd.DataFrame({"event_type": g["event_type"],
                            "late": (ts + late_us < wm),
                            "lag": wm - ts})
        res = (out.groupby("event_type", sort=True)
               .agg(n_events=("late", "size"), n_late=("late", "sum"),
                    max_lag_us=("lag", "max")).reset_index())
        return res.astype({"n_events": "int64", "n_late": "int64",
                           "max_lag_us": "int64"})

    partials = (bucketed.groupby("bucket")
                .map_groups(account, batch_format="pandas"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        res = (g.groupby("event_type", sort=True)
               .agg(n_events=("n_events", "sum"),
                    n_late=("n_late", "sum"),
                    max_lag_us=("max_lag_us", "max")).reset_index())
        return res.astype({"n_events": "int64", "n_late": "int64",
                           "max_lag_us": "int64"})

    return partials.groupby("event_type").map_groups(
        combine, batch_format="pandas")


LATE_EVENTS_SQL = f"""
WITH m AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(max(epoch_us(ts)) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS wm_us
  FROM events)
SELECT event_type,
  count(*) AS n_events,
  CAST(sum(CASE WHEN ts_us + {LATENESS_SEC} * 1000000 < wm_us
           THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(max(wm_us - ts_us) AS BIGINT) AS max_lag_us
FROM m GROUP BY event_type
"""
