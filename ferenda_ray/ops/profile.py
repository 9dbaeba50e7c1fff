"""Single-pass table profiling — the data-quality primitive a corpus
pipeline runs before/after every transform (row counts, null counts,
ranges per column) without materializing anything but one stats row per
column per block.

Per-batch partial: one (col, n, n_null, min_v, max_v) row per column →
``groupby(col)`` over that tiny stream with Sum/Sum/Min/Max.  Exact →
DuckDB oracle.  The reference's closest surface is the ``status``
action's per-repo counts (``documentrepository.py``; COVERAGE A6);
per-column profiling is a beyond-reference addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def profile_numeric(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """(col, n, n_null, min_v, max_v) per column, exact, one pass."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        cols, ns, nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            arr = b.column(c)
            v = np.asarray(arr.to_numpy(zero_copy_only=False), np.float64)
            ok = v[~np.isnan(v)] if len(v) else v
            cols.append(c)
            ns.append(len(v))
            nulls.append(arr.null_count)
            mins.append(float(ok.min()) if len(ok) else np.inf)
            maxs.append(float(ok.max()) if len(ok) else -np.inf)
        return pa.table({"col": pa.array(cols, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "n_null": pa.array(nulls, pa.int64()),
                         "min_v": pa.array(mins, pa.float64()),
                         "max_v": pa.array(maxs, pa.float64())})

    return (ds.select_columns(columns)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("col")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_null", alias_name="n_null"),
                       Min("min_v", alias_name="min_v"),
                       Max("max_v", alias_name="max_v"))
            .sort("col"))


def profile_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    return profile_numeric(ds, ["event_id", "user_id", "value"])


PROFILE_EVENTS_SQL = """
SELECT col, n, n_null, min_v, max_v FROM (
  SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
         CAST(min(event_id) AS DOUBLE) AS min_v,
         CAST(max(event_id) AS DOUBLE) AS max_v FROM events
  UNION ALL
  SELECT 'user_id', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(user_id) AS BIGINT),
         CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
  FROM events
  UNION ALL
  SELECT 'value', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(value) AS BIGINT),
         CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)
  FROM events
) ORDER BY col
"""
