"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and compare with ``oracle_sql()`` via DuckDB —
row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded).

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if df.empty and not len(df.columns):
        # preserve schema on empty results
        df = pd.DataFrame({f.name: [] for f in res.schema().base_schema})
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha1(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main(sf_dir: str) -> int:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    only = os.environ.get("GRAFT_ONLY")
    if only:
        wanted = set(only.split(","))
        qs = {k: v for k, v in qs.items() if k in wanted}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        finally:
            # the result was materialized to pandas (or the query
            # died); free any stage-tier spill dirs it registered so a
            # 107-query gate run doesn't accumulate derived-data copies
            from ferenda_ray import bsp

            bsp.release_spills()
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(want):
            problems.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(mine) != value_hash(want):
            diff = mine.compare(want) if mine.shape == want.shape else None
            problems.append(
                f"value hash mismatch"
                + (f"; first diffs:\n{diff.head(5)}" if diff is not None and len(diff) else "")
            )
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        code = main(sf)
    finally:
        ray.shutdown()
    sys.exit(code)
