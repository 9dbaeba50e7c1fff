"""Windowed/ordered operators (ops.windows) against hand-computed and
DuckDB-computed expectations on the sf0.001 driver tables."""

import duckdb
import pandas as pd
import pytest

from ferenda_ray.ops import windows as win

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "orders"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _check(ray_res, sql, con):
    got = _canon(ray_res.to_pandas())
    exp = _canon(con.execute(sql).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_join(ray_session, con):
    _check(win.events_asof_orders(SF, num_buckets=4),
           win.EVENTS_ASOF_ORDERS_SQL, con)


def test_sessions(ray_session, con):
    _check(win.user_sessions(SF, num_buckets=4), win.USER_SESSIONS_SQL, con)


def test_running_total(ray_session, con):
    _check(win.events_running_total(SF, num_buckets=4),
           win.EVENTS_RUNNING_TOTAL_SQL, con)


def test_users_in_both(ray_session, con):
    _check(win.users_in_both(SF), win.USERS_IN_BOTH_SQL, con)


def test_sessions_gap_semantics(ray_session):
    """A user with two bursts separated by > gap has exactly 2 sessions."""
    out = win.user_sessions(SF).to_pandas()
    assert (out.n_sessions >= 1).all()
    assert (out.n_sessions <= out.n_events).all()


def test_range_join(ray_session, con):
    con.execute("CREATE VIEW IF NOT EXISTS lineitem AS "
                f"SELECT * FROM '{SF}/lineitem.parquet'")
    _check(win.lineitems_shipped_within(SF, num_buckets=4),
           win.LINEITEMS_SHIPPED_WITHIN_SQL, con)


def test_funnel_stages_vs_duckdb(ray_session):
    import duckdb

    from ferenda_ray.ops import windows as win

    sf = "/root/testdata/sf0.001"
    got = win.funnel_stages(sf).to_pandas()
    want = duckdb.sql(
        win.FUNNEL_SQL.replace("FROM events",
                               f"FROM '{sf}/events.parquet'")).df()
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["funnel_stage"]) == list(want["funnel_stage"])
    assert set(got["funnel_stage"]) - {0} != set()  # some progression


def test_funnel_requires_order(ray_session):
    """A purchase BEFORE the first qualifying click must not count."""
    import pandas as pd
    import pyarrow as pa
    import ray

    import ray.data as rd
    from ferenda_ray.ops import windows as win

    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-01 09:00",   # purchase before view
                              "2024-01-01 10:00", "2024-01-01 12:00"]),
        "event_type": ["view", "click", "purchase", "purchase", "view"],
    })
    import os, tempfile
    d = tempfile.mkdtemp()
    rows.to_parquet(os.path.join(d, "events.parquet"))
    out = win.funnel_stages(d).to_pandas().set_index("user_id")
    assert out.loc[1, "funnel_stage"] == 2  # view→click, purchase too early
    assert out.loc[2, "funnel_stage"] == 1  # view only (purchase first)


def test_hopping_window_oracle(ray_session):
    import duckdb

    from ferenda_ray.ops.windows import (HOPPING_WINDOW_SQL,
                                         hopping_window_stats)

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    mine = (hopping_window_stats("/root/testdata/sf0.001").to_pandas()
            [["event_type", "window_start", "n_events", "sum_value"]]
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True))
    want = (con.sql(HOPPING_WINDOW_SQL).df()
            [["event_type", "window_start", "n_events", "sum_value"]]
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_hopping_window_covers_tumbling(ray_session):
    """hop == size degenerates to the tumbling hourly aggregate."""
    from ferenda_ray.ops.relational import events_hourly
    from ferenda_ray.ops.windows import hopping_window_stats

    hop = (hopping_window_stats("/root/testdata/sf0.001",
                                size_min=60, hop_min=60).to_pandas()
           .sort_values(["event_type", "window_start"])
           .reset_index(drop=True))
    tumb = (events_hourly("/root/testdata/sf0.001").to_pandas()
            .sort_values(["event_type", "hour"]).reset_index(drop=True))
    assert (hop.n_events.values == tumb.n_events.values).all()
    assert (hop.sum_value.values == tumb.sum_value.values).all()
    assert (hop.window_start.values == tumb.hour.values).all()


def test_windowed_topk_users_oracle(ray_session, con):
    from ferenda_ray.ops.windows import (WINDOWED_TOPK_SQL,
                                         windowed_topk_users)

    _check(windowed_topk_users(SF), WINDOWED_TOPK_SQL, con)


def test_windowed_topk_deterministic_ties(ray_session, tmp_path):
    """Equal counts rank by user_id; ranks restart per window."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.windows import windowed_topk_users

    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # window 0: u1 x3, u2 x3 (tie), u3 x1 ; window 1: u9 x2
    for u, n, off_h in ((1, 3, 0), (2, 3, 0), (3, 1, 0), (9, 2, 7)):
        for i in range(n):
            rows.append({"event_id": len(rows), "user_id": u,
                         "ts": ts0 + pd.Timedelta(hours=off_h,
                                                  minutes=i),
                         "event_type": "x", "value": 1.0,
                         "props": "{}"})
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (windowed_topk_users(str(tmp_path), window_h=6, k=2)
           .to_pandas().sort_values(["window_start", "rank"])
           .reset_index(drop=True))
    assert got.user_id.tolist() == [1, 2, 9]   # tie: u1 before u2; u3 cut
    assert got["rank"].tolist() == [1, 2, 1]


def test_late_events_out_of_order(ray_session, tmp_path):
    """Watermark accounting on an engineered out-of-order arrival
    stream: hand-computed lates + DuckDB recompute, with the bucket
    seeds exercised (event straggling across a range-bucket edge)."""
    import datetime

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.windows import LATE_EVENTS_SQL, late_events

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    # arrival order = event_id; event times jump ahead then straggle
    rows = [
        (0, ts(0), "a"),     # wm 0
        (1, ts(1000), "a"),  # wm 1000
        (2, ts(10), "b"),    # lag 990  -> late at 300s
        (3, ts(900), "a"),   # lag 100  -> on time
        (4, ts(2000), "b"),  # wm 2000
        (5, ts(1500), "a"),  # lag 500  -> late
        (6, ts(1999), "b"),  # lag 1    -> on time
        (7, ts(100), "b"),   # lag 1900 -> late (crosses bucket seeds
                             #             at num_buckets=4: bucket 3)
    ]
    tab = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    path = tmp_path / "events.parquet"
    pq.write_table(tab, str(path))

    got = (late_events(str(tmp_path), lateness_sec=300, num_buckets=4)
           .to_pandas().sort_values("event_type")
           .reset_index(drop=True))
    by = dict(zip(got.event_type, got.itertuples()))
    assert (by["a"].n_events, by["a"].n_late) == (4, 1)
    assert (by["b"].n_events, by["b"].n_late) == (4, 2)
    assert by["b"].max_lag_us == 1900 * 1_000_000

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{path}')")
    want = (con.sql(LATE_EVENTS_SQL).df()
            .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            {c: "int64" for c in ("n_events", "n_late", "max_lag_us")}))
