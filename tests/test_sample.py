"""Sampling-operator tests: deterministic hash/stratified samples vs
DuckDB, reservoir reproducibility + size/uniformity."""

import duckdb
import numpy as np

import ray.data as rd

from ferenda_ray.ops import sample

SF = "/root/testdata/sf0.001"


def _sql(q):
    return duckdb.sql(q.replace("FROM events",
                                f"FROM '{SF}/events.parquet'")).df()


def test_sample_events_matches_duckdb(ray_session):
    got = sample.sample_events(SF).to_pandas()
    want = _sql(sample.SAMPLE_EVENTS_SQL)
    assert len(got) > 0
    assert list(got["event_id"]) == list(want["event_id"])
    assert np.allclose(got["value"], want["value"])


def test_stratified_sample_matches_duckdb(ray_session):
    got = sample.stratified_sample(SF).to_pandas()
    want = _sql(sample.STRATIFIED_SAMPLE_SQL)
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["event_type"]) == list(want["event_type"])
    # Every group hit its quota (sf0.001 has ≥20 events per type).
    assert (got.groupby("event_type").size() == 20).all()


def test_reservoir_sample_reproducible_and_sized(ray_session):
    ds = rd.range(5000)
    a = sample.reservoir_sample(ds, 100, seed=42)
    b = sample.reservoir_sample(rd.range(5000), 100, seed=42)
    assert len(a) == 100
    assert list(a["id"]) == list(b["id"])  # same dataset+seed → same rows
    c = sample.reservoir_sample(rd.range(5000), 100, seed=7)
    assert list(a["id"]) != list(c["id"])  # seed changes the sample
    # Rough uniformity: mean of sampled ids near population mean.
    assert abs(a["id"].mean() - 2500) < 450


def test_curriculum_deciles_oracle(ray_session):
    """Exact distributed ntile(10) vs DuckDB, including the uneven-tile
    arithmetic (n % 10 != 0 via a 43-doc subset)."""
    import duckdb

    import pandas as pd
    from ferenda_ray.ops.sample import (CURRICULUM_DECILES_SQL,
                                        curriculum_deciles)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    mine = (curriculum_deciles(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = (con.sql(CURRICULUM_DECILES_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert (mine.decile.values == want.decile.values).all()
    # exact balance at n % 10 == 0
    assert sorted(mine.decile.value_counts().tolist()) == [50] * 10


def test_curriculum_deciles_uneven(ray_session, tmp_path):
    """n=23: ntile gives 3 tiles of 3 and 7 of 2 — exact match."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.sample import (CURRICULUM_DECILES_SQL,
                                        curriculum_deciles)

    texts = [f"the data for it is in file number{i} " * (i + 1)
             for i in range(23)]
    tab = pa.table({"doc_id": pa.array(range(23), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    mine = (curriculum_deciles(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = (con.sql(CURRICULUM_DECILES_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert (mine.decile.values == want.decile.values).all()
    sizes = sorted(mine.decile.value_counts().tolist())
    assert sizes == [2] * 7 + [3] * 3
