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
