"""Bloom semi-join tests: no false negatives, bounded FPR, exact
end-result vs DuckDB."""

import duckdb
import numpy as np

import ray.data as rd

from ferenda_ray.ops import bloom

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    keys = np.arange(10_000, dtype=np.int64)
    packed = bloom.bloom_build(rd.from_arrow(
        __import__("pyarrow").table({"k": keys})), "k")
    assert bloom.bloom_contains(packed, keys).all()  # no false negatives
    probe = np.arange(1_000_000, 1_050_000, dtype=np.int64)  # disjoint
    fpr = bloom.bloom_contains(packed, probe).mean()
    assert fpr < 0.01


def test_customers_with_events_vs_duckdb(ray_session):
    got = bloom.customers_with_events(SF).to_pandas()
    want = duckdb.sql(
        bloom.CUSTOMERS_WITH_EVENTS_SQL
        .replace("FROM customer c", f"FROM '{SF}/customer.parquet' c")
        .replace("FROM events e", f"FROM '{SF}/events.parquet' e")
    ).df()
    assert list(got["c_custkey"]) == list(want["c_custkey"])
    assert list(got["c_name"]) == list(want["c_name"])
    assert len(got) > 0
