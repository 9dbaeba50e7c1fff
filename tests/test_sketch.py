"""Sketch-aggregate tests: HLL accuracy + mergeability, Misra-Gries
exactness vs DuckDB, top-terms vs DuckDB (sf0.001 driver tables)."""

import duckdb
import numpy as np
import pytest

from ferenda_ray.ops import sketch

SF = "/root/testdata/sf0.001"


def test_hll_registers_merge_associative():
    rng = np.random.default_rng(7)
    h = sketch._splitmix64(rng.integers(0, 2**63, 5000, dtype=np.uint64))
    whole = sketch.hll_registers(h)
    merged = np.maximum(sketch.hll_registers(h[:2000]),
                        sketch.hll_registers(h[2000:]))
    assert np.array_equal(whole, merged)


@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_hll_estimate_accuracy(n):
    ids = np.arange(n, dtype=np.uint64)
    est = sketch.hll_estimate(sketch.hll_registers(sketch._splitmix64(ids)))
    assert abs(est - n) / n < 0.03  # p=14 → σ ≈ 0.8%


def test_hll_distinct_users_vs_exact(ray_session):
    out = sketch.hll_distinct_users(SF)
    est = int(out["n_users_est"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    # Small cardinality → linear-counting regime, near-exact.
    assert abs(est - exact) / exact < 0.02


def test_top_terms_matches_duckdb(ray_session):
    got = sketch.top_terms(SF).to_pandas()
    want = duckdb.sql(
        sketch.TOP_TERMS_SQL.replace(
            "FROM documents", f"FROM '{SF}/documents.parquet'")
    ).df()
    assert list(got["term"]) == list(want["term"])
    assert list(got["cnt"]) == list(want["cnt"])


def test_value_quantiles_exact_vs_duckdb(ray_session):
    got = sketch.value_quantiles(SF)
    want = duckdb.sql(
        sketch.VALUE_QUANTILES_SQL.replace(
            "FROM events", f"FROM '{SF}/events.parquet'")
    ).df()
    for c in ("p50", "p90", "p95", "p99"):
        assert got[c].iloc[0] == want[c].iloc[0]  # exact element, bit-equal


def test_exact_quantiles_constant_and_empty(ray_session):
    import ray.data as rd

    const = sketch.exact_quantiles(
        lambda: rd.from_items([{"v": 3.5}] * 10), "v", [0.5, 0.99])
    assert const == {0.5: 3.5, 0.99: 3.5}


def test_frequent_terms_exact_vs_duckdb(ray_session):
    got = sketch.frequent_terms(SF).to_pandas().reset_index(drop=True)
    want = duckdb.sql(
        sketch.FREQUENT_TERMS_SQL.replace(
            "FROM documents", f"FROM '{SF}/documents.parquet'")
    ).df()
    assert list(got["term"]) == list(want["term"])
    assert list(got["cnt"]) == list(want["cnt"])
    assert len(got) > 0  # threshold actually selects something at sf0.001


def test_grouped_quantiles_exact_vs_duckdb(ray_session):
    got = sketch.grouped_value_quantiles(SF)
    want = duckdb.sql(
        sketch.GROUPED_QUANTILES_SQL.replace(
            "FROM events", f"FROM '{SF}/events.parquet'")
    ).df()
    assert list(got["event_type"]) == list(want["event_type"])
    for c in ("p50", "p95"):
        assert list(got[c]) == list(want[c])


def test_tfidf_top_terms_vs_duckdb(ray_session):
    from ferenda_ray.ops import text

    got = text.tfidf_top_terms(SF).to_pandas()
    want = duckdb.sql(
        text.TFIDF_SQL.replace(
            "FROM documents", f"FROM '{SF}/documents.parquet'")
    ).df()
    assert len(got) == len(want) > 0
    assert list(got["term"]) == list(want["term"])
    assert list(got["tf"]) == list(want["tf"])
    assert list(got["score"]) == list(want["score"])  # bit-equal doubles


def test_profile_events_vs_duckdb(ray_session):
    from ferenda_ray.ops import profile

    got = profile.profile_events(SF).to_pandas()
    want = duckdb.sql(
        profile.PROFILE_EVENTS_SQL.replace(
            "FROM events", f"FROM '{SF}/events.parquet'")
    ).df()
    assert got.reset_index(drop=True).equals(want)


def test_curate_documents_vs_duckdb(ray_session):
    from ferenda_ray.ops import text

    got = text.curate_documents(SF).to_pandas()
    want = duckdb.sql(
        text.CURATE_DOCUMENTS_SQL.replace(
            "FROM documents", f"FROM '{SF}/documents.parquet'")
    ).df()
    assert len(got) == len(want) > 0
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["mean_token_len"]) == list(want["mean_token_len"])
