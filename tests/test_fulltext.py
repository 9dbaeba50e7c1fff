"""Distributed inverted index + BM25 query (ops/fulltext.py, S12)."""

import math

import pyarrow as pa
import pytest

from ferenda_ray.ops import fulltext as ft


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana cherry date"),
        (2, "apple apple apple apple"),
        (3, "unrelated words entirely different"),
        (4, "apple banana"),
    ]
    tab = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    out = str(tmp_path_factory.mktemp("ftidx"))
    ds = rd.from_arrow(tab)
    stats = ft.build_index(ds, "doc_id", "text", out, num_buckets=4)
    assert stats["n_docs"] == 5
    assert stats["avgdl"] == pytest.approx(17 / 5)
    return out


def test_query_ranking_and_scores(index_dir):
    got = ft.query_index(index_dir, "apple", k=10)
    uris = got.column("uri").to_pylist()
    # doc 2 has the most apples but is all-apple (higher tf saturates);
    # verify against a hand BM25 computation instead of intuition
    n, avgdl = 5, 17 / 5
    df = 3  # apple occurs in docs 0, 2, 4
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)

    def bm25(tf, dl):
        return round(idf * tf * (ft.K1 + 1)
                     / (tf + ft.K1 * (1 - ft.B + ft.B * dl / avgdl)), 4)

    want = sorted([("0", bm25(2, 4)), ("2", bm25(4, 4)),
                   ("4", bm25(1, 2))], key=lambda x: (-x[1], x[0]))
    assert list(zip(uris, got.column("score").to_pylist())) == want
    assert "3" not in uris and "1" not in uris


def test_multi_term_query_sums(index_dir):
    one = {u: s for u, s in zip(
        *[ft.query_index(index_dir, "apple").column(c).to_pylist()
          for c in ("uri", "score")])}
    two = {u: s for u, s in zip(
        *[ft.query_index(index_dir, "apple date").column(c).to_pylist()
          for c in ("uri", "score")])}
    assert two["1"] > 0  # date-only doc now matches
    for u in one:
        assert two[u] == pytest.approx(one[u], abs=2e-4)  # apple part kept


def test_absent_term_empty(index_dir):
    assert ft.query_index(index_dir, "zzzmissing").num_rows == 0


def test_query_reads_only_term_buckets(index_dir, monkeypatch):
    """Partition pruning: only hash(term) buckets are opened."""
    import pyarrow.parquet as pq_mod

    opened = []
    real = pq_mod.read_table

    def spy(path, *a, **k):
        opened.append(str(path))
        return real(path, *a, **k)

    monkeypatch.setattr("pyarrow.parquet.read_table", spy)
    monkeypatch.setattr(ft.pq, "read_table", spy)
    ft.query_index(index_dir, "apple")
    from ferenda_ray.util import stable_uint

    b = stable_uint("apple", 4)
    assert opened and all(f"b={b}" in p for p in opened)
