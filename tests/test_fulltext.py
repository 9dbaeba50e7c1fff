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


@pytest.fixture(scope="module")
def typed_index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = [
        (0, "protocol basics", "some body text about headers"),
        (1, "unrelated title", "protocol protocol protocol body"),
        (2, "other things", "words entirely different"),
        (3, "protocol", "short"),
    ]
    tab = pa.table({
        "uri": pa.array([str(d) for d, _, _ in docs], pa.string()),
        "title": pa.array([t for _, t, _ in docs], pa.string()),
        "text": pa.array([b for _, _, b in docs], pa.string()),
    })
    out = str(tmp_path_factory.mktemp("ftidxb"))
    stats = ft.build_typed_index(rd.from_arrow(tab), "uri",
                                 {"title": 4.0, "text": 1.0}, out,
                                 num_buckets=4)
    assert set(stats["fields"]) == {"title", "text"}
    assert stats["fields"]["title"]["n_docs"] == 4
    return out


def test_boosted_title_outranks_body(typed_index_dir):
    got = ft.query_typed_index(typed_index_dir, "protocol", k=10)
    uris = got.column("uri").to_pylist()
    # docs 0 and 3 match in the boosted title field; doc 1 only in body
    # (even with tf=3) — boost 4 must rank title hits first
    assert set(uris[:2]) == {"0", "3"}
    assert uris[2] == "1"
    assert "2" not in uris


def test_boosted_matches_duckdb_oracle(typed_index_dir, tmp_path):
    """query_typed_index == boosted_bm25_sql over the same table."""
    import duckdb
    import pyarrow.parquet as pq_mod

    tab = pa.table({
        "uri": pa.array(["0", "1", "2", "3"], pa.string()),
        "title": pa.array(["protocol basics", "unrelated title",
                           "other things", "protocol"], pa.string()),
        "text": pa.array(["some body text about headers",
                          "protocol protocol protocol body",
                          "words entirely different", "short"],
                         pa.string()),
    })
    p = str(tmp_path / "docs.parquet")
    pq_mod.write_table(tab, p)
    sql = ft.boosted_bm25_sql(f"read_parquet('{p}')", "protocol header",
                              "uri", {"title": 4.0, "text": 1.0})
    want = duckdb.sql(sql).df()
    got = ft.query_typed_index(typed_index_dir, "protocol header",
                               k=10).to_pandas()
    assert got.uri.tolist() == want.uri.tolist()
    assert got.score.tolist() == pytest.approx(want.score.tolist(),
                                               abs=1e-9)
