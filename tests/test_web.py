"""Host-level web-corpus analytics (ops/web.py)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ferenda_ray.ops.web import host_of, host_stats, host_stats_sql


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].sort_values("host")
            .reset_index(drop=True))


def test_host_of_matches_split_part():
    urls = ["https://www.a.org/doc/1.html",
            "https://www.a.org/doc/1.html#frag",
            "http://b.example/x",
            "nohost", "", "https://", "a/b/c/d"]
    got = host_of(pa.array(urls, pa.string())).to_pylist()
    want = [duckdb.sql(
        "SELECT split_part(?, '/', 3)", params=[u]).fetchone()[0]
        for u in urls]
    assert got == want


def test_host_stats_vs_duckdb(ray_session, tmp_path):
    rows = []
    for h in range(7):
        for i in range(h + 2):
            url = f"https://site{h}.example.org/doc/{i}.html"
            for snap in range((i % 3) + 1):  # multi-snapshot urls
                rows.append({"url": url,
                             "text": f"pägé {h}/{i} snap {snap}" * (i + 1)})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path)

    got = _canon(host_stats(path, num_buckets=4).to_pandas())
    want = _canon(duckdb.sql(host_stats_sql(path)).df())
    want = want.astype({c: "int64" for c in
                        ("n_snapshots", "n_urls", "sum_text_chars")})
    pd.testing.assert_frame_equal(got, want)


def test_host_graph_vs_bruteforce(ray_session):
    """Host-level graph coarsening equals a brute-force pair count,
    including multi-batch partial merging."""
    import numpy as np
    import ray.data as rd

    from ferenda_ray.ops.graph import host_graph

    rng = np.random.default_rng(7)
    edges = [(f"https://h{int(a)}.org/p/{int(i)}",
              f"https://h{int(b)}.org/p/{int(j)}")
             for a, b, i, j in zip(rng.integers(0, 5, 300),
                                   rng.integers(0, 5, 300),
                                   rng.integers(0, 40, 300),
                                   rng.integers(0, 40, 300))]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])).repartition(7)

    brute = {}
    for s, d in edges:
        k = (s.split("/")[2], d.split("/")[2])
        brute[k] = brute.get(k, 0) + 1
    got = host_graph(ds, num_buckets=4).to_pandas()
    got_map = dict(zip(zip(got.src_host, got.dst_host), got.n_links))
    assert got_map == brute
