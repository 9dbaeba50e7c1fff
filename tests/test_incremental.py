"""Incremental delta merge (materialize_incremental): merging a crawl
delta into an existing table must equal a from-scratch rebuild on the
combined input (new pages added, re-crawled urls superseded)."""

import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ferenda_ray.sources.pages import corpus_table
from ferenda_ray.stages import materialize as mat


def _single_snapshot_urls(tab: pa.Table) -> list[str]:
    """The corpus contains multi-snapshot urls (crawl dups); re-crawl
    simulation picks urls with exactly one snapshot so set algebra on
    rows equals set algebra on urls."""
    import collections

    c = collections.Counter(tab.column("url").to_pylist())
    return sorted(u for u, n in c.items() if n == 1)


def _modified_rows(tab: pa.Table, urls: list[str]) -> pa.Table:
    """Re-crawl simulation: the given urls with changed html + newer ts
    (title word altered so the emitted triples actually differ)."""
    import pyarrow.compute as pc

    sl = tab.filter(pc.is_in(tab.column("url"),
                             value_set=pa.array(urls, pa.string())))
    htmls = [h.replace(b"overview", b"overhaul") for h in
             sl.column("html").to_pylist()]
    ts = [t + datetime.timedelta(hours=1)
          for t in sl.column("warc_ts").to_pylist()]
    return pa.table({
        "url": sl.column("url"),
        "warc_ts": pa.array(ts, sl.schema.field("warc_ts").type),
        "html": pa.array(htmls, pa.binary()),
        "text": sl.column("text"),  # stale golden text is unused here
        "lang": sl.column("lang"),
    })


def _new_pages(k: int) -> pa.Table:
    rows = []
    for i in range(k):
        url = f"https://www.newsite.example.org/doc/{i}.html"
        html = (f"<!DOCTYPE html><html><head><title>New doc {i}</title>"
                f"</head><body><h1>New doc {i}</h1>"
                f"<h2>1. Intro</h2><p>See RFC {100 + i} for details.</p>"
                f"</body></html>").encode()
        rows.append((url, datetime.datetime(2024, 2, 1, i), html, "", "en"))
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array([r[3] for r in rows], pa.large_string()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    })


def _read_sorted(out_dir: str) -> pd.DataFrame:
    df = mat.read_triples(out_dir).to_pandas()
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def test_incremental_equals_rebuild(ray_session, tmp_path):
    from ferenda_ray.pipelines.kg import build_triples_ds

    import pyarrow.compute as pc

    base = corpus_table(60)
    recrawl_urls = _single_snapshot_urls(base)[:8]
    recrawled = _modified_rows(base, recrawl_urls)
    fresh = _new_pages(5)
    delta = pa.concat_tables([recrawled.cast(base.schema),
                              fresh.cast(base.schema)])
    rest = base.filter(pc.invert(pc.is_in(
        base.column("url"), value_set=pa.array(recrawl_urls, pa.string()))))
    combined = pa.concat_tables([delta.cast(base.schema), rest])

    p_base = str(tmp_path / "base.parquet")
    p_delta = str(tmp_path / "delta.parquet")
    p_comb = str(tmp_path / "combined.parquet")
    pq.write_table(base, p_base)
    pq.write_table(delta, p_delta)
    pq.write_table(combined, p_comb)

    # expected: from-scratch on the combined input
    exp_dir = str(tmp_path / "expected")
    mat.materialize(build_triples_ds(p_comb), exp_dir, num_buckets=8)

    # got: base build, then the delta merged incrementally
    got_dir = str(tmp_path / "incr")
    mat.materialize(build_triples_ds(p_base), got_dir, num_buckets=8)
    before = _read_sorted(got_dir)
    man = mat.materialize_incremental(build_triples_ds(p_delta), got_dir,
                                      num_buckets=8)
    assert len(man) > 0

    got = _read_sorted(got_dir)
    exp = _read_sorted(exp_dir)
    pd.testing.assert_frame_equal(got, exp)
    # superseded triples really gone: the re-crawl changed content
    assert not got.equals(before)
    # manifest counts reflect the merged partitions
    rows = {r["bucket"]: r["n_triples"] for r in mat.read_manifest(got_dir)}
    by_bucket = (mat.read_triples(got_dir).to_pandas()
                 .groupby(lambda _: 0).size())
    assert sum(rows.values()) == len(got)


def test_incremental_untouched_buckets_not_rewritten(ray_session, tmp_path):
    """A delta that misses a bucket leaves that partition file alone."""
    import os

    from ferenda_ray.pipelines.kg import build_triples_ds

    base = corpus_table(40)
    p_base = str(tmp_path / "base.parquet")
    pq.write_table(base, p_base)
    out = str(tmp_path / "kg")
    mat.materialize(build_triples_ds(p_base), out, num_buckets=16)

    delta = _new_pages(1)
    p_delta = str(tmp_path / "delta.parquet")
    pq.write_table(delta, p_delta)

    mtimes = {p: os.path.getmtime(os.path.join(out, p, "part-0.parquet"))
              for p in os.listdir(out) if p.startswith("bucket=")}
    man = mat.materialize_incremental(build_triples_ds(p_delta), out,
                                      num_buckets=16)
    touched = {f"bucket={b:05d}" for b in man.bucket}
    assert 0 < len(touched) < len(mtimes)  # one tiny page ≠ all buckets
    for p, t in mtimes.items():
        now = os.path.getmtime(os.path.join(out, p, "part-0.parquet"))
        if p in touched:
            assert now >= t
        else:
            assert now == t  # untouched partitions: zero IO


def test_url_layout_incremental_equals_rebuild(ray_session, tmp_path):
    """layout='url': incremental merge == from-scratch rebuild on the
    combined input (same bit-equality gate as the key layout), the
    DISTINCT key set matches the key layout's, and the sweep touches
    ONLY the delta urls' buckets."""
    import os

    import polars as pl
    import pyarrow.compute as pc

    from ferenda_ray.pipelines.kg import build_triples_ds

    base = corpus_table(60)
    recrawl_urls = _single_snapshot_urls(base)[:8]
    recrawled = _modified_rows(base, recrawl_urls)
    fresh = _new_pages(5)
    delta = pa.concat_tables([recrawled.cast(base.schema),
                              fresh.cast(base.schema)])
    rest = base.filter(pc.invert(pc.is_in(
        base.column("url"), value_set=pa.array(recrawl_urls, pa.string()))))
    combined = pa.concat_tables([delta.cast(base.schema), rest])

    p_base = str(tmp_path / "base.parquet")
    p_delta = str(tmp_path / "delta.parquet")
    p_comb = str(tmp_path / "combined.parquet")
    pq.write_table(base, p_base)
    pq.write_table(delta, p_delta)
    pq.write_table(combined, p_comb)

    exp_dir = str(tmp_path / "expected_url")
    mat.materialize(build_triples_ds(p_comb), exp_dir, num_buckets=8,
                    layout="url")

    got_dir = str(tmp_path / "incr_url")
    mat.materialize(build_triples_ds(p_base), got_dir, num_buckets=8,
                    layout="url")
    assert mat.table_meta(got_dir)["layout"] == "url"

    mtimes = {p: os.path.getmtime(os.path.join(got_dir, p,
                                               "part-0.parquet"))
              for p in os.listdir(got_dir) if p.startswith("bucket=")}
    man = mat.materialize_incremental(build_triples_ds(p_delta), got_dir,
                                      num_buckets=8)
    pd.testing.assert_frame_equal(_read_sorted(got_dir),
                                  _read_sorted(exp_dir))

    # sweep IO ∝ delta: phase 2 enumerated exactly the delta urls'
    # hash buckets; every other partition file untouched on disk
    delta_urls = pa.parquet.read_table(
        p_delta, columns=["url"]).column("url").to_pylist()
    want_buckets = {int(h % 8) for h in
                    pl.Series(delta_urls).hash(seed=42)}
    assert set(man.bucket) <= want_buckets
    for p, t in mtimes.items():
        b = int(p.split("=", 1)[1])
        if b not in want_buckets:
            now = os.path.getmtime(
                os.path.join(got_dir, p, "part-0.parquet"))
            assert now == t, f"non-delta bucket {b} was rewritten"

    # distinct key set identical across layouts
    key_dir = str(tmp_path / "expected_key")
    mat.materialize(build_triples_ds(p_comb), key_dir, num_buckets=8)
    kcols = ["subj", "pred", "obj", "lang", "datatype"]
    url_keys = _read_sorted(exp_dir)[kcols].drop_duplicates()
    key_keys = _read_sorted(key_dir)[kcols].drop_duplicates()
    pd.testing.assert_frame_equal(
        url_keys.sort_values(kcols).reset_index(drop=True),
        key_keys.sort_values(kcols).reset_index(drop=True))


def test_layout_mismatch_raises(tmp_path, ray_session):
    import pytest
    import ray.data as rd

    rows = [{"url": f"u{i}", "subj": f"s{i}", "pred": "p", "obj": f"o{i}",
             "lang": "", "datatype": ""} for i in range(20)]
    out = str(tmp_path / "tbl")
    mat.materialize(rd.from_items(rows), out, num_buckets=4, layout="url")
    with pytest.raises(ValueError, match="layout='url'"):
        mat.materialize(rd.from_items(rows), out, num_buckets=4,
                        layout="key")


def test_incremental_num_buckets_mismatch_raises(tmp_path, ray_session):
    # ADVICE r2: a mismatched num_buckets must raise, not silently split
    # the keyspace
    import pytest
    import ray.data as rd

    from ferenda_ray.stages.materialize import (
        materialize, materialize_incremental, table_num_buckets)

    rows = [{"url": f"u{i}", "subj": f"s{i}", "pred": "p", "obj": f"o{i}",
             "lang": "", "datatype": ""} for i in range(20)]
    out = str(tmp_path / "tbl")
    materialize(rd.from_items(rows), out, num_buckets=4)
    assert table_num_buckets(out) == 4
    delta = rd.from_items(rows[:2])
    with pytest.raises(ValueError, match="num_buckets=4"):
        materialize_incremental(delta, out, num_buckets=8)
    with pytest.raises(ValueError, match="num_buckets=4"):
        materialize(rd.from_items(rows), out, num_buckets=8)
