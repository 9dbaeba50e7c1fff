"""Derived KG products: sections table, entries stats, skeleton
anti-join, N-Triples sink, and the P/R harness oracle agreement."""

import pandas as pd
import pytest

from ferenda_ray.pipelines import kg
from ferenda_ray.sources import pages as pgen


@pytest.fixture(scope="module")
def small_pages(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("kgp") / "pages.parquet")
    pq.write_table(pgen.corpus_table(40), p)
    return p


def test_sections_table(small_pages):
    df = kg.build_sections_ds(small_pages).to_pandas()
    assert set(df.columns) == {"url", "fragment", "about", "title",
                               "ordinal", "text"}
    # every doc contributes its root resource plus one row per section
    assert df.fragment.str.startswith("S").sum() > 0
    assert not df.duplicated(subset=["about"]).any()


def test_entries_stats(small_pages):
    df = kg.build_entries_ds(small_pages).to_pandas()
    assert (df.stage == "parse").all()
    assert df.ok.all()
    assert len(df) == 40


def test_skeleton_antijoin(small_pages):
    from ferenda_ray.ops.graph import skeleton

    triples = kg.build_triples_ds(small_pages, batch_size=16)
    tdf = triples.to_pandas()
    out = skeleton(kg.build_triples_ds(small_pages, batch_size=16)).to_pandas()
    subjects = {s.split("#", 1)[0] for s in tdf.subj}
    # no defined subject may appear; every row really is referenced
    assert not (set(out.uri) & subjects)
    ref_objs = {o.split("#", 1)[0]
                for o in tdf[tdf.pred.str.endswith("references")].obj}
    assert set(out.uri) <= ref_objs
    assert (out.n_refs > 0).all()


def test_nt_roundtrip(small_pages, tmp_path):
    from ferenda_ray.stages.materialize import nt_lines, write_nt

    ds = kg.build_triples_ds(small_pages, batch_size=16)
    n = ds.count()
    man = write_nt(kg.build_triples_ds(small_pages, batch_size=16),
                   str(tmp_path / "nt"))
    assert man.n_lines.sum() == n
    text = []
    for f in (tmp_path / "nt").glob("*.nt"):
        text.extend(f.read_text().splitlines())
    assert len(text) == n
    assert all(line.endswith(" .") and line.startswith("<") for line in text)


def test_pr_harness_perfect_on_small():
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import pr_check

    res = pr_check.main(40)
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


def test_materialize_table_generic_resume(small_pages, tmp_path):
    from ferenda_ray.stages.materialize import materialize_table

    out = str(tmp_path / "sections")
    ds = kg.build_sections_ds(small_pages)
    m = materialize_table(ds, out, key_cols=["about"], num_buckets=4)
    assert sorted(m.bucket) == [0, 1, 2, 3]
    import ray.data as rd

    total = m.n_rows.sum()
    df = rd.read_parquet(out).to_pandas()
    assert len(df) == total and "about" in df.columns and "_kh" not in df.columns
    # resume: nothing rewritten
    m2 = materialize_table(kg.build_sections_ds(small_pages), out,
                           key_cols=["about"], num_buckets=4)
    assert len(m2) == 0


def test_eulaw_refs_sql_oracle(small_pages):
    """EU-citation per-target counts: Ray triples filter+groupby equals
    a DuckDB regex recompute DIRECTLY from the raw pages parquet
    (grammar-priority emulated by span deletion)."""
    import duckdb
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ferenda_ray.pipelines.kg import build_triples_ds
    from ferenda_ray.pipelines.kg_oracles import _eulaw_refs_sql
    from ferenda_ray.stages.link import EULAW_NS

    def eu_only(b):
        return b.filter(pc.starts_with(b.column("obj"), EULAW_NS))

    mine = (build_triples_ds(small_pages)
            .map_batches(eu_only, batch_format="pyarrow")
            .groupby("obj").aggregate(Count(alias_name="n_refs"))
            .to_pandas().sort_values("obj").reset_index(drop=True))
    want = (duckdb.sql(_eulaw_refs_sql(small_pages)).df()
            .sort_values("obj").reset_index(drop=True))
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine.astype({"n_refs": "int64"}),
                                  want.astype({"n_refs": "int64"}))


def test_eulaw_refs_sql_differential_fuzz(ray_session, tmp_path):
    """Random pages stuffed with adversarial EU-citation shapes
    (abutting word chars, article-of-regulation, 2-digit years, bare
    acts inside article phrases): the SQL oracle's per-target counts
    equal an aggregation of the Python grammar over the same latest
    snapshots."""
    import collections
    import datetime
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.kg_oracles import _eulaw_refs_sql
    from ferenda_ray.stages.link import EULAW_NS, scan_citations

    rng = random.Random(17)
    pieces = [
        "Directive 2000/31/EC", "Directive 2007/42/EU",
        "Regulation (EC) No 1049/2001", "Regulation (EU) No 45/01",
        "Article 6(1) of Directive 2000/31/EC",
        "Article 9 of Regulation (EC) No 1049/2001",
        "Directive 2000/31/ECx", "subDirective 2000/31/EC",
        "Article 7 of", "Directive 31/EC", "plain words here",
        "Regulation (EC) No 1049", "xArticle 6(1) of Directive "
        "2007/42/EU",
    ]
    texts = [" ".join(rng.choice(pieces)
                      for _ in range(rng.randint(1, 8)))
             for _ in range(50)]
    html = [f"<html><body><p>{t}</p></body></html>".encode()
            for t in texts]
    ts = datetime.datetime(2024, 1, 1)
    tab = pa.table({
        "url": pa.array([f"https://e.org/p{i}" for i in range(50)]),
        "warc_ts": pa.array([ts] * 50, pa.timestamp("us")),
        "html": pa.array(html, pa.binary()),
    })
    pq.write_table(tab, str(tmp_path / "pages.parquet"))
    want = (duckdb.sql(_eulaw_refs_sql(str(tmp_path / "pages.parquet")))
            .df().set_index("obj").n_refs.to_dict())
    got: collections.Counter = collections.Counter()
    for t in texts:
        for u in scan_citations(t):
            if u.startswith(EULAW_NS):
                got[u] += 1
    assert dict(got) == {k: int(v) for k, v in want.items()}
    assert len(got) > 3  # the fuzz actually generated citations
