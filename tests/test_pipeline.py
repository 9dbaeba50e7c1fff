"""End-to-end KG pipeline tests on the synthetic corpus: correctness of
the triple stream, latest-per-url semantics, dedup/materialize
determinism, manifest + checkpoint-resume."""

import os

import pandas as pd
import pytest

from ferenda_ray import schemas as S
from ferenda_ray.pipelines import kg
from ferenda_ray.sources import pages as pgen
from ferenda_ray.stages import materialize as mat


@pytest.fixture(scope="module")
def triples_df(ray_session, pages_parquet):
    ds = kg.build_triples_ds(pages_parquet, link_concurrency=2, batch_size=16)
    return ds.to_pandas()


def test_latest_per_url_only(triples_df, pages_parquet):
    """Snapshot urls contribute one document version: no '(draft)' titles
    (those exist only in older snapshots)."""
    titles = triples_df[triples_df.pred == S.DCT_TITLE]
    assert not titles.obj.str.contains(r"\(draft\)").any()
    # every generated doc url appears as a subject
    urls = {pgen.page_url(i) for i in range(60)}
    assert urls <= set(triples_df[triples_df.pred == S.RDF_TYPE].subj)


def test_expected_citations_present(triples_df):
    """Recall check: every citation the generator inserted is in the
    output with the right subject fragment and target URI."""
    refs = triples_df[triples_df.pred == S.DCT_REFERENCES]
    got = set(zip(refs.subj, refs.obj))
    from ferenda_ray.stages.link import format_rfc_uri

    from ferenda_ray.stages.link import format_eulaw_uri

    n_eu = 0
    for i in range(60):
        spec = pgen.gen_spec(i)
        for c in spec["citations"]:
            subj = f"{spec['url']}#{c['frag']}"
            if c["kind"] == "rfc":
                obj = format_rfc_uri(str(c["rfc"]), c["section"])
            elif c["kind"] == "eu":
                obj = format_eulaw_uri(
                    c["act"], str(c["year"]), str(c["num"]),
                    str(c["article"]) if c["article"] else None,
                    str(c["sub"]) if c["sub"] else None)
                n_eu += 1
            else:
                obj = c["target"]
            assert (subj, obj) in got, (subj, obj)
    assert n_eu > 5  # the eulaw grammar pack actually fires


def test_expected_mentions_linked_canonical(triples_df):
    """Every inserted entity mention links to the entity's CANONICAL
    (minted, sameAs-collapsed) URI."""
    from ferenda_ray.sources import entities as ent
    from ferenda_ray.stages.canon import build_canonical_map

    etab = ent.entities_table()
    rows = [
        {"entity_uri": u, "label": l}
        for u, l in zip(etab.column("entity_uri").to_pylist(),
                        etab.column("label").to_pylist())
    ]
    cmap = build_canonical_map(rows, ent.sameas_map())
    subj_trips = triples_df[triples_df.pred == S.DCT_SUBJECT]
    got = set(zip(subj_trips.subj, subj_trips.obj))
    n_checked = 0
    for i in range(60):
        spec = pgen.gen_spec(i)
        for m in spec["mentions"]:
            subj = f"{spec['url']}#{m['frag']}"
            expected_obj = cmap[ent.entity_uri(m["entity"])]
            assert (subj, expected_obj) in got, (subj, expected_obj, m)
            n_checked += 1
    assert n_checked > 10
    # no raw entity URIs survive canonicalization
    assert not subj_trips.obj.str.startswith(ent.RAW_ENTITY_NS).any()


def test_materialize_dedup_manifest_resume(ray_session, pages_parquet, tmp_path):
    out1 = str(tmp_path / "run1")
    m1 = kg.run_kg_pipeline(pages_parquet, out1, num_buckets=8,
                            link_concurrency=2, batch_size=16)
    assert set(m1.bucket) == set(range(8))
    df1 = mat.read_triples(out1).to_pandas()
    # set semantics: no duplicate (s,p,o,lang,datatype)
    assert not df1.duplicated(subset=mat.KEY_COLS).any()
    assert m1.n_triples.sum() == len(df1)
    assert len(mat.read_manifest(out1)) == 8

    # determinism: a second full run produces identical partition files
    out2 = str(tmp_path / "run2")
    kg.run_kg_pipeline(pages_parquet, out2, num_buckets=8,
                       link_concurrency=2, batch_size=16)
    df2 = mat.read_triples(out2).to_pandas()
    key = mat.KEY_COLS + ["obj_is_uri", "url"]
    pd.testing.assert_frame_equal(
        df1.sort_values(key).reset_index(drop=True)[sorted(df1.columns)],
        df2.sort_values(key).reset_index(drop=True)[sorted(df2.columns)],
    )

    # resume: delete 3 partitions + their manifest rows → rerun only
    # rewrites those, leaves the rest untouched (checkpoint semantics)
    import glob

    mtimes_before = {}
    for b in (1, 4, 6):
        os.remove(os.path.join(out1, f"bucket={b:05d}", "part-0.parquet"))
        os.remove(os.path.join(out1, "_manifest", f"bucket-{b:05d}.json"))
    for f in glob.glob(os.path.join(out1, "bucket=*", "part-0.parquet")):
        mtimes_before[f] = os.path.getmtime(f)
    m3 = kg.run_kg_pipeline(pages_parquet, out1, num_buckets=8,
                            link_concurrency=2, batch_size=16)
    assert set(m3.bucket) == {1, 4, 6}
    for f, t in mtimes_before.items():
        assert os.path.getmtime(f) == t, f"untouched partition rewritten: {f}"
    df3 = mat.read_triples(out1).to_pandas()
    pd.testing.assert_frame_equal(
        df1.sort_values(key).reset_index(drop=True)[sorted(df1.columns)],
        df3.sort_values(key).reset_index(drop=True)[sorted(df3.columns)],
    )


def test_actor_pool_variant_matches_fused(ray_session, pages_parquet):
    """build_triples_ds(link_concurrency=N) — the staged docs-ds + actor
    pool path — must produce exactly the fused single-pass stream."""
    fused = kg.build_triples_ds(pages_parquet, batch_size=16).to_pandas()
    actor = kg.build_triples_ds(pages_parquet, batch_size=16,
                                link_concurrency=2).to_pandas()
    key = ["subj", "pred", "obj", "lang", "datatype", "url"]
    pd.testing.assert_frame_equal(
        fused.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(fused.columns)],
        actor.sort_values(key, kind="mergesort").reset_index(drop=True)[sorted(actor.columns)],
    )


def test_latest_join_path_bit_equal(ray_session, pages_parquet):
    """The hash-bucket latest-per-url semi-join (scale path) must be
    bit-identical to the broadcast path."""
    a = (kg.build_triples_ds(pages_parquet, batch_size=16,
                             dedupe_snapshots=True).to_pandas()
         .sort_values(["subj", "pred", "obj", "lang", "datatype", "url"])
         .reset_index(drop=True))
    b = (kg.build_triples_ds(pages_parquet, batch_size=16,
                             dedupe_snapshots="join").to_pandas()
         .sort_values(["subj", "pred", "obj", "lang", "datatype", "url"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_latest_tie_break_deterministic(ray_session, tmp_path):
    """Two snapshots of one url with the SAME max warc_ts must collapse
    to exactly one deterministic winner (min sha1(html)) in both the
    broadcast and join paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    html_a = b"<html><head><title>A</title></head><body><p>pa pb pc</p></body></html>"
    html_b = b"<html><head><title>B</title></head><body><p>pd pe pf</p></body></html>"
    ts = pd.Timestamp("2024-01-01T00:00:00")
    tab = pa.table({
        "url": pa.array(["https://example.org/d1"] * 2, pa.string()),
        "warc_ts": pa.array([ts, ts], pa.timestamp("us")),
        "html": pa.array([html_a, html_b], pa.binary()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    p = str(tmp_path / "tie.parquet")
    pq.write_table(tab, p)

    import hashlib

    want = min([html_a, html_b], key=lambda h: hashlib.sha1(h).hexdigest())

    import functools

    max_ref = ray.put(kg.latest_per_url_map(p))
    kept_bcast = (rd.read_parquet(p)
                  .map_batches(functools.partial(kg.latest_filter,
                                                 max_ref=max_ref),
                               batch_format="pyarrow")
                  .to_pandas())
    kept_join = kg.latest_filter_join(rd.read_parquet(p)).to_pandas()
    for kept in (kept_bcast, kept_join):
        assert len(kept) == 1
        assert bytes(kept.html.iloc[0]) == want
