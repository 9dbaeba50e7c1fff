"""Head-entity / hot-key skew handling (north_rule: salted entity-hash
shuffles must defuse head-entity skew).

Design under test (materialize.py): the dedup exchange is keyed by the
hash of the FULL (subj, pred, obj, lang, datatype) tuple, so a head
SUBJECT with millions of distinct triples spreads uniformly over all
buckets, and floods of IDENTICAL triples are collapsed by the
batch-local combiner in ``add_keys`` BEFORE anything crosses the
exchange — the two-phase (partial → final) pattern."""

import json

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.stages import materialize as mat


def _triples_table(subjs, objs):
    n = len(subjs)
    return pa.table({
        "subj": pa.array(subjs, pa.string()),
        "pred": pa.array(["p"] * n, pa.string()),
        "obj": pa.array(objs, pa.string()),
        "obj_is_uri": pa.array([True] * n, pa.bool_()),
        "lang": pa.array([""] * n, pa.string()),
        "datatype": pa.array([""] * n, pa.string()),
        "url": pa.array([f"u{i % 7}" for i in range(n)], pa.string()),
    })


def test_combiner_collapses_identical_triple_flood():
    """10k copies of ONE triple cross the shuffle as ONE row per batch."""
    batch = _triples_table(["s"] * 10_000, ["o"] * 10_000)
    out = mat.add_keys(batch, num_buckets=64)
    assert out.num_rows == 1
    # deterministic survivor: smallest url wins
    assert out.column("url").to_pylist() == ["u0"]


def test_head_subject_spreads_over_buckets():
    """One subject with 50k DISTINCT objects must NOT hot-spot a bucket:
    full-key hashing spreads it ~uniformly."""
    n = 50_000
    batch = _triples_table(["head-entity"] * n, [f"o{i}" for i in range(n)])
    out = mat.add_keys(batch, num_buckets=64)
    assert out.num_rows == n  # all distinct — nothing collapsed
    counts = np.bincount(out.column("bucket").to_numpy(), minlength=64)
    assert counts.max() < 2.0 * n / 64  # no bucket > 2x the mean


def test_e2e_hot_citation_dedups_to_one(ray_session, tmp_path):
    """Every doc cites the same hot URL; the materialized table holds the
    page-scoped triples but the per-(subj,pred,obj) sets stay exact."""
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines import kg

    # synthesize pages whose sections all cite one URL
    rows = []
    hot = "https://hot.example.org/target.html"
    for i in range(30):
        html = (f"<html lang=\"en\"><head><title>D{i}</title></head><body>"
                f"<h2>1. One</h2><p>see {hot} now.</p>"
                f"<h2>2. Two</h2><p>again {hot} here.</p>"
                "</body></html>").encode()
        rows.append({"url": f"https://site.org/{i}", "warc_ts": 1_700_000_000_000_000 + i,
                     "html": html, "text": "", "lang": "en"})
    tab = pa.table({
        "url": pa.array([r["url"] for r in rows]),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "lang": pa.array([r["lang"] for r in rows]),
    })
    p = str(tmp_path / "hot_pages.parquet")
    pq.write_table(tab, p)
    out = str(tmp_path / "kg")
    kg.run_kg_pipeline(p, out, num_buckets=8, batch_size=8)
    df = mat.read_triples(out).to_pandas()
    refs = df[(df.obj == hot)]
    # one reference triple per (page section), deduplicated exactly
    assert len(refs) == 60
    assert not refs.duplicated(subset=mat.KEY_COLS).any()
