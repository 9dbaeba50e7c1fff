"""Multi-node premise of the BSP filesystem tier: with
``FERENDA_RAY_STAGE_ROOT`` pointed at a non-/tmp directory (standing in
for shared storage on a real cluster), every stage-tier operator —
pagerank rounds, minhash verification, the two-phase materialize, the
token-cogroup scorers — must (a) produce the same answers and (b) put
every fragment under the configured root, touching nothing
ferenda-related in /tmp (``bsp.py`` docstring contract; VERDICT r4 #5).
"""

import glob
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def shared_root(monkeypatch):
    # /dev/shm is NOT /tmp — a distinct mount standing in for NFS/S3
    base = f"/dev/shm/ferenda_shared_{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    monkeypatch.setenv("FERENDA_RAY_STAGE_ROOT", base)
    yield base
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def _tmp_ferenda() -> set:
    return set(glob.glob("/tmp/ferenda_dedup*")
               + glob.glob("/tmp/ferenda_graph*")
               + glob.glob("/tmp/ferenda_sh*")
               + glob.glob("/tmp/ferenda_lmce*")
               + glob.glob("/tmp/ferenda_dsir*")
               + glob.glob("/tmp/ferenda_mat*"))


def test_stage_ops_honor_shared_root(ray_session, shared_root, tmp_path):
    import ray.data as rd

    from ferenda_ray.ops.dedup import minhash_dedup_pairs
    from ferenda_ray.ops.graph import edges_from_triples, pagerank
    from ferenda_ray.ops.text import lm_cross_entropy

    before = _tmp_ferenda()

    # --- pagerank (per-round BSP exchanges) ---
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"u{i}" for i in range(20)], pa.string()),
        "dst": pa.array([f"u{(i * 7 + 1) % 20}" for i in range(20)],
                        pa.string()),
    }))
    pr = pagerank(edges, n_iter=3, num_buckets=4).to_pandas()
    assert abs(pr["rank"].sum() - 1.0) < 1e-9

    # --- minhash + exact-Jaccard verify (spill + hive + partials) ---
    text_a = " ".join(f"tok{i}" for i in range(40))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([text_a, text_a + " extra",
                          " ".join(f"other{i}" for i in range(40))],
                         pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    pairs = minhash_dedup_pairs(str(tmp_path)).to_pandas()
    assert set(zip(pairs.doc_a, pairs.doc_b)) == {(1, 2)}

    # --- token-cogroup scorer (hive partials + doc exchange) ---
    ce = lm_cross_entropy(str(tmp_path)).to_pandas()
    assert len(ce) == 3 and ce["cross_entropy"].notna().all()

    # nothing ferenda-stage-related appeared in /tmp; the shared root
    # was actually used (stage dirs come and go — the published result
    # dirs of the lazy Datasets must still live there)
    assert _tmp_ferenda() == before
    assert any(os.scandir(shared_root))


def test_materialize_honors_shared_root(ray_session, shared_root,
                                        tmp_path):
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.kg import run_kg_pipeline
    from ferenda_ray.sources.pages import corpus_table
    from ferenda_ray.stages import materialize as mat

    before = _tmp_ferenda()
    pq.write_table(corpus_table(40), str(tmp_path / "pages.parquet"))
    out = str(tmp_path / "out")
    m = run_kg_pipeline(str(tmp_path / "pages.parquet"), out,
                        num_buckets=4)
    tri = mat.read_triples(out).to_pandas()
    assert len(tri) > 0
    assert _tmp_ferenda() == before


def test_release_spills_frees_stage_tier(ray_session, shared_root):
    """spill_dataset dirs are freed on explicit release once the
    returned Dataset is consumed — a long session of spilling queries
    must not accumulate full-corpus derived copies until exit."""
    import ray.data as rd

    from ferenda_ray import bsp

    ds = rd.range(10)
    out = bsp.spill_dataset(ds, "spilltest")
    assert out.count() == 10
    assert [e for e in os.listdir(shared_root)
            if e.startswith("spilltest-")]
    bsp.release_spills()
    assert not [e for e in os.listdir(shared_root)
                if e.startswith("spilltest-")]
    bsp.release_spills()  # idempotent on an empty registry


def test_bucket_keys_arrow_column_parity():
    """bucket_keys over a pyarrow column (incl. chunked) must equal
    the python-list path — the LSH add_bucket hot path passes the
    arrow column zero-copy."""
    from ferenda_ray.util import bucket_keys

    strs = ["", "a", "ferenda", "https://example.org/0", "råy"] * 3
    ints = [0, 1, -7, 2**40, 17] * 3
    for vals, typ in ((strs, pa.string()), (ints, pa.int64())):
        plain = list(bucket_keys(vals, 64))
        arr = pa.array(vals, typ)
        chunked = pa.chunked_array([arr[:4], arr[4:]])
        assert list(bucket_keys(arr, 64)) == plain
        assert list(bucket_keys(chunked, 64)) == plain
