"""Scale-path canonicalization: the salted hash-bucket JOIN rewrite
must produce exactly the same triples as the broadcast-map rewrite
(including literal pass-through)."""

import pandas as pd

import ray
import ray.data as rd

from ferenda_ray.pipelines import kg
from ferenda_ray.stages.canon import canon_join


def test_join_matches_broadcast(ray_session, tmp_path):
    import functools

    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    p = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(40), p)

    alias, emb, canon = kg.default_link_state()
    alias_ref, emb_ref = ray.put(alias), ray.put(emb)
    raw = kg.read_pages(p).map_batches(
        functools.partial(kg.pages_to_triples_batch, alias_ref=alias_ref,
                          emb_ref=emb_ref),
        batch_format="pyarrow", batch_size=16)
    raw_df = raw.to_pandas()

    mapping = rd.from_items(
        [{"raw": r, "canonical": c} for r, c in canon.items()])
    joined = canon_join(raw, mapping, num_buckets=4, salt=3).to_pandas()

    broadcast = kg.build_triples_ds(
        p, batch_size=16, dedupe_snapshots=False).to_pandas()

    key = ["subj", "pred", "obj", "lang", "datatype", "url"]
    a = joined.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = broadcast.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    # literals untouched by the join rewrite
    lit_in = sorted(raw_df[~raw_df.obj_is_uri].obj.tolist())
    lit_out = sorted(joined[~joined.obj_is_uri].obj.tolist())
    assert lit_in == lit_out
