"""Scale-path generate (bucketed annotations join) must be bit-equal
to the broadcast path (ops/render.generate_join vs generate_batch)."""

import functools

import ray


def test_generate_join_bit_equal_to_broadcast(ray_session, pages_parquet):
    from ferenda_ray.ops.graph import edges_from_triples, incoming_refs
    from ferenda_ray.ops.render import generate_batch, generate_join
    from ferenda_ray.pipelines.kg import build_docs_ds, build_triples_ds

    triples = build_triples_ds(pages_parquet).materialize()
    refs = incoming_refs(edges_from_triples(triples)).materialize()
    docs = build_docs_ds(pages_parquet).materialize()

    # broadcast path
    refs_pd = refs.to_pandas()
    ann = {r.dst: r.citing.split(";") for r in refs_pd.itertuples()}
    broadcast = (docs.map_batches(
        functools.partial(generate_batch, annotations_ref=ray.put(ann)),
        batch_format="pyarrow", batch_size=64)
        .to_pandas().sort_values("url").reset_index(drop=True))

    joined = (generate_join(docs, refs, num_buckets=8)
              .to_pandas().sort_values("url").reset_index(drop=True))

    import pandas as pd

    pd.testing.assert_frame_equal(joined, broadcast)
    # sanity: at least one page actually carries annotations
    assert broadcast.html.str.contains("Referenced by").any()
