"""Citation-graph analytics over the triples table (reference
``sources/general/graphanalyze.py:537-925``: degree distributions,
pagerank/HITS ranking via networkx — rebuilt as groupby-aggregate
iterations, no networkx, no driver-side graph).

Edges = reference-predicate triples ``(subj → obj)``; every operator
streams over an edge Dataset:

* degrees: one grouped count per side
* pagerank: bounded power iterations, each = one broadcast of the rank
  vector + one grouped sum (at 10^12 edges the rank vector itself
  becomes a Dataset and the broadcast becomes a bucketed join; the
  iteration structure is unchanged)
* reverse-reference annotation (reference J1/J2
  ``relate_dependencies``/``construct_annotations``,
  ``documentrepository.py:1946-2008``): incoming-reference lists per
  target via groupby-collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count

from ferenda_ray import schemas as S

REFERENCE_PREDS = (S.DCT_REFERENCES,)


def edges_from_triples(triples_ds):
    """triples → (src, dst) edge list (reference predicates only);
    fragment subjects collapse to their page url so the graph is
    page-level (reference treats the doc as the dependency unit)."""

    def to_edges(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(b.column("pred"),
                        value_set=pa.array(REFERENCE_PREDS, pa.string()))
        b = b.filter(mask)
        src = [s.split("#", 1)[0] for s in b.column("subj").to_pylist()]
        dst = [o.split("#", 1)[0] for o in b.column("obj").to_pylist()]
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    return triples_ds.map_batches(to_edges, batch_format="pyarrow")


def out_degrees(edges_ds):
    return edges_ds.groupby("src").aggregate(Count(alias_name="out_degree"))


def in_degrees(edges_ds):
    return edges_ds.groupby("dst").aggregate(Count(alias_name="in_degree"))


def incoming_refs(edges_ds, num_buckets: int = 32):
    """Reverse-reference annotation (J1/J2): per target, the sorted
    distinct list of citing pages (the reference's deps/<basefile>.txt
    content, computed as a shuffle instead of cross-task file appends).
    Bucketed by hash(dst) so one task handles many targets vectorized
    (per-key map_groups pays python overhead per target)."""
    from ferenda_ray.util import stable_uint

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = [stable_uint(d, num_buckets)
                   for d in b.column("dst").to_pylist()]
        return b.append_column("bucket", pa.array(buckets, pa.int32()))

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dst", "src"], kind="mergesort")
        dd = g.drop_duplicates(["dst", "src"])
        agg = dd.groupby("dst", sort=True)["src"].agg(
            n_incoming="size", citing=";".join)
        return agg.reset_index().astype({"n_incoming": "int64"})

    return (edges_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(collect, batch_format="pandas"))


def pagerank(edges_ds, damping: float = 0.85, n_iter: int = 10):
    """PageRank over the edge Dataset with bounded power iterations.

    Each round: broadcast the current rank/out-degree maps (ray.put),
    one map_batches emits per-edge contributions, one grouped sum per
    dst; dangling mass and teleport handled on the driver. Node set and
    rank vectors stay small relative to edges (node-level state);
    returns a pandas DataFrame (url, rank).

    The edge Dataset is materialized ONCE up front — it is consumed
    n_iter+2 times, and a lazy Dataset would re-execute its whole
    upstream pipeline (extract→parse→link!) on every power iteration.
    This is the one legitimate mid-pipeline materialize: edges are the
    iteration's working set (narrow: two string columns)."""
    edges_ds = edges_ds.materialize()
    nodes_df = (
        edges_ds.map_batches(
            lambda b: pa.table(
                {"url": pa.concat_arrays(
                    [b.column("src").combine_chunks().cast(pa.string()),
                     b.column("dst").combine_chunks().cast(pa.string())]
                )}
            ),
            batch_format="pyarrow",
        )
        .groupby("url")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    nodes = nodes_df["url"].tolist()
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"url": [], "rank": []})
    out_df = out_degrees(edges_ds).to_pandas()
    outdeg = dict(zip(out_df["src"], out_df["out_degree"]))
    rank = {u: 1.0 / n for u in nodes}

    for _ in range(n_iter):
        state_ref = ray.put((rank, outdeg))

        def contrib(b: pa.Table) -> pa.Table:
            from ferenda_ray.state import fetch

            r, od = fetch(state_ref)
            src = b.column("src").to_pylist()
            dst = b.column("dst").to_pylist()
            c = [r[s] / od[s] for s in src]
            return pa.table({"dst": pa.array(dst, pa.string()),
                             "c": pa.array(c, pa.float64())})

        from ray.data.aggregate import Sum

        sums = (
            edges_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        got = dict(zip(sums["dst"], sums["c"]))
        dangling = sum(rank[u] for u in nodes if u not in outdeg)
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {u: base + damping * got.get(u, 0.0) for u in nodes}

    out = pd.DataFrame({"url": nodes, "rank": [rank[u] for u in nodes]})
    return out.sort_values(["rank", "url"],
                           ascending=[False, True]).reset_index(drop=True)


def skeleton(triples_ds):
    """Referenced-but-undefined URIs (reference J5 ``Skeleton``,
    ``sources/general/skeleton.py:16-60``): page-level URIs that occur
    as reference objects but never as subjects → stub-document list.

    Anti-join as indicator aggregation: union (uri, n_refs, n_defs)
    partials from both sides, one grouped sum, filter n_defs == 0 —
    no row-level join, one narrow shuffle keyed by uri."""
    from ray.data.aggregate import Sum

    def ref_side(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(b.column("pred"),
                        value_set=pa.array(REFERENCE_PREDS, pa.string()))
        objs = [o.split("#", 1)[0] for o in b.filter(mask).column("obj").to_pylist()]
        return pa.table({"uri": pa.array(objs, pa.string()),
                         "n_refs": pa.array([1] * len(objs), pa.int64()),
                         "n_defs": pa.array([0] * len(objs), pa.int64())})

    def def_side(b: pa.Table) -> pa.Table:
        subjs = [s.split("#", 1)[0] for s in b.column("subj").to_pylist()]
        return pa.table({"uri": pa.array(subjs, pa.string()),
                         "n_refs": pa.array([0] * len(subjs), pa.int64()),
                         "n_defs": pa.array([1] * len(subjs), pa.int64())})

    both = (triples_ds.map_batches(ref_side, batch_format="pyarrow")
            .union(triples_ds.map_batches(def_side, batch_format="pyarrow"))
            .groupby("uri")
            .aggregate(Sum("n_refs", alias_name="n_refs"),
                       Sum("n_defs", alias_name="n_defs")))
    return both.filter(expr="n_defs == 0 and n_refs > 0").drop_columns(["n_defs"])


def degree_histogram(edges_ds):
    """Distribution of in-degrees (degree → node count) — the
    graphanalyze degree-plot data."""
    ind = in_degrees(edges_ds)
    return ind.groupby("in_degree").aggregate(Count(alias_name="n_nodes"))


def hits(edges_ds, n_iter: int = 10):
    """HITS hub/authority scores (reference ``graphanalyze.py:896-925``
    ranks with pagerank AND HITS). Same bounded-iteration shape as
    :func:`pagerank`: per round, one map_batches emits contributions
    against the broadcast score vectors, grouped sums reduce per node;
    L2 normalization on the driver (node-level state stays small).
    Returns a pandas DataFrame (url, authority, hub), deterministically
    ordered."""
    edges_ds = edges_ds.materialize()  # consumed 2x per iteration
    from ray.data.aggregate import Sum

    nodes = set()
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        nodes.update(b.column("src").to_pylist())
        nodes.update(b.column("dst").to_pylist())
    nodes = sorted(nodes)
    if not nodes:
        return pd.DataFrame({"url": [], "authority": [], "hub": []})
    auth = {u: 1.0 for u in nodes}
    hub = {u: 1.0 for u in nodes}

    for _ in range(n_iter):
        state_ref = ray.put(hub)

        def auth_contrib(b: pa.Table, _ref=state_ref) -> pa.Table:
            from ferenda_ray.state import fetch

            h = fetch(_ref)
            return pa.table({
                "node": b.column("dst"),
                "c": pa.array([h[s] for s in b.column("src").to_pylist()],
                              pa.float64()),
            })

        sums = (edges_ds.map_batches(auth_contrib, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="c"))
                .to_pandas())
        got = dict(zip(sums["node"], sums["c"]))
        norm = (sum(v * v for v in got.values()) ** 0.5) or 1.0
        auth = {u: got.get(u, 0.0) / norm for u in nodes}

        a_ref = ray.put(auth)

        def hub_contrib(b: pa.Table, _ref=a_ref) -> pa.Table:
            from ferenda_ray.state import fetch

            a = fetch(_ref)
            return pa.table({
                "node": b.column("src"),
                "c": pa.array([a[d] for d in b.column("dst").to_pylist()],
                              pa.float64()),
            })

        sums = (edges_ds.map_batches(hub_contrib, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="c"))
                .to_pandas())
        got = dict(zip(sums["node"], sums["c"]))
        norm = (sum(v * v for v in got.values()) ** 0.5) or 1.0
        hub = {u: got.get(u, 0.0) / norm for u in nodes}

    out = pd.DataFrame({"url": nodes,
                        "authority": [auth[u] for u in nodes],
                        "hub": [hub[u] for u in nodes]})
    return out.sort_values(["authority", "url"],
                           ascending=[False, True]).reset_index(drop=True)
