"""Citation-graph analytics over the triples table (reference
``sources/general/graphanalyze.py:537-925``: degree distributions,
pagerank/HITS ranking via networkx — rebuilt distributed, no networkx,
no driver-side graph).

Edges = reference-predicate triples ``(subj → obj)``.

Iterative algorithms (pagerank, HITS) use a BSP-on-partitioned-files
design (the same two-phase filesystem-shuffle tier as
``stages/materialize.py``):

* the edge set is hash-partitioned ONCE by node bucket and written as
  hive-partitioned parquet (edges keyed by src and by dst, node table
  per bucket) — at 10^12 edges this one-time partitioning is the only
  move the edges ever make;
* each power-iteration round is two waves of per-bucket ray tasks:
  a map wave joins the (bucket-aligned) score vector to its edge
  partition in pandas and writes PRE-AGGREGATED contribution partials
  into the destination buckets' directories, a reduce wave sums each
  bucket's partials into the next score vector. Only the score vector
  moves per round; the driver holds scalars (dangling mass, norms).

This beats per-round Dataset shuffles by ~50× wall here (Ray's sort
exchange has a multi-second fixed barrier per round; measured in
BASELINE.md §4), and it is the honest cluster design: on multi-node the
stage root is shared storage, per-bucket tasks are independent and
retryable.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


# -- BSP machinery for iterative node-score algorithms ----------------------

def _graph_stage_root() -> str:
    from ferenda_ray.bsp import stage_root

    return stage_root("ferenda_graph")


def _stage_graph(edges_ds, root: str, num_buckets: int) -> int:
    """One-time partitioning: edges hive-written by hash(src) AND by
    hash(dst); per-bucket node tables (url, outdeg) reduced from
    endpoint indicator rows. Returns the global node count."""
    from ferenda_ray.util import stable_uint

    def tag(b: pa.Table) -> pa.Table:
        src = b.column("src").to_pylist()
        dst = b.column("dst").to_pylist()
        return pa.table({
            "src": b.column("src"),
            "dst": b.column("dst"),
            "sb": pa.array([stable_uint(s, num_buckets) for s in src],
                           pa.int32()),
            "db": pa.array([stable_uint(d, num_buckets) for d in dst],
                           pa.int32()),
        })

    tagged = edges_ds.map_batches(tag, batch_format="pyarrow").materialize()
    tagged.select_columns(["src", "dst", "sb"]).write_parquet(
        os.path.join(root, "edges_by_src"), partition_cols=["sb"])
    tagged.select_columns(["src", "dst", "db"]).write_parquet(
        os.path.join(root, "edges_by_dst"), partition_cols=["db"])

    def endpoints(b: pa.Table) -> pa.Table:
        src = b.column("src").to_pylist()
        dst = b.column("dst").to_pylist()
        return pa.table({
            "url": pa.concat_arrays([
                b.column("src").combine_chunks().cast(pa.string()),
                b.column("dst").combine_chunks().cast(pa.string())]),
            "out": pa.array([1] * len(src) + [0] * len(dst), pa.int64()),
            "nb": pa.array([stable_uint(u, num_buckets)
                            for u in src + dst], pa.int32()),
        })

    (tagged.map_batches(endpoints, batch_format="pyarrow")
     .write_parquet(os.path.join(root, "nodes_raw"), partition_cols=["nb"]))

    @ray.remote
    def build_nodes(b: int) -> int:
        import pyarrow.dataset as pads

        d = os.path.join(root, "nodes_raw", f"nb={b}")
        if not os.path.isdir(d):
            pq.write_table(pa.table({"url": pa.array([], pa.string()),
                                     "outdeg": pa.array([], pa.int64())}),
                           os.path.join(root, f"nodes-{b:05d}.parquet"))
            return 0
        t = pads.dataset(d).to_table()
        g = (t.to_pandas().groupby("url", sort=True)["out"].sum()
             .rename("outdeg").reset_index())
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       os.path.join(root, f"nodes-{b:05d}.parquet"))
        return len(g)

    counts = ray.get([build_nodes.remote(b) for b in range(num_buckets)])
    return int(sum(counts))


def _bucket_edges(root: str, kind: str, b: int) -> pd.DataFrame:
    from ferenda_ray.bsp import read_hive_bucket

    col = "sb" if kind == "edges_by_src" else "db"
    t = read_hive_bucket(root, kind, col, b, ["src", "dst"])
    if t is None:
        return pd.DataFrame({"src": pd.Series([], dtype="object"),
                             "dst": pd.Series([], dtype="object")})
    # fragment-file order is not guaranteed; pin row order so float
    # contribution sums are bit-reproducible run to run
    return t.to_pandas().sort_values(["src", "dst"], kind="mergesort",
                                     ignore_index=True)


def _nodes_df(root: str, b: int) -> pd.DataFrame:
    return pq.read_table(os.path.join(root, f"nodes-{b:05d}.parquet")
                         ).to_pandas()


from ferenda_ray.bsp import read_partials as _read_partials
from ferenda_ray.bsp import write_partials as _write_partials


def _resume_round(root: str, num_buckets: int, n_iter: int) -> int:
    """Highest r (≤ n_iter) whose rank files exist for EVERY bucket —
    the restart point after a crash; 0 when nothing usable exists."""
    for r in range(n_iter, -1, -1):
        if all(os.path.exists(os.path.join(root,
                                           f"rank{r}-{b:05d}.parquet"))
               for b in range(num_buckets)):
            return r
    return 0


def pagerank(edges_ds, damping: float = 0.85, n_iter: int = 10,
             num_buckets: int = 16, resume_root: str | None = None):
    """PageRank with bounded power iterations on the BSP tier (module
    docstring): edges partitioned once, the rank vector is per-bucket
    parquet (never a driver dict — round 1 re-broadcast a driver rank
    map per round), each round = one map wave (rank ⋈ edge partition,
    local pre-aggregation by dst) + one reduce wave (sum partials →
    next rank). Driver state per round: the dangling-mass scalar.
    Returns a lazy Dataset (url, rank) over the per-bucket result
    parquet — node-level output never concentrates on the driver.

    ``resume_root``: a caller-chosen durable stage dir (shared storage
    on a cluster). A rerun after a crash skips the one-time edge
    staging (validated against the persisted ``num_buckets`` — a
    mismatch raises rather than silently splitting the keyspace
    differently) and restarts from the last round whose rank files are
    complete in every bucket; both waves are idempotent (fragment
    filenames are deterministic, so a half-written round is simply
    overwritten). Output is bit-identical to an uninterrupted run
    (chaos-gated in tests/test_bsp_resume.py)."""
    import json as _json

    from ferenda_ray.bsp import publish_dataset

    root = resume_root or _graph_stage_root()
    marker = os.path.join(root, "_staged.json")
    done = False
    try:
        if resume_root and os.path.exists(marker):
            meta = _json.load(open(marker))
            if meta["num_buckets"] != num_buckets:
                raise ValueError(
                    f"resume_root was staged with num_buckets="
                    f"{meta['num_buckets']}, got {num_buckets}")
            n = meta["n"]
        else:
            # no marker = staging never completed; a partial hive dir
            # would take APPENDED fragments on rewrite (duplicated
            # edges), so start clean — the ft-index atomicity rule
            if resume_root and os.path.isdir(root):
                shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            n = _stage_graph(edges_ds, root, num_buckets)
            with open(marker, "w") as f:
                _json.dump({"n": n, "num_buckets": num_buckets}, f)
        if n == 0:
            done = True
            return rd.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}))

        from ferenda_ray.util import stable_uint

        @ray.remote
        def init_rank(b: int) -> None:
            nd = _nodes_df(root, b)
            nd["rank"] = 1.0 / n
            pq.write_table(pa.Table.from_pandas(nd, preserve_index=False),
                           os.path.join(root, f"rank0-{b:05d}.parquet"))

        r_start = (_resume_round(root, num_buckets, n_iter)
                   if resume_root else 0)
        if r_start == 0:
            ray.get([init_rank.remote(b) for b in range(num_buckets)])

        @ray.remote
        def pr_map(b: int, r: int) -> float:
            rank = pq.read_table(
                os.path.join(root, f"rank{r}-{b:05d}.parquet")).to_pandas()
            edges = _bucket_edges(root, "edges_by_src", b)
            if len(edges):
                j = edges.merge(rank, left_on="src", right_on="url")
                j["c"] = j["rank"] / j["outdeg"]
                part = (j.groupby("dst", sort=True)["c"].sum()
                        .reset_index().rename(columns={"dst": "url"}))
                part["db"] = [stable_uint(u, num_buckets) for u in part.url]
                _write_partials(root, f"contrib{r}", b, part, "db")
            return float(rank.loc[rank.outdeg == 0, "rank"].sum())

        @ray.remote
        def pr_reduce(b: int, r: int, base: float) -> None:
            nd = _nodes_df(root, b)
            partials = _read_partials(root, f"contrib{r}", b)
            if partials is not None:
                got = partials.groupby("url", sort=True)["c"].sum()
                c = got.reindex(nd.url).fillna(0.0).values
            else:
                c = np.zeros(len(nd))
            nd["rank"] = base + damping * c
            pq.write_table(pa.Table.from_pandas(nd, preserve_index=False),
                           os.path.join(root, f"rank{r + 1}-{b:05d}.parquet"))

        for r in range(r_start, n_iter):
            dangling = sum(ray.get(
                [pr_map.remote(b, r) for b in range(num_buckets)]))
            base = (1.0 - damping) / n + damping * dangling / n
            ray.get([pr_reduce.remote(b, r, base)
                     for b in range(num_buckets)])

        out = publish_dataset(
            root,
            [os.path.join(root, f"rank{n_iter}-{b:05d}.parquet")
             for b in range(num_buckets)],
            "ferenda_graph_pr", columns=["url", "rank"])
        done = True
        return out
    finally:
        # a durable resume_root survives a crash (that is its point);
        # it is removed once the run completes
        if not resume_root or done:
            shutil.rmtree(root, ignore_errors=True)


def hits(edges_ds, n_iter: int = 10, num_buckets: int = 16,
         resume_root: str | None = None):
    """HITS hub/authority scores (reference ``graphanalyze.py:896-925``)
    on the same BSP tier as :func:`pagerank`: per half-step, a map wave
    joins the (bucket-aligned) score vector to its edge partition and
    writes pre-aggregated partials into destination buckets, a reduce
    wave sums them; the L2 norm is the sum of per-bucket scalars and is
    applied when the NEXT wave reads the scores (scores stored raw).
    Returns a lazy Dataset (url, authority, hub): the final
    score-normalize-merge is a per-bucket wave (scores are bucketed by
    the same hash(url) as the node table, so the merge is local) and
    the result is read back from the per-bucket parquet.

    ``resume_root``: same contract as :func:`pagerank`. Because score
    files are SPARSE (a bucket with no partials writes none) and the
    norms are driver scalars, round completion cannot be inferred from
    files — each completed iteration writes a ``round-{i}.json``
    marker carrying both norms, and a rerun restarts after the highest
    marker (no round ever overwrites an earlier round's files, so a
    crashed later round leaves completed ones intact)."""
    import json as _json

    from ferenda_ray.bsp import publish_dataset

    root = resume_root or _graph_stage_root()
    marker = os.path.join(root, "_staged.json")
    done = False
    try:
        if resume_root and os.path.exists(marker):
            meta = _json.load(open(marker))
            if meta["num_buckets"] != num_buckets:
                raise ValueError(
                    f"resume_root was staged with num_buckets="
                    f"{meta['num_buckets']}, got {num_buckets}")
            n = meta["n"]
        else:
            if resume_root and os.path.isdir(root):
                shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            n = _stage_graph(edges_ds, root, num_buckets)
            with open(marker, "w") as f:
                _json.dump({"n": n, "num_buckets": num_buckets}, f)
        if n == 0:
            done = True
            return rd.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "authority": pa.array([], pa.float64()),
                 "hub": pa.array([], pa.float64())}))

        from ferenda_ray.util import stable_uint

        @ray.remote
        def half_step(b: int, edges_kind: str, key: str, other: str,
                      score_tag: str, out_tag: str, norm: float,
                      default: float) -> None:
            """map: scores[score_tag][b] (÷ norm; ``default`` for nodes
            absent from a sparse score file) ⋈ edges on ``key`` → local
            sum per ``other`` → partials into dest buckets."""
            sf = os.path.join(root, f"{score_tag}-{b:05d}.parquet")
            edges = _bucket_edges(root, edges_kind, b)
            if not len(edges):
                return
            if os.path.exists(sf):
                sc = pq.read_table(sf).to_pandas()
                lut = sc.set_index("url")["val"]
                vals = (lut.reindex(edges[key]).fillna(default).values
                        / norm)
            else:
                vals = np.full(len(edges), default / norm)
            part = pd.DataFrame({"url": edges[other].values, "c": vals})
            part = part.groupby("url", sort=True)["c"].sum().reset_index()
            part["db"] = [stable_uint(u, num_buckets) for u in part.url]
            _write_partials(root, out_tag, b, part, "db")

        @ray.remote
        def reduce_sum(b: int, in_tag: str, score_tag: str) -> float:
            partials = _read_partials(root, in_tag, b)
            if partials is None:
                return 0.0
            got = partials.groupby("url", sort=True)["c"].sum().reset_index()
            got = got.rename(columns={"c": "val"})
            pq.write_table(pa.Table.from_pandas(got, preserve_index=False),
                           os.path.join(root, f"{score_tag}-{b:05d}.parquet"))
            return float((got["val"] ** 2).sum())

        hub_tag, auth_tag = "hub", "auth"
        hub_norm = 1.0
        hub_default = 1.0  # initial hub = 1 for every node (no file yet)
        auth_norm = 1.0
        start = 0
        if resume_root:
            for i in range(n_iter - 1, -1, -1):
                rm = os.path.join(root, f"round-{i}.json")
                if os.path.exists(rm):
                    rmeta = _json.load(open(rm))
                    start = i + 1
                    hub_norm = rmeta["hub_norm"]
                    auth_norm = rmeta["auth_norm"]
                    hub_default = 0.0
                    break
        for i in range(start, n_iter):
            # authority(v) = Σ hub(u), u→v
            ray.get([half_step.remote(b, "edges_by_src", "src", "dst",
                                      f"{hub_tag}{i}", f"ac{i}",
                                      hub_norm, hub_default)
                     for b in range(num_buckets)])
            sq = ray.get([reduce_sum.remote(b, f"ac{i}", f"{auth_tag}{i}")
                          for b in range(num_buckets)])
            auth_norm = (sum(sq) ** 0.5) or 1.0
            # hub(u) = Σ auth(v), u→v
            ray.get([half_step.remote(b, "edges_by_dst", "dst", "src",
                                      f"{auth_tag}{i}", f"hc{i}",
                                      auth_norm, 0.0)
                     for b in range(num_buckets)])
            sq = ray.get([reduce_sum.remote(b, f"hc{i}",
                                            f"{hub_tag}{i + 1}")
                          for b in range(num_buckets)])
            hub_norm = (sum(sq) ** 0.5) or 1.0
            hub_default = 0.0
            if resume_root:
                with open(os.path.join(root, f"round-{i}.json"), "w") as f:
                    _json.dump({"hub_norm": hub_norm,
                                "auth_norm": auth_norm}, f)

        @ray.remote
        def finalize(b: int, a_norm: float, h_norm: float) -> None:
            def bucket_scores(tag: str, norm: float, col: str):
                f = os.path.join(root, f"{tag}-{b:05d}.parquet")
                if os.path.exists(f):
                    sc = pq.read_table(f).to_pandas()
                else:
                    sc = pd.DataFrame({"url": pd.Series([], dtype=object),
                                       "val": pd.Series([], dtype=float)})
                sc[col] = sc["val"] / norm
                return sc[["url", col]]

            nd = _nodes_df(root, b)[["url"]]
            out = (nd
                   .merge(bucket_scores(f"{auth_tag}{n_iter - 1}",
                                        a_norm, "authority"),
                          on="url", how="left")
                   .merge(bucket_scores(f"{hub_tag}{n_iter}",
                                        h_norm, "hub"),
                          on="url", how="left"))
            out[["authority", "hub"]] = out[["authority", "hub"]].fillna(0.0)
            out = out.sort_values("url", kind="mergesort")
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                           os.path.join(root, f"final-{b:05d}.parquet"))

        ray.get([finalize.remote(b, auth_norm, hub_norm)
                 for b in range(num_buckets)])
        out = publish_dataset(
            root,
            [os.path.join(root, f"final-{b:05d}.parquet")
             for b in range(num_buckets)],
            "ferenda_graph_hits")
        done = True
        return out
    finally:
        if not resume_root or done:
            shutil.rmtree(root, ignore_errors=True)


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


# -- triangle counting (wedge-close, bucketed) ------------------------------

def triangle_count(edges_ds, num_buckets: int = 16):
    """Global triangle count of the (undirected, canonicalized) graph —
    the standard wedge-generate + wedge-close two-exchange algorithm:

    1. canonical distinct edges ``(a < b)``;
    2. wedges grouped by their APEX (the lower endpoint ``a``): per
       bucket, a vectorized pandas self-merge emits ``(b, c)`` per
       neighbor pair ``b < c`` — canonical form means every neighbor
       of the apex is greater than it, so each candidate triangle
       ``a<b<c`` is generated exactly once;
    3. wedge-close: wedges union edges, bucketed by the ``(b, c)``
       pair hash; per bucket one vectorized merge counts wedges whose
       closing edge exists; partial counts sum to one scalar row.

    Apex grouping by node ID (not degree) keeps the oracle a pure
    three-way SQL join; a high-ID hub's wedge set is its degree
    squared — the documented skew ceiling (the degree-ordered variant
    halves it but is no longer order-free; note kept with the code).
    """
    import numpy as np

    from ferenda_ray.util import stable_uint

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_pylist()
        dst = b.column("dst").to_pylist()
        a = [min(s, d) for s, d in zip(src, dst) if s != d]
        c = [max(s, d) for s, d in zip(src, dst) if s != d]
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(c, pa.string())})

    und = (edges_ds.map_batches(canon, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Count())
           .select_columns(["a", "b"]).materialize())

    def bucket_by(col):
        def f(b: pa.Table) -> pa.Table:
            keys = [stable_uint(k, num_buckets)
                    for k in b.column(col).to_pylist()]
            return b.append_column("bucket", pa.array(keys, pa.int32()))
        return f

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="a")
        m = m[m["b_x"] < m["b_y"]]
        return pd.DataFrame({"wa": m["b_x"].to_numpy(),
                             "wb": m["b_y"].to_numpy(),
                             "side": np.zeros(len(m), dtype=np.int8)})

    wedge_rows = (und.map_batches(bucket_by("a"), batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(wedges, batch_format="pandas"))

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table({"wa": b.column("a"), "wb": b.column("b"),
                         "side": pa.array([1] * b.num_rows, pa.int8())})

    def pair_bucket(b: pa.Table) -> pa.Table:
        keys = [stable_uint(f"{x}|{y}", num_buckets)
                for x, y in zip(b.column("wa").to_pylist(),
                                b.column("wb").to_pylist())]
        return b.append_column("bucket", pa.array(keys, pa.int32()))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 1][["wa", "wb"]].drop_duplicates()
        w = g[g["side"] == 0]
        n = len(w.merge(e, on=["wa", "wb"]))
        return pd.DataFrame({"n": [n]})

    from ray.data.aggregate import Sum

    agg = (wedge_rows.union(und.map_batches(edge_rows,
                                            batch_format="pyarrow"))
           .map_batches(pair_bucket, batch_format="pyarrow")
           .groupby("bucket")
           .map_groups(close, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n_triangles")))
    return pd.DataFrame({"n_triangles": [int(agg["n_triangles"])]})
