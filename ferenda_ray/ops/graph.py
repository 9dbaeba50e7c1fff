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
    from ferenda_ray.util import bucket_keys

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = bucket_keys(b.column("dst"), num_buckets)
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

# identifies the bucket-assignment hash baked into a staged resume
# root, so a durable root staged under a different hash refuses to
# resume instead of silently splitting the keyspace differently
# ("sha1" was the pre-r5 per-row python assignment). Stamped as
# BEHAVIOR, not name: the string path rides polars' xxhash kernel,
# whose output is not contractually stable across polars versions, so
# the stamp embeds the actual bucket ids of sentinel keys — a polars
# upgrade between staging and resume that changes the kernel flips the
# stamp and _check_staged_params raises rather than misrouting every
# round's contributions.
def _bucket_fn_stamp() -> str:
    from ferenda_ray.util import bucket_keys

    probe = bucket_keys(["", "a", "ferenda", "https://example.org/0",
                         "råy"], 1 << 31)
    return "xxh64-splitmix/" + "-".join(str(int(x)) for x in probe)


_BUCKET_FN_CACHE: list[str] = []


def _bucket_fn() -> str:
    if not _BUCKET_FN_CACHE:
        _BUCKET_FN_CACHE.append(_bucket_fn_stamp())
    return _BUCKET_FN_CACHE[0]


def _graph_stage_root() -> str:
    from ferenda_ray.bsp import stage_root

    return stage_root("ferenda_graph")


def _atomic_write_table(tab: pa.Table, path: str) -> None:
    """Crash-atomic parquet write: tmp + os.replace. The BSP resume
    logic infers round completeness from file EXISTENCE, so a SIGKILL
    mid-write must never leave a torn file under the final name (it
    would be counted as a complete round and then crash every resume)."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj, path: str) -> None:
    """Crash-atomic JSON marker write (same rationale as
    :func:`_atomic_write_table` — markers witness completion)."""
    import json as _json

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
    os.replace(tmp, path)


def _check_staged_params(meta: dict, want: dict) -> None:
    """Raise if a durable resume_root was staged under different
    algorithm parameters — resuming would silently mix rounds computed
    under two configurations (same failure class the num_buckets check
    prevents)."""
    for k, v in want.items():
        if meta.get(k) != v:
            raise ValueError(
                f"resume_root was staged with {k}={meta.get(k)!r}, "
                f"got {v!r}")


def _stage_graph(edges_ds, root: str, num_buckets: int) -> int:
    """One-time partitioning: edges hive-written by hash(src) AND by
    hash(dst); per-bucket node tables (url, outdeg) reduced from
    endpoint indicator rows. Returns the global node count."""
    from ferenda_ray.util import bucket_keys

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column("src"),
            "dst": b.column("dst"),
            "sb": pa.array(bucket_keys(b.column("src"), num_buckets),
                           pa.int32()),
            "db": pa.array(bucket_keys(b.column("dst"), num_buckets),
                           pa.int32()),
        })

    tagged = edges_ds.map_batches(tag, batch_format="pyarrow").materialize()
    tagged.select_columns(["src", "dst", "sb"]).write_parquet(
        os.path.join(root, "edges_by_src"), partition_cols=["sb"])
    tagged.select_columns(["src", "dst", "db"]).write_parquet(
        os.path.join(root, "edges_by_dst"), partition_cols=["db"])

    def endpoints(b: pa.Table) -> pa.Table:
        n = b.num_rows
        url = pa.concat_arrays([
            b.column("src").combine_chunks().cast(pa.string()),
            b.column("dst").combine_chunks().cast(pa.string())])
        return pa.table({
            "url": url,
            "out": pa.array(np.r_[np.ones(n, np.int64),
                                  np.zeros(n, np.int64)]),
            "nb": pa.array(bucket_keys(url, num_buckets), pa.int32()),
        })

    (tagged.map_batches(endpoints, batch_format="pyarrow")
     .write_parquet(os.path.join(root, "nodes_raw"), partition_cols=["nb"]))

    @ray.remote
    def build_nodes(b: int) -> int:
        import pyarrow.dataset as pads

        d = os.path.join(root, "nodes_raw", f"nb={b}")
        if not os.path.isdir(d):
            _atomic_write_table(
                pa.table({"url": pa.array([], pa.string()),
                          "outdeg": pa.array([], pa.int64())}),
                os.path.join(root, f"nodes-{b:05d}.parquet"))
            return 0
        t = pads.dataset(d).to_table()
        g = (t.to_pandas().groupby("url", sort=True)["out"].sum()
             .rename("outdeg").reset_index())
        _atomic_write_table(pa.Table.from_pandas(g, preserve_index=False),
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
            _check_staged_params(meta, {"num_buckets": num_buckets,
                                        "damping": damping,
                                        "n_iter": n_iter,
                                        "bucket_fn": _bucket_fn()})
            n = meta["n"]
        else:
            # no marker = staging never completed; a partial hive dir
            # would take APPENDED fragments on rewrite (duplicated
            # edges), so start clean — the ft-index atomicity rule
            if resume_root and os.path.isdir(root):
                shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            n = _stage_graph(edges_ds, root, num_buckets)
            _atomic_write_json({"n": n, "num_buckets": num_buckets,
                                "damping": damping, "n_iter": n_iter,
                                "bucket_fn": _bucket_fn()},
                               marker)
        if n == 0:
            done = True
            return rd.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}))

        from ferenda_ray.util import bucket_keys

        @ray.remote
        def init_rank(b: int) -> None:
            nd = _nodes_df(root, b)
            nd["rank"] = 1.0 / n
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
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
                part["db"] = bucket_keys(part.url.to_numpy(), num_buckets)
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
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
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
            _check_staged_params(meta, {"num_buckets": num_buckets,
                                        "n_iter": n_iter,
                                        "bucket_fn": _bucket_fn()})
            n = meta["n"]
        else:
            if resume_root and os.path.isdir(root):
                shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            n = _stage_graph(edges_ds, root, num_buckets)
            _atomic_write_json({"n": n, "num_buckets": num_buckets,
                                "n_iter": n_iter,
                                "bucket_fn": _bucket_fn()}, marker)
        if n == 0:
            done = True
            return rd.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "authority": pa.array([], pa.float64()),
                 "hub": pa.array([], pa.float64())}))

        from ferenda_ray.util import bucket_keys

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
            part["db"] = bucket_keys(part.url.to_numpy(), num_buckets)
            _write_partials(root, out_tag, b, part, "db")

        @ray.remote
        def reduce_sum(b: int, in_tag: str, score_tag: str) -> float:
            partials = _read_partials(root, in_tag, b)
            if partials is None:
                return 0.0
            got = partials.groupby("url", sort=True)["c"].sum().reset_index()
            got = got.rename(columns={"c": "val"})
            _atomic_write_table(
                pa.Table.from_pandas(got, preserve_index=False),
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
                _atomic_write_json({"hub_norm": hub_norm,
                                    "auth_norm": auth_norm},
                                   os.path.join(root, f"round-{i}.json"))

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
            _atomic_write_table(
                pa.Table.from_pandas(out, preserve_index=False),
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

def _pl_bucket(tab: pa.Table, cols, mod: int) -> pa.Table:
    """Vectorized bucket column over one or more key columns (polars
    row hash — bucket ids only need within-run consistency; the output
    of every caller is invariant to the bucketing)."""
    import polars as pl

    df = pl.from_arrow(tab.select(list(cols)))
    h = (df.hash_rows(seed=0) % mod).cast(pl.Int32).rename("bucket")
    return tab.append_column("bucket", h.to_arrow())


def _canon_edges(edges_ds, num_buckets: int = 64):
    """Canonical distinct undirected edges ``(a < b)``, self-loops
    dropped; vectorized (element-wise string min/max, no row loop).

    Dedup is a coarse-bucket exchange (pair-hash to ``num_buckets``
    groups, vectorized drop_duplicates per bucket task) — NOT
    ``groupby(a, b)``: Ray's sort exchange with group count ∝ edge
    count is the measured many-groups pathology (BASELINE.md §4 /
    memory pitfall #0; at the 200 k-page bench graph, 1.3 M edges,
    the fine groupby stalled for minutes where the bucketed dedup
    takes seconds). Each pair lands in exactly one bucket, so
    per-bucket distinct == global distinct."""
    import pyarrow.compute as pc

    def canon(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("src"), b.column("dst")))
        b = b.filter(keep)
        return _pl_bucket(pa.table({
            "a": pc.min_element_wise(b.column("src"), b.column("dst")),
            "b": pc.max_element_wise(b.column("src"), b.column("dst")),
        }), ["a", "b"], num_buckets)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["a", "b"]].drop_duplicates()
        return pd.DataFrame({"a": out["a"].astype("object"),
                             "b": out["b"].astype("object")})

    return (edges_ds.map_batches(canon, batch_format="pyarrow")
            .groupby("bucket").map_groups(dedup, batch_format="pandas")
            .materialize())


def _edge_degrees(und, num_buckets: int):
    """(a, b, deg_a, deg_b) over the canonical edge set: a bucketed
    endpoint count (one groupby over ≤num_buckets coarse groups, exact
    per-url count vectorized inside each bucket task) followed by two
    bucketed indicator cogroups that attach the degree to each edge —
    the degree table never concentrates anywhere."""

    def endpoints(b: pa.Table) -> pa.Table:
        urls = pa.chunked_array(b.column("a").chunks
                                + b.column("b").chunks)
        return _pl_bucket(pa.table({"url": urls}), ["url"], num_buckets)

    def count(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("url", sort=True).size().rename("deg")
        return out.reset_index()

    # materialized: BOTH attach passes consume deg — without this the
    # endpoint count + its bucket exchange would execute twice
    deg = (und.map_batches(endpoints, batch_format="pyarrow")
           .groupby("bucket").map_groups(count, batch_format="pandas")
           .materialize())

    def attach(key_col: str, out_col: str):
        """edges (with any columns) ∪ degree rows → bucketed cogroup on
        ``key_col`` → edges gain ``out_col`` (degree of that endpoint)."""

        def deg_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "k": b.column("url"), "a": pa.nulls(n, pa.string()),
                "b": pa.nulls(n, pa.string()),
                "deg_a": pa.nulls(n, pa.int64()),
                "payload": b.column("deg").cast(pa.int64()),
                "side": pa.array([0] * n, pa.int8()),
            })

        def edge_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            dega = (b.column("deg_a") if "deg_a" in b.column_names
                    else pa.nulls(n, pa.int64()))
            return pa.table({
                "k": b.column(key_col), "a": b.column("a"),
                "b": b.column("b"), "deg_a": dega,
                "payload": pa.nulls(n, pa.int64()),
                "side": pa.array([1] * n, pa.int8()),
            })

        def join(g: pd.DataFrame) -> pd.DataFrame:
            lut = g[g["side"] == 0].set_index("k")["payload"]
            e = g[g["side"] == 1]
            # dtypes pinned so empty groups emit the same schema
            out = pd.DataFrame({
                "a": pd.Series(e["a"].values, dtype="object"),
                "b": pd.Series(e["b"].values, dtype="object")})
            if out_col != "deg_a":
                out["deg_a"] = pd.Series(e["deg_a"].values).astype("int64")
            out[out_col] = pd.Series(
                lut.reindex(e["k"]).values).astype("int64")
            return out

        def run(ed):
            both = (ed.map_batches(edge_side, batch_format="pyarrow")
                    .union(deg.map_batches(deg_side,
                                           batch_format="pyarrow"))
                    .map_batches(lambda t: _pl_bucket(t, ["k"],
                                                      num_buckets),
                                 batch_format="pyarrow"))
            return both.groupby("bucket").map_groups(
                join, batch_format="pandas")

        return run

    return attach("b", "deg_b")(attach("a", "deg_a")(und))


def _wedge_rows(und, num_buckets: int, orient: str = "degree",
                with_apex: bool = False):
    """Wedge rows (wa, wb, side=0) of the canonicalized graph;
    ``with_apex`` adds the apex column ``x`` (needed when closed
    wedges must be attributed back to all three triangle vertices,
    e.g. per-node triangle counts).

    ``orient="degree"``: edges oriented low→high in the total order
    (degree, url); the apex of each wedge is the edge SOURCE. Every
    triangle has exactly one vertex out-adjacent to the other two (the
    order's minimum), so each is generated once, and per-apex wedge
    count is C(outdeg, 2) with outdeg ≤ O(√m) amortized — total wedge
    volume O(m^1.5) regardless of hub degree (a degree-d hub attracts
    its edges' ORIENTATIONS, not their wedges: the hub's neighbors,
    almost all lower-degree, are the apexes). This is the 100 TB path.

    ``orient="id"``: apex = lexicographic min endpoint — emits O(d²)
    wedges at a high-id hub; kept as the small-graph cross-check whose
    semantics the SQL oracle's three-way join mirrors directly.
    """
    import numpy as np

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="x")
        m = m[m["y_x"] < m["y_y"]]
        out = {"wa": m["y_x"].to_numpy(), "wb": m["y_y"].to_numpy(),
               "side": np.zeros(len(m), dtype=np.int8)}
        if with_apex:
            out = {"x": m["x"].to_numpy(), **out}
        return pd.DataFrame(out)

    if orient == "id":
        def orient_b(b: pa.Table) -> pa.Table:
            return pa.table({"x": b.column("a"), "y": b.column("b")})

        oriented = und.map_batches(orient_b, batch_format="pyarrow")
    else:
        def orient_b(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            swap = pc.or_(
                pc.less(b.column("deg_b"), b.column("deg_a")),
                pc.and_(pc.equal(b.column("deg_b"), b.column("deg_a")),
                        pc.less(b.column("b"), b.column("a"))))
            return pa.table({
                "x": pc.if_else(swap, b.column("b"), b.column("a")),
                "y": pc.if_else(swap, b.column("a"), b.column("b")),
            })

        oriented = _edge_degrees(und, num_buckets).map_batches(
            orient_b, batch_format="pyarrow")

    # wedge pairs (y1 < y2 lexicographically) are already in canonical
    # id order, so they join directly against the canonical edge set
    return (oriented
            .map_batches(lambda t: _pl_bucket(t, ["x"], num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket").map_groups(wedges, batch_format="pandas"))


def triangle_count(edges_ds, num_buckets: int = 16,
                   orient: str = "degree"):
    """Global triangle count — wedge-generate + wedge-close:

    1. canonical distinct edges ``(a < b)`` (vectorized);
    2. wedges per apex under the chosen orientation
       (:func:`_wedge_rows`; degree-ordered by default, which bounds
       total wedge volume by O(m^1.5) on power-law graphs);
    3. wedge-close: wedges ∪ edges bucketed by the pair hash; one
       vectorized merge per bucket counts wedges whose closing edge
       exists; partial counts sum to one scalar row.

    Both orientations count every triangle exactly once (equality
    pytest on random + star graphs); the SQL oracle is the id-ordered
    three-way join, which is orientation-independent on the count.
    """
    und = _canon_edges(edges_ds)
    if und.count() == 0:  # Min/Max over an empty set has no row
        return pd.DataFrame({"n_triangles": [0]})

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table({"wa": b.column("a"), "wb": b.column("b"),
                         "side": pa.array([1] * b.num_rows, pa.int8())})

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 1][["wa", "wb"]].drop_duplicates()
        w = g[g["side"] == 0]
        n = len(w.merge(e, on=["wa", "wb"]))
        return pd.DataFrame({"n": [n]})

    from ray.data.aggregate import Sum

    agg = (_wedge_rows(und, num_buckets, orient)
           .union(und.map_batches(edge_rows, batch_format="pyarrow"))
           .map_batches(lambda t: _pl_bucket(t, ["wa", "wb"],
                                             num_buckets),
                        batch_format="pyarrow")
           .groupby("bucket")
           .map_groups(close, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n_triangles")))
    val = agg["n_triangles"]
    return pd.DataFrame({"n_triangles": [int(val) if val is not None
                                         else 0]})


def local_triangles(edges_ds, num_buckets: int = 16):
    """Per-node triangle counts + local clustering coefficient over
    the canonical undirected graph. Same degree-ordered wedge-close as
    :func:`triangle_count` (O(m^1.5) wedge volume), but wedges carry
    their apex so each closed wedge credits all THREE triangle
    vertices; one node-keyed exchange then sums the credits and joins
    the degree table. The coefficient ``2T / (d(d-1))`` is emitted in
    exact integer micro-units (``(2_000_000 * T) // (d * (d-1))``) so
    query and SQL oracle agree bit-for-bit (int floordiv both sides).

    Output: ``(url, degree, n_triangles, lcc_micro)`` — one row per
    node of the edge set."""
    import numpy as np

    und = _canon_edges(edges_ds)
    empty = pd.DataFrame({"url": pd.Series([], dtype="object"),
                          "degree": pd.Series([], dtype="int64"),
                          "n_triangles": pd.Series([], dtype="int64"),
                          "lcc_micro": pd.Series([], dtype="int64")})
    if und.count() == 0:
        return empty

    def edge_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"x": pa.nulls(n, pa.string()),
                         "wa": b.column("a"), "wb": b.column("b"),
                         "side": pa.array([1] * n, pa.int8())})

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 1][["wa", "wb"]].drop_duplicates()
        w = g[g["side"] == 0]
        hit = w.merge(e, on=["wa", "wb"])
        u = pd.concat([hit["x"], hit["wa"], hit["wb"]],
                      ignore_index=True)
        out = u.value_counts().rename_axis("url").rename("v")
        out = out.reset_index()
        return pd.DataFrame({"url": out["url"].astype("object"),
                             "v": out["v"].astype("int64"),
                             "tri": np.ones(len(out), dtype=np.int8)})

    tri_partials = (_wedge_rows(und, num_buckets, "degree",
                                with_apex=True)
                    .union(und.map_batches(edge_rows,
                                           batch_format="pyarrow"))
                    .map_batches(lambda t: _pl_bucket(t, ["wa", "wb"],
                                                      num_buckets),
                                 batch_format="pyarrow")
                    .groupby("bucket")
                    .map_groups(close, batch_format="pandas"))

    def endpoints(b: pa.Table) -> pa.Table:
        urls = pa.chunked_array(b.column("a").chunks
                                + b.column("b").chunks)
        n = len(urls)
        return pa.table({"url": urls,
                         "v": pa.array(np.ones(n, dtype=np.int64)),
                         "tri": pa.array(np.zeros(n, dtype=np.int8))})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["url", "tri"], sort=True)["v"].sum()
               .unstack("tri", fill_value=0))
        deg = agg[0] if 0 in agg.columns else pd.Series(0, agg.index)
        tri = agg[1] if 1 in agg.columns else pd.Series(0, agg.index)
        deg = deg.astype("int64")
        tri = tri.astype("int64")
        keep = deg > 0  # triangle credits always ride on a node w/ deg
        deg, tri = deg[keep], tri[keep]
        denom = (deg * (deg - 1)).to_numpy()
        lcc = np.zeros(len(deg), dtype=np.int64)
        mask = denom > 0
        lcc[mask] = (2_000_000 * tri.to_numpy()[mask]) // denom[mask]
        return pd.DataFrame({"url": deg.index.astype("object"),
                             "degree": deg.to_numpy(),
                             "n_triangles": tri.to_numpy(),
                             "lcc_micro": lcc})

    out = (tri_partials
           .union(und.map_batches(endpoints, batch_format="pyarrow"))
           .map_batches(lambda t: _pl_bucket(t, ["url"], num_buckets),
                        batch_format="pyarrow")
           .groupby("bucket").map_groups(finalize,
                                         batch_format="pandas"))
    return out


# -- k-core decomposition (iterative peel, BSP) -----------------------------

def kcore(edges_ds, k: int = 3, n_rounds: int = 8, num_buckets: int = 16):
    """k-core of the undirected citation graph (graphanalyze-family
    analytics, reference ``sources/general/graphanalyze.py:537-925``
    degree-based cohesion reports): iteratively peel nodes whose degree
    in the surviving subgraph is < ``k``; returns the survivors with
    their within-core degree as a lazy ``(url, core_deg)`` Dataset.

    Peeling is synchronous (Jacobi): round ``i`` removes exactly the
    nodes whose degree among round-``i-1`` survivors is < k — the same
    semantics as the unrolled-CTE SQL oracle, so after ``n_rounds``
    both sides hold the identical subgraph whether or not the peel has
    converged (rounds past the fixpoint are the identity; this side
    early-exits on an empty peel wave).

    BSP shape (module docstring): the canonical distinct edge set is
    staged ONCE as half-edges hive-partitioned by ``bucket(u)``; each
    round a dying node sends pre-aggregated degree DECREMENTS to its
    neighbors' buckets (node-level message volume — the edges never
    move again), and the per-bucket survivor table is rewritten
    crash-atomically. Driver state per round: one integer (the global
    peel count)."""
    from ferenda_ray.util import bucket_keys

    if k < 1 or n_rounds < 1:
        raise ValueError(f"need k >= 1 and n_rounds >= 1, "
                         f"got k={k}, n_rounds={n_rounds}")

    und = _canon_edges(edges_ds)
    empty = pa.table({"url": pa.array([], pa.string()),
                      "core_deg": pa.array([], pa.int64())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    root = _graph_stage_root()
    try:
        os.makedirs(root, exist_ok=True)

        def halves(b: pa.Table) -> pa.Table:
            u = pa.concat_arrays([
                b.column("a").combine_chunks().cast(pa.string()),
                b.column("b").combine_chunks().cast(pa.string())])
            v = pa.concat_arrays([
                b.column("b").combine_chunks().cast(pa.string()),
                b.column("a").combine_chunks().cast(pa.string())])
            return pa.table({
                "u": u, "v": v,
                "ub": pa.array(bucket_keys(u, num_buckets), pa.int32()),
            })

        (und.map_batches(halves, batch_format="pyarrow")
         .write_parquet(os.path.join(root, "halfedges"),
                        partition_cols=["ub"]))

        @ray.remote
        def init_nodes(b: int) -> None:
            from ferenda_ray.bsp import read_hive_bucket

            he = read_hive_bucket(root, "halfedges", "ub", b, ["u"])
            if he is None:
                nd = pd.DataFrame({"url": pd.Series([], dtype="object"),
                                   "deg": pd.Series([], dtype="int64")})
            else:
                nd = (he.to_pandas().groupby("u", sort=True).size()
                      .rename("deg").reset_index()
                      .rename(columns={"u": "url"}))
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"core0-{b:05d}.parquet"))

        ray.get([init_nodes.remote(b) for b in range(num_buckets)])

        @ray.remote
        def peel_map(b: int, r: int) -> int:
            """Detect this bucket's dying nodes and mail their degree
            decrements to the neighbors' buckets."""
            from ferenda_ray.bsp import read_hive_bucket

            nd = pq.read_table(
                os.path.join(root, f"core{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            dead = nd.loc[nd.deg < k, "url"]
            if not len(dead):
                return 0
            he = read_hive_bucket(root, "halfedges", "ub", b, ["u", "v"])
            j = he.to_pandas()
            j = j[j.u.isin(set(dead))]
            part = (j.groupby("v", sort=True).size().rename("dec")
                    .reset_index().rename(columns={"v": "url"}))
            part["vb"] = bucket_keys(part.url.to_numpy(), num_buckets)
            _write_partials(root, f"dec{r}", b, part, "vb")
            return int(len(dead))

        @ray.remote
        def peel_reduce(b: int, r: int) -> None:
            """Drop this bucket's dead and apply incoming decrements."""
            nd = pq.read_table(
                os.path.join(root, f"core{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            alive = nd[nd.deg >= k].copy()
            dec = _read_partials(root, f"dec{r}", b)
            if dec is not None and len(alive):
                got = dec.groupby("url", sort=True)["dec"].sum()
                alive["deg"] = (alive["deg"].to_numpy()
                                - got.reindex(alive.url).fillna(0)
                                .to_numpy().astype("int64"))
            _atomic_write_table(
                pa.Table.from_pandas(alive, preserve_index=False),
                os.path.join(root, f"core{r}-{b:05d}.parquet"))

        final = 0
        for r in range(1, n_rounds + 1):
            n_dead = sum(ray.get(
                [peel_map.remote(b, r) for b in range(num_buckets)]))
            if n_dead == 0:
                break
            ray.get([peel_reduce.remote(b, r)
                     for b in range(num_buckets)])
            final = r

        from ferenda_ray.bsp import publish_dataset

        @ray.remote
        def finalize(b: int) -> str:
            """Per-bucket output rewrite (url, core_deg): done on the
            BSP tier rather than a trailing map_batches so an all-peeled
            EMPTY result still reads back with a stable parquet schema.
            A not-yet-converged survivor can reach degree 0 (all its ≥k
            neighbors died in the final round); the subgraph has no
            edges for it, so it is not part of the round's edge set —
            drop it (no-op once converged, where deg ≥ k ≥ 1)."""
            import pyarrow.compute as pc

            t = pq.read_table(
                os.path.join(root, f"core{final}-{b:05d}.parquet"))
            t = t.filter(pc.greater(t.column("deg"), 0))
            out = pa.table({"url": t.column("url").cast(pa.string()),
                            "core_deg": t.column("deg").cast(pa.int64())})
            path = os.path.join(root, f"kcore-{b:05d}.parquet")
            _atomic_write_table(out, path)
            return path, out.num_rows

        done = ray.get([finalize.remote(b) for b in range(num_buckets)])
        if sum(n for _, n in done) == 0:
            # an all-peeled core: hand back an in-memory empty block —
            # a 0-row parquet-backed Dataset loses its column schema
            # through to_pandas()
            return rd.from_arrow(empty)
        return publish_dataset(root, [f for f, _ in done],
                               "ferenda_graph_kcore",
                               columns=["url", "core_deg"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def core_numbers(edges_ds, n_rounds: int = 16, num_buckets: int = 16):
    """Full coreness decomposition of the undirected citation graph —
    every node's core number in one run (the fixed-k slice is
    :func:`kcore`) via distributed h-index iteration (Montresor,
    De Pellegrini & Miorandi 2011, "Distributed k-core decomposition":
    start from ``est₀ = degree`` and repeatedly set ``est(u)`` to the
    h-index of its neighbors' estimates; the sequence is pointwise
    non-increasing and converges to the exact core numbers).

    Updates are synchronous (round r uses round r−1 estimates for ALL
    neighbors) — the same unrolled-CTE oracle contract as
    :func:`kcore`: after ``n_rounds`` both sides hold identical
    estimates whether or not the iteration has converged; this side
    early-exits once a round changes nothing.

    BSP shape: half-edges staged once by ``bucket(u)``; each round a
    bucket mails its nodes' estimates along its half-edges as
    HISTOGRAM rows ``(v, est, count)`` (pre-aggregated per destination
    — the h-index needs only the multiset histogram, never the raw
    edge list), and the reduce wave folds each node's histogram with
    one vectorized sort/cumsum. Driver state per round: one changed
    counter."""
    from ferenda_ray.util import bucket_keys

    if n_rounds < 1:
        raise ValueError(f"need n_rounds >= 1, got {n_rounds}")

    und = _canon_edges(edges_ds)
    empty = pa.table({"url": pa.array([], pa.string()),
                      "coreness": pa.array([], pa.int64())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    root = _graph_stage_root()
    try:
        os.makedirs(root, exist_ok=True)

        def halves(b: pa.Table) -> pa.Table:
            u = pa.concat_arrays([
                b.column("a").combine_chunks().cast(pa.string()),
                b.column("b").combine_chunks().cast(pa.string())])
            v = pa.concat_arrays([
                b.column("b").combine_chunks().cast(pa.string()),
                b.column("a").combine_chunks().cast(pa.string())])
            return pa.table({
                "u": u, "v": v,
                "ub": pa.array(bucket_keys(u, num_buckets), pa.int32()),
            })

        (und.map_batches(halves, batch_format="pyarrow")
         .write_parquet(os.path.join(root, "halfedges"),
                        partition_cols=["ub"]))

        @ray.remote
        def init_est(b: int) -> None:
            from ferenda_ray.bsp import read_hive_bucket

            he = read_hive_bucket(root, "halfedges", "ub", b, ["u"])
            if he is None:
                nd = pd.DataFrame({"url": pd.Series([], dtype="object"),
                                   "est": pd.Series([], dtype="int64")})
            else:
                nd = (he.to_pandas().groupby("u", sort=True).size()
                      .rename("est").reset_index()
                      .rename(columns={"u": "url"}))
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"est0-{b:05d}.parquet"))

        ray.get([init_est.remote(b) for b in range(num_buckets)])

        @ray.remote
        def mail(b: int, r: int) -> None:
            """Send this bucket's estimates along its half-edges as
            per-destination histogram rows (v, e, c)."""
            from ferenda_ray.bsp import read_hive_bucket

            est = pq.read_table(
                os.path.join(root, f"est{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            if not len(est):
                return
            he = read_hive_bucket(root, "halfedges", "ub", b,
                                  ["u", "v"]).to_pandas()
            j = he.merge(est, left_on="u", right_on="url")
            part = (j.groupby(["v", "est"], sort=True).size()
                    .rename("c").reset_index()
                    .rename(columns={"v": "url", "est": "e"}))
            part["vb"] = bucket_keys(part.url.to_numpy(), num_buckets)
            _write_partials(root, f"hx{r}", b, part, "vb")

        @ray.remote
        def fold(b: int, r: int) -> int:
            """New estimate = h-index of the received histogram:
            values sorted desc, H = max(min(e, cum_count))."""
            import numpy as np

            prev = pq.read_table(
                os.path.join(root, f"est{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            hx = _read_partials(root, f"hx{r}", b)
            if hx is None:
                nd = prev
                changed = 0
            else:
                g = (hx.groupby(["url", "e"], sort=True)["c"].sum()
                     .reset_index()
                     .sort_values(["url", "e"],
                                  ascending=[True, False],
                                  kind="mergesort"))
                g["cum"] = g.groupby("url", sort=False)["c"].cumsum()
                g["h"] = np.minimum(g["e"].to_numpy(),
                                    g["cum"].to_numpy())
                new = (g.groupby("url", sort=True)["h"].max()
                       .rename("est").reset_index())
                nd = (prev[["url"]].merge(new, on="url", how="left"))
                # every staged node has ≥1 neighbor, so a missing
                # histogram can only mean its neighbors' est rows were
                # empty — impossible by the same invariant; fillna is
                # belt-and-braces for dtype stability
                nd["est"] = (nd["est"].fillna(0).astype("int64"))
                changed = int((nd["est"].to_numpy()
                               != prev["est"].to_numpy()).sum())
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"est{r}-{b:05d}.parquet"))
            return changed

        final = 0
        for r in range(1, n_rounds + 1):
            ray.get([mail.remote(b, r) for b in range(num_buckets)])
            changed = sum(ray.get(
                [fold.remote(b, r) for b in range(num_buckets)]))
            final = r
            if changed == 0:
                break

        from ferenda_ray.bsp import publish_dataset

        @ray.remote
        def finalize(b: int) -> str:
            t = pq.read_table(
                os.path.join(root, f"est{final}-{b:05d}.parquet"))
            out = pa.table({
                "url": t.column("url").cast(pa.string()),
                "coreness": t.column("est").cast(pa.int64())})
            path = os.path.join(root, f"coreness-{b:05d}.parquet")
            _atomic_write_table(out, path)
            return path

        files = ray.get([finalize.remote(b) for b in range(num_buckets)])
        return publish_dataset(root, files, "ferenda_graph_coreness",
                               columns=["url", "coreness"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def components(edges_ds, num_buckets: int = 16, max_rounds: int = 64):
    """Weakly-connected components of the citation graph — the
    "related document cluster" report of the graphanalyze family
    (string-keyed sibling of ``dedup.dup_clusters``, same iterative
    min-label propagation on the BSP tier): symmetric edges staged
    once by ``bucket(u)``, per-round map wave mails min-label
    candidates, reduce wave takes per-node minima; converges in
    O(component diameter) rounds and raises if ``max_rounds`` is
    exhausted (never returns a silently-unconverged labelling).
    Returns a lazy ``(url, component)`` Dataset, component = the
    lexicographic-min url of the component (ASCII urls, so Python and
    SQL string ordering agree)."""
    from ferenda_ray.util import bucket_keys

    und = _canon_edges(edges_ds)
    empty = pa.table({"url": pa.array([], pa.string()),
                      "component": pa.array([], pa.string())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    root = _graph_stage_root()
    try:
        os.makedirs(root, exist_ok=True)

        def halves(b: pa.Table) -> pa.Table:
            u = pa.concat_arrays([
                b.column("a").combine_chunks().cast(pa.string()),
                b.column("b").combine_chunks().cast(pa.string())])
            v = pa.concat_arrays([
                b.column("b").combine_chunks().cast(pa.string()),
                b.column("a").combine_chunks().cast(pa.string())])
            return pa.table({
                "u": u, "v": v,
                "ub": pa.array(bucket_keys(u, num_buckets), pa.int32()),
            })

        (und.map_batches(halves, batch_format="pyarrow")
         .write_parquet(os.path.join(root, "halfedges"),
                        partition_cols=["ub"]))

        @ray.remote
        def init_labels(b: int) -> None:
            from ferenda_ray.bsp import read_hive_bucket

            he = read_hive_bucket(root, "halfedges", "ub", b, ["u"])
            if he is None:
                nd = pd.DataFrame({"url": pd.Series([], dtype="object"),
                                   "lbl": pd.Series([], dtype="object")})
            else:
                urls = he.to_pandas()["u"].drop_duplicates().sort_values()
                nd = pd.DataFrame({"url": urls.to_numpy(),
                                   "lbl": urls.to_numpy()})
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"lbl0-{b:05d}.parquet"))

        ray.get([init_labels.remote(b) for b in range(num_buckets)])

        @ray.remote
        def lp_map(b: int, r: int) -> None:
            """Mail each neighbor the sender's current label,
            pre-minimized per destination node."""
            from ferenda_ray.bsp import read_hive_bucket

            lbl = pq.read_table(
                os.path.join(root, f"lbl{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            if not len(lbl):
                return
            he = read_hive_bucket(root, "halfedges", "ub", b,
                                  ["u", "v"]).to_pandas()
            j = he.merge(lbl, left_on="u", right_on="url")
            part = (j.groupby("v", sort=True)["lbl"].min()
                    .reset_index().rename(columns={"v": "url"}))
            part["vb"] = bucket_keys(part.url.to_numpy(), num_buckets)
            _write_partials(root, f"cand{r}", b, part, "vb")

        @ray.remote
        def lp_reduce(b: int, r: int) -> int:
            prev = pq.read_table(
                os.path.join(root, f"lbl{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            cand = _read_partials(root, f"cand{r}", b)
            if cand is None or not len(prev):
                nd = prev
                changed = 0
            else:
                got = cand.groupby("url", sort=True)["lbl"].min()
                incoming = got.reindex(prev.url).to_numpy()
                old = prev["lbl"].to_numpy()
                mask = pd.notna(incoming) & (incoming < old)
                nd = prev.copy()
                nd.loc[mask, "lbl"] = incoming[mask]
                changed = int(mask.sum())
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"lbl{r}-{b:05d}.parquet"))
            return changed

        final = 0
        for r in range(1, max_rounds + 1):
            ray.get([lp_map.remote(b, r) for b in range(num_buckets)])
            changed = sum(ray.get(
                [lp_reduce.remote(b, r) for b in range(num_buckets)]))
            final = r
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"components did not converge in {max_rounds} rounds")

        from ferenda_ray.bsp import publish_dataset

        @ray.remote
        def finalize(b: int) -> str:
            t = pq.read_table(
                os.path.join(root, f"lbl{final}-{b:05d}.parquet"))
            out = pa.table({
                "url": t.column("url").cast(pa.string()),
                "component": t.column("lbl").cast(pa.string())})
            path = os.path.join(root, f"comp-{b:05d}.parquet")
            _atomic_write_table(out, path)
            return path

        files = ray.get([finalize.remote(b) for b in range(num_buckets)])
        return publish_dataset(root, files, "ferenda_graph_cc",
                               columns=["url", "component"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def cocitations(edges_ds, min_count: int = 2, num_buckets: int = 16):
    """Co-citation analysis (Small 1973; the bibliometrics member of
    the graphanalyze report family): pairs of documents cited TOGETHER
    by at least ``min_count`` distinct sources, with the co-citation
    count. Two bucketed exchanges:

    1. distinct edges grouped by ``hash(src)`` — one vectorized
       self-merge per bucket emits each source's citation pairs
       (``dst_a < dst_b``) pre-counted per (pair, bucket task);
    2. pair-hash buckets sum the partials and apply the threshold.

    Scale note: pair volume is Σ C(outdeg_s, 2) — the same wedge
    volume as triangle counting, but the apex is FIXED by the
    semantics (the citing source), so degree-orienting it away is not
    an option. At web scale the standard mitigations are an outdeg cap
    on pathological hub sources and pushing ``min_count`` down into
    the pair buckets (done here — partials are pre-aggregated per
    bucket task and the threshold drops the long singleton tail before
    it ever leaves the second exchange)."""

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        m = g.merge(g, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        out = (m.groupby(["dst_x", "dst_y"], sort=True).size()
               .rename("n").reset_index()
               .rename(columns={"dst_x": "a", "dst_y": "b"}))
        return out.astype({"n": "int64"})

    def close(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], as_index=False, sort=True)["n"]
               .sum())
        out = out[out["n"] >= min_count]
        return pd.DataFrame({
            "a": out["a"].astype("object"),
            "b": out["b"].astype("object"),
            "n_cocited": out["n"].astype("int64")})

    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(pc.equal(b.column("src"),
                                           b.column("dst"))))

    return (edges_ds.map_batches(drop_self, batch_format="pyarrow")
            .map_batches(lambda t: _pl_bucket(t, ["src"], num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket").map_groups(wedge_pairs,
                                          batch_format="pandas")
            .map_batches(lambda t: _pl_bucket(t, ["a", "b"],
                                              num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket").map_groups(close, batch_format="pandas"))


def coupling(edges_ds, min_count: int = 2, num_buckets: int = 16):
    """Bibliographic coupling (Kessler 1963) — the symmetric twin of
    :func:`cocitations`: pairs of CITING documents that share at least
    ``min_count`` cited targets. Same two-exchange shape with the edge
    roles swapped (the apex of each wedge is the shared TARGET), so
    the implementation is the co-citation engine over reversed
    edges."""

    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("dst"), "dst": b.column("src")})

    out = cocitations(edges_ds.map_batches(swap, batch_format="pyarrow"),
                      min_count=min_count, num_buckets=num_buckets)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "n_coupled": t.column("n_cocited")})

    return out.map_batches(rename, batch_format="pyarrow")


def host_graph(edges_ds, num_buckets: int = 16):
    """Coarsen the page-level citation graph to the HOST level — the
    standard web-scale summary product (domain graphs are how crawl
    link structure is actually consumed at 10^12 pages; the page-level
    graph is too big to hand to anything downstream). Per-batch
    combiner pre-counts (src_host, dst_host) pairs so the single
    pair-keyed exchange carries one partial row per distinct host pair
    per batch, not one row per link."""
    from ferenda_ray.ops.web import host_of

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"src_host": host_of(b.column("src")),
                      "dst_host": host_of(b.column("dst"))})
        df = (t.to_pandas()
              .groupby(["src_host", "dst_host"], as_index=False,
                       sort=False).size().rename(columns={"size": "n"}))
        df["n"] = df["n"].astype("int64")
        return _pl_bucket(pa.Table.from_pandas(df, preserve_index=False),
                          ["src_host", "dst_host"], num_buckets)

    def close(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["src_host", "dst_host"], as_index=False,
                         sort=True)["n"].sum())
        return pd.DataFrame({
            "src_host": out["src_host"].astype("object"),
            "dst_host": out["dst_host"].astype("object"),
            "n_links": out["n"].astype("int64")})

    return (edges_ds.map_batches(partials, batch_format="pyarrow")
            .groupby("bucket").map_groups(close, batch_format="pandas"))


def aa_weight_micro(outdeg: np.ndarray) -> np.ndarray:
    """Adamic–Adar wedge weight ``1/ln(outdeg)`` in exact integer
    micro-units: ``floor(1e6 / ln(d))`` as int64. Integerizing per
    TERM (not per sum) makes the pair scores exact under any partial-
    sum order — the same float-determinism rule as the int-cent money
    aggregates (``ops/relational.py``). ``d >= 2`` is guaranteed by
    construction (a wedge needs two distinct endpoints).
    DuckDB-parity (``FLOOR(1000000.0 / LN(d))``) is pinned by a pytest
    sweep over d in 2..5000: both sides call the platform libm on the
    same doubles."""
    return np.floor(1_000_000.0 / np.log(outdeg.astype("float64"))
                    ).astype("int64")


def adamic_adar(edges_ds, min_count: int = 2, num_buckets: int = 16):
    """Adamic–Adar link prediction (Adamic & Adar 2003) on the
    citation graph: for each candidate pair of documents co-cited by
    at least ``min_count`` distinct sources, the score
    ``Σ_s 1/ln(outdeg(s))`` over the shared citing sources — frequent
    citers count less. Same two-exchange shape as :func:`cocitations`
    (the apex is the citing source); outdeg is exact within the first
    exchange because edges are grouped by ``hash(src)``, so a source's
    full (distinct) out-neighbourhood is co-located. Scores travel as
    int64 micro-units (:func:`aa_weight_micro`) so partials sum
    exactly in any order."""

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        od = g.groupby("src")["src"].transform("size")
        g = g[od >= 2]
        if not len(g):
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64"),
                                 "aa": pd.Series([], dtype="int64")})
        wt = g.groupby("src").size().to_frame("od")
        wt["wt"] = aa_weight_micro(wt["od"].to_numpy())
        m = g.merge(g, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        m = m.merge(wt[["wt"]], left_on="src", right_index=True)
        out = (m.groupby(["dst_x", "dst_y"], sort=True)
               .agg(n=("src", "size"), aa=("wt", "sum")).reset_index()
               .rename(columns={"dst_x": "a", "dst_y": "b"}))
        return out.astype({"n": "int64", "aa": "int64"})

    def close(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], as_index=False, sort=True)
               .agg(n=("n", "sum"), aa=("aa", "sum")))
        out = out[out["n"] >= min_count]
        return pd.DataFrame({
            "a": out["a"].astype("object"),
            "b": out["b"].astype("object"),
            "n_common": out["n"].astype("int64"),
            "aa_micro": out["aa"].astype("int64")})

    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(pc.equal(b.column("src"),
                                           b.column("dst"))))

    return (edges_ds.map_batches(drop_self, batch_format="pyarrow")
            .map_batches(lambda t: _pl_bucket(t, ["src"], num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket").map_groups(wedge_pairs,
                                          batch_format="pandas")
            .map_batches(lambda t: _pl_bucket(t, ["a", "b"],
                                              num_buckets),
                         batch_format="pyarrow")
            .groupby("bucket").map_groups(close, batch_format="pandas"))


def link_prediction(edges_ds, min_count: int = 2, num_buckets: int = 16):
    """Neighborhood link-prediction suite (Liben-Nowell & Kleinberg
    2003; completes the :func:`adamic_adar` family) over the citation
    graph's IN-neighbourhoods. For every pair of documents co-cited by
    at least ``min_count`` distinct sources:

    - ``n_common``       |Γin(a) ∩ Γin(b)| (common neighbours)
    - ``deg_a, deg_b``   distinct in-degrees
    - ``jaccard_micro``  floor(1e6·n / (deg_a + deg_b − n)) — exact
      int64 floordiv AFTER exact integer sums, so the score is
      deterministic under any partial-sum order (the int-cent rule)
    - ``pref_attach``    deg_a · deg_b (preferential attachment)

    Shape: the cocitation wedge engine (pairs pre-counted per
    ``hash(src)`` bucket, summed per pair bucket) plus one
    ``hash(dst)``-bucketed distinct in-degree count and two indicator
    cogroups attaching the degrees to the pair rows — every exchange
    is coarse-bucketed, nothing concentrates on the driver. Candidate
    volume is Σ C(outdeg_s, 2), bounded exactly as in
    :func:`cocitations` (see its scale note)."""

    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(pc.equal(b.column("src"),
                                           b.column("dst"))))

    clean = edges_ds.map_batches(drop_self, batch_format="pyarrow")

    # exact distinct in-degree: all edges of a target share its bucket
    def indeg(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        out = g.groupby("dst", sort=True).size().rename("deg")
        return out.reset_index().rename(columns={"dst": "url"}).astype(
            {"deg": "int64"})

    # materialized: both attach passes consume it (the _edge_degrees
    # pattern) — without this the count exchange would execute twice
    deg = (clean.map_batches(
               lambda t: _pl_bucket(t, ["dst"], num_buckets),
               batch_format="pyarrow")
           .groupby("bucket").map_groups(indeg, batch_format="pandas")
           .materialize())

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        m = g.merge(g, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        out = (m.groupby(["dst_x", "dst_y"], sort=True).size()
               .rename("n").reset_index()
               .rename(columns={"dst_x": "a", "dst_y": "b"}))
        return out.astype({"n": "int64"})

    def close(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], as_index=False, sort=True)["n"]
               .sum())
        out = out[out["n"] >= min_count]
        return pd.DataFrame({
            "a": out["a"].astype("object"),
            "b": out["b"].astype("object"),
            "n_common": out["n"].astype("int64")})

    pairs = (clean
             .map_batches(lambda t: _pl_bucket(t, ["src"], num_buckets),
                          batch_format="pyarrow")
             .groupby("bucket").map_groups(wedge_pairs,
                                           batch_format="pandas")
             .map_batches(lambda t: _pl_bucket(t, ["a", "b"],
                                               num_buckets),
                          batch_format="pyarrow")
             .groupby("bucket").map_groups(close,
                                           batch_format="pandas"))

    def attach(key_col: str, out_col: str):
        """pairs ∪ degree rows → bucketed cogroup on ``key_col`` →
        pairs gain ``out_col`` (in-degree of that endpoint)."""

        def deg_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "k": b.column("url"), "a": pa.nulls(n, pa.string()),
                "b": pa.nulls(n, pa.string()),
                "n_common": pa.nulls(n, pa.int64()),
                "deg_a": pa.nulls(n, pa.int64()),
                "payload": b.column("deg").cast(pa.int64()),
                "side": pa.array([0] * n, pa.int8()),
            })

        def pair_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            dega = (b.column("deg_a") if "deg_a" in b.column_names
                    else pa.nulls(n, pa.int64()))
            return pa.table({
                "k": b.column(key_col), "a": b.column("a"),
                "b": b.column("b"), "n_common": b.column("n_common"),
                "deg_a": dega,
                "payload": pa.nulls(n, pa.int64()),
                "side": pa.array([1] * n, pa.int8()),
            })

        def join(g: pd.DataFrame) -> pd.DataFrame:
            lut = g[g["side"] == 0].set_index("k")["payload"]
            e = g[g["side"] == 1]
            out = pd.DataFrame({
                "a": pd.Series(e["a"].values, dtype="object"),
                "b": pd.Series(e["b"].values, dtype="object"),
                "n_common": pd.Series(e["n_common"].values,
                                      dtype="int64")})
            if out_col != "deg_a":
                out["deg_a"] = pd.Series(e["deg_a"].values).astype(
                    "int64")
            out[out_col] = pd.Series(
                lut.reindex(e["k"]).values).astype("int64")
            return out

        def run(ds):
            both = (ds.map_batches(pair_side, batch_format="pyarrow")
                    .union(deg.map_batches(deg_side,
                                           batch_format="pyarrow"))
                    .map_batches(lambda t: _pl_bucket(t, ["k"],
                                                      num_buckets),
                                 batch_format="pyarrow"))
            return both.groupby("bucket").map_groups(
                join, batch_format="pandas")

        return run

    scored = attach("b", "deg_b")(attach("a", "deg_a")(pairs))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = b.column("n_common")
        da, db = b.column("deg_a"), b.column("deg_b")
        denom = pc.subtract(pc.add(da, db), n)
        return pa.table({
            "a": b.column("a"), "b": b.column("b"), "n_common": n,
            "deg_a": da, "deg_b": db,
            "jaccard_micro": pc.divide(
                pc.multiply(n, pa.scalar(1_000_000, pa.int64())),
                denom),
            "pref_attach": pc.multiply(da, db),
        })

    return scored.map_batches(finish, batch_format="pyarrow")


def _tz_div(num: int, den: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``
    semantics (Python's ``//`` floors, which diverges for negative
    numerators; assortativity is routinely negative on web graphs)."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den > 0) else -q


def assortativity(edges_ds, num_buckets: int = 16):
    """Degree assortativity coefficient (Newman 2002) of the
    undirected citation graph — one summary row:

    - ``n_edges``  canonical distinct undirected edges m
    - ``sum_deg``  S1 = Σ(deg_a + deg_b) over edges
    - ``sum_sq``   S2 = Σ(deg_a² + deg_b²)
    - ``sum_prod`` Sp = Σ 2·deg_a·deg_b (both directions)
    - ``r_micro``  trunc(1e6 · (M·Sp − S1²) / (M·S2 − S1²)), M = 2m —
      the Pearson correlation of degrees at edge endpoints in exact
      integer micro-units (both marginals are identical on the
      symmetrized edge list, so one S1/S2 pair suffices)

    Everything that crosses the cluster is an int64 partial sum; the
    driver holds five scalars and the final floordiv is exact, so the
    row hashes identically to the SQL recompute. Degenerate (regular)
    graphs have an undefined coefficient → ``r_micro`` is null."""
    from ray.data.aggregate import Sum

    wd = _edge_degrees(_canon_edges(edges_ds), num_buckets)

    def partial(b: pa.Table) -> pa.Table:
        da = b.column("deg_a").to_numpy().astype("int64")
        db_ = b.column("deg_b").to_numpy().astype("int64")
        return pa.table({
            "m": pa.array([len(da)], pa.int64()),
            "s1": pa.array([int((da + db_).sum())], pa.int64()),
            "s2": pa.array([int((da * da + db_ * db_).sum())],
                           pa.int64()),
            "sp": pa.array([int((2 * da * db_).sum())], pa.int64()),
        })

    agg = (wd.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("m", alias_name="m"), Sum("s1", alias_name="s1"),
                      Sum("s2", alias_name="s2"),
                      Sum("sp", alias_name="sp")))
    m = int(agg["m"] or 0)
    s1, s2, sp = (int(agg[k] or 0) for k in ("s1", "s2", "sp"))
    bigm = 2 * m
    den = bigm * s2 - s1 * s1
    r = _tz_div(1_000_000 * (bigm * sp - s1 * s1), den) if den else None
    return pd.DataFrame({
        "n_edges": pd.array([m], dtype="int64"),
        "sum_deg": pd.array([s1], dtype="int64"),
        "sum_sq": pd.array([s2], dtype="int64"),
        "sum_prod": pd.array([sp], dtype="int64"),
        "r_micro": pd.array([r], dtype="Int64"),
    })


def personalized_pagerank(edges_ds, seed_host: str,
                          damping: float = 0.85, n_iter: int = 10,
                          num_buckets: int = 16,
                          resume_root: str | None = None):
    """Personalized PageRank (topic-sensitive: Haveliwala 2002) on the
    same BSP tier as :func:`pagerank` — the teleport vector is uniform
    over the SEED SET (here: all nodes on ``seed_host``, the host-
    anchored personalization a web crawl actually uses) instead of
    uniform over all nodes, and the dangling mass is returned to the
    seeds. rank0 = 1/|S| on seeds, 0 elsewhere;
    rank_{k+1}(v) = [v ∈ S]·((1−d)/|S| + d·dangling/|S|) + d·Σ r/deg.

    Identical staging, exchange, crash-atomic resume and
    publish-as-Dataset mechanics as :func:`pagerank`; per-round driver
    state is one scalar. Empty seed set raises (the personalization
    would be the zero vector)."""
    import json as _json

    from ferenda_ray.bsp import publish_dataset
    from ferenda_ray.ops.web import host_of

    root = resume_root or _graph_stage_root()
    marker = os.path.join(root, "_staged.json")
    done = False
    try:
        if resume_root and os.path.exists(marker):
            meta = _json.load(open(marker))
            _check_staged_params(meta, {"num_buckets": num_buckets,
                                        "damping": damping,
                                        "n_iter": n_iter,
                                        "seed_host": seed_host,
                                        "bucket_fn": _bucket_fn()})
            n = meta["n"]
        else:
            if resume_root and os.path.isdir(root):
                shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            n = _stage_graph(edges_ds, root, num_buckets)
            _atomic_write_json({"n": n, "num_buckets": num_buckets,
                                "damping": damping, "n_iter": n_iter,
                                "seed_host": seed_host,
                                "bucket_fn": _bucket_fn()},
                               marker)
        if n == 0:
            done = True
            return rd.from_arrow(pa.table(
                {"url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}))

        from ferenda_ray.util import bucket_keys

        @ray.remote
        def count_seeds(b: int) -> int:
            nd = _nodes_df(root, b)
            if not len(nd):
                return 0
            h = host_of(pa.array(nd["url"], pa.string()))
            return int((np.asarray(h) == seed_host).sum())

        n_s = int(sum(ray.get([count_seeds.remote(b)
                               for b in range(num_buckets)])))
        if n_s == 0:
            raise ValueError(
                f"seed host {seed_host!r} matches no node")

        @ray.remote
        def init_rank(b: int) -> None:
            nd = _nodes_df(root, b)
            if len(nd):
                h = np.asarray(host_of(pa.array(nd["url"], pa.string())))
                nd["rank"] = np.where(h == seed_host, 1.0 / n_s, 0.0)
            else:
                nd["rank"] = np.zeros(0)
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"rank0-{b:05d}.parquet"))

        r_start = (_resume_round(root, num_buckets, n_iter)
                   if resume_root else 0)
        if r_start == 0:
            ray.get([init_rank.remote(b) for b in range(num_buckets)])

        @ray.remote
        def ppr_map(b: int, r: int) -> float:
            rank = pq.read_table(
                os.path.join(root, f"rank{r}-{b:05d}.parquet")).to_pandas()
            edges = _bucket_edges(root, "edges_by_src", b)
            if len(edges):
                j = edges.merge(rank, left_on="src", right_on="url")
                j["c"] = j["rank"] / j["outdeg"]
                part = (j.groupby("dst", sort=True)["c"].sum()
                        .reset_index().rename(columns={"dst": "url"}))
                part["db"] = bucket_keys(part.url.to_numpy(), num_buckets)
                _write_partials(root, f"contrib{r}", b, part, "db")
            return float(rank.loc[rank.outdeg == 0, "rank"].sum())

        @ray.remote
        def ppr_reduce(b: int, r: int, seed_base: float) -> None:
            nd = _nodes_df(root, b)
            partials = _read_partials(root, f"contrib{r}", b)
            if partials is not None:
                got = partials.groupby("url", sort=True)["c"].sum()
                c = got.reindex(nd.url).fillna(0.0).values
            else:
                c = np.zeros(len(nd))
            if len(nd):
                h = np.asarray(host_of(pa.array(nd["url"], pa.string())))
                is_seed = (h == seed_host)
            else:
                is_seed = np.zeros(0, dtype=bool)
            nd["rank"] = np.where(is_seed, seed_base, 0.0) + damping * c
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"rank{r + 1}-{b:05d}.parquet"))

        for r in range(r_start, n_iter):
            dangling = sum(ray.get(
                [ppr_map.remote(b, r) for b in range(num_buckets)]))
            seed_base = ((1.0 - damping) / n_s
                         + damping * dangling / n_s)
            ray.get([ppr_reduce.remote(b, r, seed_base)
                     for b in range(num_buckets)])

        out = publish_dataset(
            root,
            [os.path.join(root, f"rank{n_iter}-{b:05d}.parquet")
             for b in range(num_buckets)],
            "ferenda_graph_ppr", columns=["url", "rank"])
        done = True
        return out
    finally:
        if not resume_root or done:
            shutil.rmtree(root, ignore_errors=True)


def bfs_hops(edges_ds, seed_host: str, num_buckets: int = 16,
             max_rounds: int = 64):
    """Directed BFS hop distance from a seed host — the crawl-frontier
    depth report (how many link hops each page sits from the seed
    domain). Frontier-mail BSP on the stage tier: directed edges
    hive-staged once by ``bucket(src)``; round r mails ``dist+1`` only
    from the nodes SETTLED in round r−1 (the BFS frontier — a node's
    distance is final the first time it is reached, so mail volume is
    Σ outdeg(frontier), not rounds × edges); the reduce wave appends
    newly reached nodes. Per-bucket state holds ONLY reached nodes
    ``(url, dist)`` — unreached pages never materialize anywhere.
    Converges in O(eccentricity) rounds and raises if ``max_rounds``
    is exhausted (never returns silently-truncated distances).
    Returns a lazy ``(url, dist)`` Dataset of reached nodes."""
    from ferenda_ray.bsp import publish_dataset, read_hive_bucket
    from ferenda_ray.ops.web import host_of
    from ferenda_ray.util import bucket_keys

    empty = pa.table({"url": pa.array([], pa.string()),
                      "dist": pa.array([], pa.int64())})
    root = _graph_stage_root()
    try:
        os.makedirs(root, exist_ok=True)

        def tag(b: pa.Table) -> pa.Table:
            return pa.table({
                "src": b.column("src"), "dst": b.column("dst"),
                "sb": pa.array(bucket_keys(b.column("src"),
                                           num_buckets), pa.int32()),
            })

        def endpoints(b: pa.Table) -> pa.Table:
            u = pa.concat_arrays([
                b.column("src").combine_chunks().cast(pa.string()),
                b.column("dst").combine_chunks().cast(pa.string())])
            return pa.table({
                "url": u,
                "nb": pa.array(bucket_keys(u, num_buckets), pa.int32()),
            })

        staged = edges_ds.map_batches(tag, batch_format="pyarrow"
                                      ).materialize()
        if staged.count() == 0:
            return rd.from_arrow(empty)
        staged.write_parquet(os.path.join(root, "diredges"),
                             partition_cols=["sb"])
        (staged.select_columns(["src", "dst"])
         .map_batches(endpoints, batch_format="pyarrow")
         .write_parquet(os.path.join(root, "nodes_raw"),
                        partition_cols=["nb"]))

        @ray.remote
        def init_dist(b: int) -> int:
            t = read_hive_bucket(root, "nodes_raw", "nb", b, ["url"])
            if t is None:
                seeds = pd.Series([], dtype="object")
            else:
                urls = t.to_pandas()["url"].drop_duplicates()
                h = np.asarray(host_of(pa.array(urls, pa.string())))
                seeds = urls[h == seed_host].sort_values()
            nd = pd.DataFrame({
                "url": seeds.to_numpy(),
                "dist": np.zeros(len(seeds), dtype="int64")})
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"dist0-{b:05d}.parquet"))
            return len(nd)

        n_seed = sum(ray.get([init_dist.remote(b)
                              for b in range(num_buckets)]))
        if n_seed == 0:
            raise ValueError(
                f"seed host {seed_host!r} matches no node")

        @ray.remote
        def bfs_map(b: int, r: int) -> None:
            dist = pq.read_table(
                os.path.join(root, f"dist{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            frontier = dist[dist["dist"] == r - 1]
            if not len(frontier):
                return
            he = read_hive_bucket(root, "diredges", "sb", b,
                                  ["src", "dst"])
            if he is None:
                return
            j = he.to_pandas().merge(frontier, left_on="src",
                                     right_on="url")
            if not len(j):
                return
            part = pd.DataFrame(
                {"url": j["dst"].drop_duplicates().sort_values()
                 .to_numpy()})
            part["vb"] = bucket_keys(part.url.to_numpy(), num_buckets)
            _write_partials(root, f"reach{r}", b, part, "vb")

        @ray.remote
        def bfs_reduce(b: int, r: int) -> int:
            prev = pq.read_table(
                os.path.join(root, f"dist{r - 1}-{b:05d}.parquet")
            ).to_pandas()
            cand = _read_partials(root, f"reach{r}", b)
            if cand is None:
                nd, new_n = prev, 0
            else:
                fresh = (cand["url"].drop_duplicates().sort_values())
                fresh = fresh[~fresh.isin(prev["url"])]
                nd = pd.concat([prev, pd.DataFrame({
                    "url": fresh.to_numpy(),
                    "dist": np.full(len(fresh), r, dtype="int64")})],
                    ignore_index=True)
                new_n = len(fresh)
            _atomic_write_table(
                pa.Table.from_pandas(nd, preserve_index=False),
                os.path.join(root, f"dist{r}-{b:05d}.parquet"))
            return new_n

        final = 0
        for r in range(1, max_rounds + 1):
            ray.get([bfs_map.remote(b, r) for b in range(num_buckets)])
            new_n = sum(ray.get(
                [bfs_reduce.remote(b, r) for b in range(num_buckets)]))
            final = r
            if new_n == 0:
                break
        else:
            raise RuntimeError(
                f"bfs_hops did not converge in {max_rounds} rounds")

        return publish_dataset(
            root,
            [os.path.join(root, f"dist{final}-{b:05d}.parquet")
             for b in range(num_buckets)],
            "ferenda_graph_bfs", columns=["url", "dist"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def seed_closeness(edges_ds, seed_host: str, num_buckets: int = 16,
                   max_rounds: int = 64):
    """Harmonic closeness of the seed host over the directed citation
    graph: Σ 1/dist over every node reachable from the seed set (the
    standard seed-influence summary a crawl planner reads next to the
    BFS depth report). Exact integer micro-units — each reached node
    contributes ``1_000_000 // dist`` (DuckDB ``//`` parity) — so the
    single summary row is bit-stable at any parallelism. Driver state
    is three scalars; everything else is the :func:`bfs_hops` BSP plus
    one partial-aggregate pass."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    hops = bfs_hops(edges_ds, seed_host, num_buckets=num_buckets,
                    max_rounds=max_rounds)

    def partials(b: pa.Table) -> pa.Table:
        d = b.column("dist")
        pos = pc.filter(d, pc.greater(d, 0))
        h = (pc.sum(pc.divide(1_000_000, pos)).as_py() or 0
             if len(pos) else 0)
        return pa.table({
            "h": pa.array([h], pa.int64()),
            "n": pa.array([len(pos)], pa.int64()),
            "m": pa.array([pc.max(d).as_py() if len(d) else 0],
                          pa.int64()),
        })

    agg = (hops.map_batches(partials, batch_format="pyarrow")
           .aggregate(Sum("h"), Sum("n"), Max("m")))
    return pd.DataFrame({
        "harmonic_micro": [int(agg.get("sum(h)") or 0)],
        "n_reached": [int(agg.get("sum(n)") or 0)],
        "max_dist": [int(agg.get("max(m)") or 0)],
    })
