"""Similarity search over the ``embeddings`` table (task brief:
approximate-nearest-neighbor as a first-class component).

* :func:`bruteforce_topk` — exact cosine top-k: each batch of vectors is
  scored against a broadcast query vector with one numpy matmul
  (float64), global top-k via ``sort().limit()``. This is the baseline
  and the oracle-checked path (DuckDB ``list_cosine_similarity``).
* :func:`ivf_topk` — the scale path: a coarse IVF index (k-means
  centroids trained DISTRIBUTED via per-batch partial sums), probe the
  ``nprobe`` nearest lists only. Each batch computes its OWN list
  assignments from the broadcast centroids (k×dim — constant-size),
  so no per-vector assignment map is ever built or broadcast.
  Approximate → rows-only check, plus a recall-vs-bruteforce test.
* :func:`knn_classify` — majority label among the k nearest (a simple
  consumer of the same kernel).
* :func:`kmeans` — distributed Lloyd's: per iteration ONE map_batches
  emits per-batch partial sums against broadcast centroids; the driver
  reduces k×dim partials (constant-size driver state).

The broadcast-query + per-batch-matmul shape is exactly what the entity
linker's ANN scorer uses (stages/link.py); at 100 TB the broadcast side
becomes an index per block of queries, the Dataset side streams. The
driver never loads the embedding matrix (round 1's ``_load_matrix``
pulled the whole table onto the driver for IVF/kmeans/knn — removed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ferenda_ray.util import list_col_matrix


def _embeddings(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """One query row via parquet row filter — never the whole table."""
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "==", vec_id)])
    return list_col_matrix(tab.column("embedding"))[0]


def bruteforce_topk(sf_dir: str, vec_id: int = 0, k: int = 10):
    """Exact cosine top-k against the query vector (vec_id's embedding),
    excluding the query row itself. Scores rounded to 6 decimals for
    cross-engine comparability."""
    q = query_vector(sf_dir, vec_id)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        qv = fetch(q_ref)
        vm = _normalize(list_col_matrix(b.column("embedding")))
        sims = vm @ qv
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "cos_sim": pa.array(np.round(sims, 6), pa.float64()),
            }
        )

    ds = _embeddings(sf_dir).map_batches(score, batch_format="pyarrow",
                                         batch_size=4096)

    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b.column("vec_id"), pa.scalar(vec_id)))

    return (
        ds.map_batches(drop_self, batch_format="pyarrow")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


ANN_TOPK_SQL = """
SELECT e.vec_id,
       round(list_cosine_similarity(
           e.embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)
       ), 6) AS cos_sim
FROM embeddings e
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


# kNN-classify recomputed in SQL: same rounded-cosine top-k cutoff
# (ties broken by vec_id) + majority vote with min-label tie rule
KNN_CLASSIFY_SQL = """
WITH scored AS (
    SELECT e.vec_id,
           round(list_cosine_similarity(
               e.embedding,
               (SELECT embedding FROM embeddings WHERE vec_id = 0)
           ), 6) AS cs
    FROM embeddings e WHERE e.vec_id <> 0
), top AS (
    SELECT vec_id FROM scored ORDER BY cs DESC, vec_id ASC LIMIT 15
), votes AS (
    SELECT l.label, count(*) AS n
    FROM top t JOIN embeddings l USING (vec_id) GROUP BY l.label
)
SELECT CAST(0 AS BIGINT) AS vec_id,
       CAST(min(label) AS BIGINT) AS pred_label,
       CAST(min(n) AS BIGINT) AS n_votes
FROM (SELECT label, n, max(n) OVER () AS mx FROM votes)
WHERE n = mx
"""


def _centroid_partials(ds, cents: np.ndarray, *, normalize: bool):
    """ONE distributed pass: per-batch assignment against broadcast
    centroids → (k, dim) partial sums + counts; driver reduces
    constant-size partials."""
    c_ref = ray.put(cents)

    def partial(b: pa.Table, c_ref=c_ref) -> pa.Table:
        from ferenda_ray.state import fetch

        c = fetch(c_ref)
        m = list_col_matrix(b.column("embedding"))
        if normalize:
            m = _normalize(m)
        assign = (m @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        counts = np.zeros(len(c), dtype=np.int64)
        np.add.at(sums, assign, m)
        np.add.at(counts, assign, 1)
        return pa.table({
            "sums": pa.array([sums.ravel().tolist()], pa.list_(pa.float64())),
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    k, dim = cents.shape
    sums = np.sum([np.asarray(p["sums"]).reshape(k, dim) for p in parts],
                  axis=0)
    counts = np.sum([np.asarray(p["counts"]) for p in parts], axis=0)
    return sums, counts


def build_ivf_centroids(sf_dir: str, n_iter: int = 5) -> np.ndarray:
    """Coarse IVF centroids trained DISTRIBUTED: init = per-label mean
    (one grouped partial-sum pass over broadcast-nothing), then Lloyd
    iterations via :func:`_centroid_partials`. Driver state = the
    (k, dim) centroid matrix only."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    # init: per-label mean of normalized vectors (distributed partials)
    def label_partial(b: pa.Table) -> pa.Table:
        m = _normalize(list_col_matrix(b.column("embedding")))
        labs = b.column("label").to_numpy(zero_copy_only=False)
        uniq = np.unique(labs)
        rows = {"label": [], "sums": [], "n": []}
        for l in uniq:
            sel = m[labs == l]
            rows["label"].append(int(l))
            rows["sums"].append(sel.sum(axis=0).tolist())
            rows["n"].append(int(len(sel)))
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "sums": pa.array(rows["sums"], pa.list_(pa.float64())),
            "n": pa.array(rows["n"], pa.int64()),
        })

    parts = (ds.map_batches(label_partial, batch_format="pyarrow")
             .to_pandas())
    agg: dict[int, tuple[np.ndarray, int]] = {}
    for l, s, n in zip(parts["label"], parts["sums"], parts["n"]):
        s = np.asarray(s, dtype=np.float64)
        if l in agg:
            agg[l] = (agg[l][0] + s, agg[l][1] + n)
        else:
            agg[l] = (s, n)
    cents = np.stack([agg[l][0] / agg[l][1] for l in sorted(agg)])
    cents = _normalize(cents)

    emb = ds.select_columns(["embedding"]).materialize()
    for _ in range(n_iter):
        sums, counts = _centroid_partials(emb, cents, normalize=True)
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz][:, None]
        cents = _normalize(cents)
    return cents


def ivf_topk(sf_dir: str, vec_id: int = 0, k: int = 10, nprobe: int = 5):
    """Approximate top-k: score only vectors whose IVF list is among the
    ``nprobe`` closest centroids to the query. Each batch computes its
    OWN assignments from the broadcast (k, dim) centroids — no
    per-vector assignment map exists anywhere (round 1 broadcast an
    id→list dict of the whole table)."""
    cents = build_ivf_centroids(sf_dir)
    q = query_vector(sf_dir, vec_id)
    qn = q / (np.linalg.norm(q) or 1.0)
    probed = np.zeros(len(cents), dtype=bool)
    probed[np.argsort(-(cents @ qn))[:nprobe]] = True
    state_ref = ray.put((qn, cents, probed))

    def score(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        qv, c, pr = fetch(state_ref)
        vids = b.column("vec_id").to_numpy(zero_copy_only=False)
        vm = _normalize(list_col_matrix(b.column("embedding")))
        assign = (vm @ c.T).argmax(axis=1)
        keep = pr[assign] & (vids != vec_id)
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        sims = vm[keep] @ qv
        return pa.table(
            {
                "vec_id": pa.array(vids[keep], pa.int64()),
                "cos_sim": pa.array(np.round(sims, 6), pa.float64()),
            }
        )

    return (
        _embeddings(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def _ivf_train_parts(n_iter: int = 5) -> tuple[list[str], str]:
    """Shared CTE chain unrolling :func:`build_ivf_centroids` in SQL
    (per-label-mean init → ``n_iter`` spherical Lloyd rounds over
    L2-normalized vectors, empty clusters keeping their previous
    centroid, every round re-normalized). Returns (parts, final
    centroid CTE name); used by both the IVF top-k and the IVF
    near-dup oracles."""
    M = "AS MATERIALIZED"
    parts = [
        f"comp {M} (SELECT vec_id, label, "
        "unnest(range(1, len(embedding) + 1)) AS i, "
        "unnest(embedding::DOUBLE[]) AS x FROM embeddings)",
        # L2-normalized components (zero vectors normalized by 1)
        f"vn {M} (SELECT vec_id, CASE WHEN sqrt(sum(x * x)) = 0 THEN 1 "
        "ELSE sqrt(sum(x * x)) END AS nrm FROM comp GROUP BY vec_id)",
        f"compn {M} (SELECT c.vec_id, c.label, c.i, c.x / v.nrm AS xn "
        "FROM comp c JOIN vn v USING (vec_id))",
        # init: per-label mean of normalized vectors, normalized;
        # cluster index = rank of sorted label
        f"lmap {M} (SELECT label, dense_rank() OVER (ORDER BY label) - 1 "
        "AS cluster FROM (SELECT DISTINCT label FROM embeddings))",
        f"craw {M} (SELECT l.cluster, c.i, avg(c.xn) AS val "
        "FROM compn c JOIN lmap l USING (label) GROUP BY l.cluster, c.i)",
        f"cn0 {M} (SELECT cluster, CASE WHEN sqrt(sum(val * val)) = 0 "
        "THEN 1 ELSE sqrt(sum(val * val)) END AS nrm FROM craw "
        "GROUP BY cluster)",
        f"c0 {M} (SELECT c.cluster, c.i, c.val / n.nrm AS val "
        "FROM craw c JOIN cn0 n USING (cluster))",
    ]
    for r in range(n_iter):
        parts.append(
            f"s{r} {M} (SELECT c.vec_id, k.cluster, "
            "sum(c.xn * k.val) AS score "
            f"FROM compn c JOIN c{r} k USING (i) "
            "GROUP BY c.vec_id, k.cluster)")
        parts.append(
            f"a{r} {M} (SELECT vec_id, cluster FROM ("
            "SELECT vec_id, cluster, row_number() OVER ("
            "PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn "
            f"FROM s{r}) WHERE rn = 1)")
        parts.append(
            f"u{r} {M} (SELECT c.cluster, c.i, "
            "coalesce(m.val, c.val) AS val "
            f"FROM c{r} c LEFT JOIN ("
            f"SELECT a.cluster, cn.i, avg(cn.xn) AS val "
            f"FROM a{r} a JOIN compn cn USING (vec_id) "
            "GROUP BY a.cluster, cn.i) m "
            "ON m.cluster = c.cluster AND m.i = c.i)")
        parts.append(
            f"un{r} {M} (SELECT cluster, CASE WHEN sqrt(sum(val * val)) "
            "= 0 THEN 1 ELSE sqrt(sum(val * val)) END AS nrm "
            f"FROM u{r} GROUP BY cluster)")
        parts.append(
            f"c{r + 1} {M} (SELECT u.cluster, u.i, u.val / n.nrm AS val "
            f"FROM u{r} u JOIN un{r} n USING (cluster))")
    return parts, f"c{n_iter}"


def _ivf_topk_sql(n_iter: int = 5, nprobe: int = 5, k: int = 10,
                  vec_id: int = 0) -> str:
    """:func:`ivf_topk` unrolled in SQL — centroid training
    (:func:`_ivf_train_parts`), probe-list selection (top ``nprobe``
    centroids by dot with the normalized query) and the final exact
    cosine over vectors assigned to probed lists. The IVF result is
    approximate w.r.t. brute force but DETERMINISTIC given the
    algorithm — this recomputes the same algorithm independently, so
    it is an exact oracle, not a recall bound."""
    M = "AS MATERIALIZED"
    parts, C = _ivf_train_parts(n_iter)
    parts += [
        # normalized query vector
        f"q {M} (SELECT i, xn FROM compn WHERE vec_id = {vec_id})",
        # probe the nprobe closest centroids to the query
        f"probe {M} (SELECT cluster FROM ("
        f"SELECT k.cluster, sum(k.val * q.xn) AS score "
        f"FROM {C} k JOIN q USING (i) GROUP BY k.cluster "
        f"ORDER BY score DESC, cluster ASC LIMIT {nprobe}))",
        # final assignment of every vector against the trained centroids
        f"sf {M} (SELECT c.vec_id, k.cluster, sum(c.xn * k.val) AS score "
        f"FROM compn c JOIN {C} k USING (i) GROUP BY c.vec_id, k.cluster)",
        f"af {M} (SELECT vec_id, cluster FROM ("
        "SELECT vec_id, cluster, row_number() OVER ("
        "PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn "
        "FROM sf) WHERE rn = 1)",
    ]
    return ("WITH " + ",\n".join(parts) + f"""
SELECT c.vec_id, round(sum(c.xn * q.xn), 6) AS cos_sim
FROM compn c JOIN q USING (i)
JOIN af ON af.vec_id = c.vec_id
WHERE af.cluster IN (SELECT cluster FROM probe) AND c.vec_id <> {vec_id}
GROUP BY c.vec_id
ORDER BY cos_sim DESC, c.vec_id ASC LIMIT {k}""")


def _ivf_near_dups_sql(threshold: float = 0.4, nprobe: int = 3,
                       n_iter: int = 5) -> str:
    """``dedup.embedding_near_dups_ivf`` unrolled in SQL: the same
    trained centroids (:func:`_ivf_train_parts`), the same multi-probe
    assignment (every vector joins its ``nprobe`` best lists, ties by
    cluster ASC), candidate pairs = vectors sharing a list, exact
    cosine on candidates only, inclusion decided on the 4-dp-rounded
    value exactly as the Ray side does. Deterministic given the
    algorithm → exact oracle of the approximate operator."""
    M = "AS MATERIALIZED"
    parts, C = _ivf_train_parts(n_iter)
    parts += [
        f"sf {M} (SELECT c.vec_id, k.cluster, sum(c.xn * k.val) AS score "
        f"FROM compn c JOIN {C} k USING (i) GROUP BY c.vec_id, k.cluster)",
        f"ap {M} (SELECT vec_id, cluster FROM ("
        "SELECT vec_id, cluster, row_number() OVER ("
        "PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn "
        f"FROM sf) WHERE rn <= {nprobe})",
        f"cand {M} (SELECT DISTINCT a1.vec_id AS va, a2.vec_id AS vb "
        "FROM ap a1 JOIN ap a2 USING (cluster) "
        "WHERE a1.vec_id < a2.vec_id)",
    ]
    return ("WITH " + ",\n".join(parts) + f"""
SELECT cd.va AS vec_a, cd.vb AS vec_b,
       round(sum(ca.xn * cb.xn), 4) AS cos_sim
FROM cand cd
JOIN compn ca ON ca.vec_id = cd.va
JOIN compn cb ON cb.vec_id = cd.vb AND cb.i = ca.i
GROUP BY cd.va, cd.vb
HAVING round(sum(ca.xn * cb.xn), 4) >= {threshold}""")


IVF_NEAR_DUPS_SQL = _ivf_near_dups_sql()


def knn_classify(sf_dir: str, vec_id: int = 0, k: int = 15):
    """Majority label among the k nearest neighbours of vec_id. Labels
    are fetched by row filter for the k result ids only."""
    import pyarrow.parquet as pq

    top = bruteforce_topk(sf_dir, vec_id, k).to_pandas()
    lab = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
        filters=[("vec_id", "in", top.vec_id.tolist())]).to_pandas()
    merged = top.merge(lab, on="vec_id")
    counts = merged.label.value_counts()
    best = counts[counts == counts.max()].index.min()  # deterministic tie
    return pd.DataFrame({"vec_id": [vec_id], "pred_label": [int(best)],
                         "n_votes": [int(counts.max())]})


def _kmeans_sql(k: int = 8, n_iter: int = 5) -> str:
    """Lloyd's k-means unrolled to ``n_iter`` materialized-CTE rounds —
    the exact semantics of :func:`kmeans` (same seeding: the k smallest
    vec_ids; same assignment rule: argmax of x·c − ‖c‖²/2 with
    first-max = smallest cluster index on ties; empty clusters keep
    their previous centroid). Floating-point sums differ from numpy
    only in association order (~1e-16 relative); the integer cluster
    assignment is robust to that unless two centroids are genuinely
    equidistant. Same trick as ``kg_oracles._pagerank_sql``."""
    M = "AS MATERIALIZED"
    parts = [
        # (vec_id, i, x) vector components, float32 → DOUBLE (exact)
        f"comp {M} (SELECT vec_id, "
        "unnest(range(1, len(embedding) + 1)) AS i, "
        "unnest(embedding::DOUBLE[]) AS x FROM embeddings)",
        f"seeds {M} (SELECT vec_id, dense_rank() OVER (ORDER BY vec_id) "
        f"- 1 AS cluster FROM (SELECT vec_id FROM embeddings "
        f"ORDER BY vec_id LIMIT {k}))",
        f"c0 {M} (SELECT s.cluster, comp.i, comp.x AS val "
        "FROM comp JOIN seeds s USING (vec_id))",
    ]
    for r in range(n_iter):
        parts.append(
            f"s{r} {M} (SELECT comp.vec_id, c.cluster, "
            "sum(comp.x * c.val) - 0.5 * sum(c.val * c.val) AS score "
            f"FROM comp JOIN c{r} c USING (i) "
            "GROUP BY comp.vec_id, c.cluster)")
        parts.append(
            f"a{r} {M} (SELECT vec_id, cluster FROM ("
            "SELECT vec_id, cluster, row_number() OVER ("
            "PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn "
            f"FROM s{r}) WHERE rn = 1)")
        parts.append(
            f"c{r + 1} {M} (SELECT c.cluster, c.i, "
            "coalesce(m.val, c.val) AS val "
            f"FROM c{r} c LEFT JOIN ("
            f"SELECT a.cluster, comp.i, avg(comp.x) AS val "
            f"FROM a{r} a JOIN comp USING (vec_id) "
            "GROUP BY a.cluster, comp.i) m "
            "ON m.cluster = c.cluster AND m.i = c.i)")
    # final assignment against the post-update centroids
    parts.append(
        f"sf {M} (SELECT comp.vec_id, c.cluster, "
        "sum(comp.x * c.val) - 0.5 * sum(c.val * c.val) AS score "
        f"FROM comp JOIN c{n_iter} c USING (i) "
        "GROUP BY comp.vec_id, c.cluster)")
    return ("WITH " + ",\n".join(parts) + """
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM (
    SELECT vec_id, cluster, row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn
    FROM sf) WHERE rn = 1""")


def kmeans(sf_dir: str, k: int = 8, n_iter: int = 5):
    """Distributed Lloyd's k-means over the embeddings table — the
    engine's iterative-algorithm pattern (like pagerank): per iteration,
    ONE map_batches emits per-batch partial sums against broadcast
    centroids, the driver reduces k×dim partials. Deterministic:
    centroids seeded from the k smallest vec_ids (fetched by row
    filter, not a full-table driver read). Returns (vec_id, cluster)
    assignments."""
    import pyarrow.parquet as pq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # seed rows only: k smallest vec_ids via a narrow id read + filter
    ids = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id"]).column("vec_id").to_numpy()
    seed_ids = np.sort(ids)[:k].tolist()
    seed = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "in", seed_ids)])
    order = np.argsort(seed.column("vec_id").to_numpy())
    centroids = list_col_matrix(seed.column("embedding"))[order].copy()

    # kmeans assigns by EUCLIDEAN distance; with argmax-dot partials we
    # use the identity argmin ‖x−c‖² = argmax (x·c − ‖c‖²/2)
    emb = ds.select_columns(["embedding"]).materialize()
    for _ in range(n_iter):
        c_ref = ray.put(centroids)

        def partial(b: pa.Table, c_ref=c_ref) -> pa.Table:
            from ferenda_ray.state import fetch

            c = fetch(c_ref)
            m = list_col_matrix(b.column("embedding"))
            d = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
            assign = d.argmax(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table({
                "sums": pa.array([sums.ravel().tolist()],
                                 pa.list_(pa.float64())),
                "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            })

        parts = emb.map_batches(partial, batch_format="pyarrow").take_all()
        dim = centroids.shape[1]
        sums = np.sum([np.asarray(p["sums"]).reshape(k, dim) for p in parts],
                      axis=0)
        counts = np.sum([np.asarray(p["counts"]) for p in parts], axis=0)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz][:, None]

    c_ref = ray.put(centroids)

    def assign_batch(b: pa.Table, c_ref=c_ref) -> pa.Table:
        from ferenda_ray.state import fetch

        c = fetch(c_ref)
        m = list_col_matrix(b.column("embedding"))
        d = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        return pa.table({
            "vec_id": b.column("vec_id"),
            "cluster": pa.array(d.argmax(axis=1).astype(np.int32),
                                pa.int32()),
        })

    return ds.map_batches(assign_batch, batch_format="pyarrow")


KMEANS_SQL = _kmeans_sql()
IVF_TOPK_SQL = _ivf_topk_sql()
