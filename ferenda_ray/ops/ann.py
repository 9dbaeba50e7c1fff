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
