"""Similarity search over the ``embeddings`` table (task brief:
approximate-nearest-neighbor as a first-class component).

* :func:`bruteforce_topk` — exact cosine top-k: each batch of vectors is
  scored against a broadcast query matrix with one numpy matmul
  (float64), global top-k via ``sort().limit()``. This is the baseline
  and the oracle-checked path (DuckDB ``list_cosine_similarity``).
* :func:`ivf_topk` — the scale path: a coarse IVF index (centroids from
  a k-means-lite pass, here seeded by the table's ``label`` partitions),
  probe the ``nprobe`` nearest lists only. Approximate → rows-only
  check, plus a recall-vs-bruteforce test in tests/.
* :func:`knn_classify` — majority label among the k nearest (a simple
  consumer of the same kernel).

The broadcast-query + per-batch-matmul shape is exactly what the entity
linker's ANN scorer uses (stages/link.py); at 100 TB the broadcast side
becomes an index per block of queries, the Dataset side streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _embeddings(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _load_matrix(sf_dir: str):
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.array(tab.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    ids, mat = _load_matrix(sf_dir)
    return mat[ids == vec_id][0]


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
        vm = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        vm = _normalize(vm)
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


def build_ivf(sf_dir: str, n_iter: int = 5):
    """Coarse IVF index: centroids refined by a few Lloyd iterations from
    the label-partition means (driver-side; the matrix is the SMALL
    broadcast side). Returns (centroids, assignment array, ids, matn)."""
    ids, mat = _load_matrix(sf_dir)
    matn = _normalize(mat)
    import pyarrow.parquet as pq

    labels = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["label"])
        .column("label").to_pylist()
    )
    cents = np.stack([matn[labels == l].mean(axis=0)
                      for l in np.unique(labels)])
    cents = _normalize(cents)
    for _ in range(n_iter):
        assign = (matn @ cents.T).argmax(axis=1)
        for c in range(cents.shape[0]):
            members = matn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    assign = (matn @ cents.T).argmax(axis=1)
    return cents, assign, ids, matn


def ivf_topk(sf_dir: str, vec_id: int = 0, k: int = 10, nprobe: int = 5):
    """Approximate top-k: score only vectors whose IVF list is among the
    ``nprobe`` closest centroids to the query. Distributed shape: the
    probe-list filter runs inside map_batches against broadcast
    (assignments, probed-set); scoring identical to bruteforce."""
    cents, assign, ids, matn = build_ivf(sf_dir)
    q = query_vector(sf_dir, vec_id)
    qn = q / (np.linalg.norm(q) or 1.0)
    probed = set(np.argsort(-(cents @ qn))[:nprobe].tolist())
    id2list = dict(zip(ids.tolist(), assign.tolist()))
    state_ref = ray.put((qn, id2list, probed))

    def score(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        qv, lists, pr = fetch(state_ref)
        vids = b.column("vec_id").to_pylist()
        keep = [i for i, v in enumerate(vids) if lists[v] in pr and v != vec_id]
        if not keep:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        sub = b.take(keep)
        vm = _normalize(np.array(sub.column("embedding").to_pylist(),
                                 dtype=np.float64))
        return pa.table(
            {
                "vec_id": sub.column("vec_id"),
                "cos_sim": pa.array(np.round(vm @ qv, 6), pa.float64()),
            }
        )

    return (
        _embeddings(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
    )


def knn_classify(sf_dir: str, vec_id: int = 0, k: int = 15):
    """Majority label among the k nearest neighbours of vec_id."""
    top = bruteforce_topk(sf_dir, vec_id, k).to_pandas()
    import pyarrow.parquet as pq

    lab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
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
    centroids seeded from the first k vectors (sorted by vec_id).
    Returns (vec_id, cluster) assignments."""
    import pandas as pd

    import ray

    ds = _embeddings(sf_dir)
    ids, mat = _load_matrix(sf_dir)
    order = np.argsort(ids)
    centroids = mat[order[:k]].astype(np.float64).copy()

    for _ in range(n_iter):
        c_ref = ray.put(centroids)

        def partial(b, c_ref=c_ref):
            from ferenda_ray.state import fetch

            c = fetch(c_ref)
            m = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in b["embedding"]])
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return {"sums": sums[None, :, :], "counts": counts[None, :]}

        parts = ds.map_batches(partial, batch_format="numpy").take_all()
        sums = np.sum([p["sums"] for p in parts], axis=0)
        counts = np.sum([p["counts"] for p in parts], axis=0)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz][:, None]

    c_ref = ray.put(centroids)

    def assign_batch(b, c_ref=c_ref):
        from ferenda_ray.state import fetch

        c = fetch(c_ref)
        m = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in b["embedding"]])
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return {"vec_id": b["vec_id"],
                "cluster": d.argmin(axis=1).astype(np.int32)}

    return ds.map_batches(assign_batch, batch_format="numpy")
