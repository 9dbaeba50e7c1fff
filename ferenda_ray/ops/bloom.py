"""Bloom-filter semi-join — the shuffle-free scale path for
"keep rows of A whose key appears in B" when B's key set is too large
to broadcast exactly but its *bitset* fits in memory.

Pattern (all mergeable-summary, like the HLL in ``ops/sketch.py``):

1. build — per-batch Bloom bitsets over B's key column inside
   ``map_batches`` (k independent SplitMix64-derived probes), OR-merged
   with bounded fan-in; one ``m/8``-byte row per block crosses the wire.
2. prefilter — broadcast the final bitset via ``ray.put``; filter A
   per-batch.  No false negatives, so survivors ⊇ the true semi-join;
   FPR ≈ (1−e^{−kn/m})^k (~0.8% at m=2^20, k=7, n=65k keys).
3. confirm — the surviving minority is checked exactly with a bucketed
   indicator cogroup (per-batch DISTINCT key partials from B union'd
   with the survivors, one narrow shuffle keyed by hash(key) — the same
   shape as ``ops/relational.customers_without_events``); the driver
   never materializes B's key set.

Versus shuffling both sides, only B's distinct keys and the final
bitset move.  Exact end result → DuckDB EXISTS oracle.

Reference parity: the reference's closest operation is the in-memory
set membership of ``lookup_resource`` (``documentrepository.py``; see
COVERAGE §2.3 ST1); the Bloom tier is a beyond-reference scale
addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ferenda_ray.ops.sketch import _splitmix64

BLOOM_M = 1 << 20  # bits (128 KiB)
BLOOM_K = 7


def _probes(keys: np.ndarray, m: int = BLOOM_M, k: int = BLOOM_K
            ) -> np.ndarray:
    """(n, k) array of bit positions: k derived hashes per key via
    SplitMix64 re-mixing (double hashing h1 + i·h2)."""
    h1 = _splitmix64(keys.astype(np.uint64))
    h2 = _splitmix64(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m))


def bloom_build(ds: rd.Dataset, column: str, m: int = BLOOM_M,
                k: int = BLOOM_K) -> np.ndarray:
    """OR-mergeable Bloom bitset over ``ds[column]`` (packed uint8)."""

    def partial(b: pa.Table) -> pa.Table:
        keys = np.asarray(b.column(column).to_numpy(zero_copy_only=False))
        bits = np.zeros(m, np.bool_)
        if len(keys):
            bits[_probes(keys, m, k).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    def merge(b: pa.Table) -> pa.Table:
        stacked = np.stack([np.frombuffer(r.as_py(), np.uint8)
                            for r in b.column("bits")])
        return pa.table({"bits": pa.array([np.bitwise_or.reduce(stacked)
                                           .tobytes()], pa.binary())})

    rows = (ds.select_columns([column])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(merge, batch_format="pyarrow", batch_size=1024)
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None)
            .take_all())
    return np.frombuffer(rows[0]["bits"], np.uint8)


def bloom_contains(packed: np.ndarray, keys: np.ndarray,
                   m: int = BLOOM_M, k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership test (no false negatives)."""
    if len(keys) == 0:
        return np.zeros(0, np.bool_)
    bits = np.unpackbits(packed)
    return bits[_probes(keys, m, k)].all(axis=1)


def customers_with_events(sf_dir: str):
    """Semi-join: customers having ≥1 event, via Bloom prefilter +
    bucketed exact confirm (module doc).  Output (c_custkey, c_name)
    sorted.  The Bloom pass shrinks the customer side BEFORE the
    confirm shuffle; the confirm is an indicator cogroup over per-batch
    DISTINCT event keys — no driver-side key set at any size."""
    import pandas as pd

    from ferenda_ray.util import bucket_ints

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])
    packed = bloom_build(events, "user_id")
    packed_ref = ray.put(packed)

    def prefilter(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        pk = fetch(packed_ref)
        keys = np.asarray(b.column("c_custkey").to_numpy(
            zero_copy_only=False))
        return b.filter(pa.array(bloom_contains(pk, keys)))

    def cust_side(b: pa.Table) -> pa.Table:
        key = b.column("c_custkey")
        return pa.table({
            "key": key,
            "c_name": b.column("c_name"),
            "side": pa.array([0] * len(key), pa.int8()),
            "bucket": pa.array(
                bucket_ints(key.to_numpy(zero_copy_only=False), 16),
                pa.int32()),
        })

    def event_side(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uids = pc.unique(b.column("user_id"))
        return pa.table({
            "key": uids,
            "c_name": pa.array([""] * len(uids), pa.string()),
            "side": pa.array([1] * len(uids), pa.int8()),
            "bucket": pa.array(
                bucket_ints(uids.to_numpy(zero_copy_only=False), 16),
                pa.int32()),
        })

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        seen = set(g[g.side == 1].key)
        out = g[(g.side == 0) & g.key.isin(seen)]
        out = out.rename(columns={"key": "c_custkey"})
        return out[["c_custkey", "c_name"]]

    survivors = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
                 .map_batches(prefilter, batch_format="pyarrow"))
    return (survivors.map_batches(cust_side, batch_format="pyarrow")
            .union(events.map_batches(event_side, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(semi, batch_format="pandas")
            .sort("c_custkey"))


CUSTOMERS_WITH_EVENTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
ORDER BY c_custkey
"""
