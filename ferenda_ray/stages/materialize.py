"""Stage S5 — exact triple dedup + partitioned Parquet materialize with
per-partition lineage manifests and checkpoint-resume.

Reference semantics rebuilt: the distilled triple set has SET semantics
(an rdflib Graph; union of per-doc graphs → ``dump.nt``,
``decorators.py:211``, ``documentrepository.py:1741-1811``) and the
reference's bulk-relate writes per-worker nt files that are concatenated
in teardown (``documentrepository.py:1861-1926``) — the per-partition
parquet files + manifest here are the columnar version of exactly that.

Dedup design (SURVEY §7.5, north_rule skew note):

1. ``add_keys`` (map_batches, vectorized via polars xxhash): a stable
   64-bit ``key_hash`` over (subj, pred, obj, lang, datatype) and a
   ``bucket = key_hash % num_buckets`` partition column, plus a
   BATCH-LOCAL dedup — the partial/combiner step, so a triple repeated
   heavily within a block (head-entity skew) crosses the shuffle once
   per batch, not once per occurrence.
2. ``groupby("bucket").map_groups``: within-bucket exact dedup with a
   DETERMINISTIC survivor (sort by (subj, pred, obj, lang, datatype,
   url) and keep the first → two runs produce identical parquet,
   SURVEY §7.6.7), then an atomic partition write (tmp file + rename)
   and one manifest row back.

Resume: partitions whose manifest row exists are filtered out of the
input BEFORE the shuffle; a rerun after a crash only processes missing
buckets (reference analog: ``needed()`` mtime gating,
``documentstore.py:367-437``).

Scale notes: ``num_buckets`` sizes the unit of shuffle + memory
(one bucket is materialized per map_groups task) AND the unit of
resume; at 100 TB use O(10^4-10^5) buckets so each stays ≪ worker heap.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

KEY_COLS = ["subj", "pred", "obj", "lang", "datatype"]
DEFAULT_BUCKETS = 64


def add_keys(batch: pa.Table, num_buckets: int = DEFAULT_BUCKETS) -> pa.Table:
    """Vectorized key/bucket computation + batch-local dedup (the partial
    aggregation step before the shuffle)."""
    df = pl.from_arrow(batch)
    df = df.with_columns(
        pl.concat_str(
            [pl.col(c) for c in KEY_COLS], separator="\x1f"
        ).hash(seed=42).alias("key_hash")
    )
    df = df.with_columns(
        (pl.col("key_hash") % num_buckets).cast(pl.Int32).alias("bucket")
    )
    # batch-local dedup, deterministic survivor
    df = df.sort(KEY_COLS + ["url"]).unique(subset=["key_hash"],
                                            keep="first", maintain_order=True)
    out = df.to_arrow()
    # polars emits large_string; keep schema stable for ray blocks
    return out


def partition_writer(out_dir: str):
    """Factory for the map_groups function: one bucket → dedup → atomic
    parquet partition + manifest row. Returned dataset IS the manifest."""

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        bucket = int(group["bucket"].iloc[0])
        g = group.sort_values(KEY_COLS + ["url"], kind="mergesort")
        g = g.drop_duplicates(subset=["key_hash"], keep="first")
        g = g.drop(columns=["key_hash", "bucket"])
        part_dir = os.path.join(out_dir, f"bucket={bucket:05d}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(part_dir, "part-0.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)
        t_ms = (time.perf_counter() - t0) * 1000
        _write_manifest_row(out_dir, bucket, len(g), t_ms)
        return pd.DataFrame(
            {"bucket": [bucket], "n_triples": [len(g)], "t_ms": [t_ms]}
        )

    return write_group


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _write_manifest_row(out_dir: str, bucket: int, n: int, t_ms: float) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"bucket": bucket, "n_triples": n, "t_ms": round(t_ms, 3)}, f)
    os.replace(tmp, os.path.join(mdir, f"bucket-{bucket:05d}.json"))


def done_buckets(out_dir: str) -> set[int]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def read_manifest(out_dir: str) -> list[dict]:
    mdir = _manifest_dir(out_dir)
    rows = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("bucket-") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return rows


def materialize(triples_ds, out_dir: str,
                num_buckets: int = DEFAULT_BUCKETS, resume: bool = True):
    """Run the dedup + partitioned write; returns the manifest as a
    pandas DataFrame (small: one row per bucket written this run)."""
    ds = triples_ds.map_batches(
        lambda b: add_keys(b, num_buckets), batch_format="pyarrow"
    )
    skip = done_buckets(out_dir) if resume else set()
    if skip:
        skip_arr = sorted(skip)

        def _filter(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(
                pc.invert(pc.is_in(b.column("bucket"),
                                   value_set=pa.array(skip_arr, pa.int32())))
            )

        ds = ds.map_batches(_filter, batch_format="pyarrow")
    manifest = ds.groupby("bucket").map_groups(
        partition_writer(out_dir), batch_format="pandas"
    )
    return manifest.to_pandas()


def read_triples(out_dir: str):
    """Read the materialized triple table back as a Dataset."""
    import ray.data as rd

    return rd.read_parquet(out_dir)
