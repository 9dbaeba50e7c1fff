"""Shared BSP-on-partitioned-files helpers (the filesystem-shuffle tier
used by ``stages/materialize.py``, ``ops/graph.py`` pagerank/HITS and
``ops/dedup.py`` verification): hive-partitioned parquet exchange with
per-bucket ray tasks instead of Ray's sort-based groupby barrier, whose
multi-second fixed cost per exchange dominates iterative / multi-round
algorithms (measured, BASELINE.md §4).

On a multi-node cluster the stage root lives on shared storage (set
``FERENDA_RAY_STAGE_ROOT``); per-bucket tasks are independent,
idempotent and retryable.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def stage_root(prefix: str) -> str:
    base = os.environ.get("FERENDA_RAY_STAGE_ROOT", "/tmp")
    return os.path.join(base, f"{prefix}-{uuid.uuid4().hex[:12]}")


def write_partials(root: str, tag: str, from_part: int,
                   df: pd.DataFrame, bucket_col: str) -> None:
    """Exchange step: split a (pre-aggregated) partial frame by
    destination bucket, one fragment file per (source task, dest
    bucket)."""
    for db, grp in df.groupby(bucket_col, sort=True):
        d = os.path.join(root, tag, f"b={int(db)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(grp.drop(columns=[bucket_col]),
                                 preserve_index=False),
            os.path.join(d, f"part-{from_part:05d}.parquet"))


def read_partials(root: str, tag: str, bucket: int) -> pd.DataFrame | None:
    """Read one bucket's fragments in deterministic (file-name) order."""
    files = sorted(_glob.glob(os.path.join(root, tag, f"b={bucket}",
                                           "*.parquet")))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files])


_PUBLISHED: list[str] = []


def _register(path: str) -> None:
    """Track a stage-tier result dir for removal at interpreter exit."""
    import atexit
    import shutil

    if not _PUBLISHED:
        atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True)
                                 for p in _PUBLISHED])
    _PUBLISHED.append(path)


def release_spills() -> None:
    """Explicitly remove every stage-tier result dir registered by
    :func:`publish_dataset` / :func:`spill_dataset`. The files back the
    lazy Datasets those functions returned, so call this ONLY once
    everything derived from them has been fully consumed. Long-running
    sessions that issue many spilling queries (the bench loop, the
    local correctness gate, a REPL) should call it between queries so
    full-corpus derived copies don't accumulate on the stage tier;
    one-shot scripts can rely on the interpreter-exit backstop."""
    import shutil

    while _PUBLISHED:
        shutil.rmtree(_PUBLISHED.pop(), ignore_errors=True)


def publish_dataset(root: str, files: list[str], prefix: str,
                    columns: list[str] | None = None):
    """Publish the final per-bucket result files of a BSP run as a lazy
    ``ray.data.Dataset``: move them out of the (about-to-be-deleted)
    stage root into a fresh result dir and return ``read_parquet`` over
    it. Node-level output therefore stays on the stage tier (shared
    storage on a cluster) instead of concentrating on the driver as a
    pandas concat — at 10^9 nodes the answer itself doesn't fit there.
    Result dirs are removed at interpreter exit (or earlier via
    :func:`release_spills`); callers that need the output durably
    write_parquet it somewhere of their own.
    """
    import ray.data as rd

    out = stage_root(prefix)
    os.makedirs(out, exist_ok=True)
    for f in files:
        os.replace(f, os.path.join(out, os.path.basename(f)))
    _register(out)
    return rd.read_parquet(out, columns=columns)


def spill_dataset(ds, prefix: str, columns: list[str] | None = None):
    """Disk-tier replacement for ``Dataset.materialize()`` on
    corpus-scale DERIVED data consumed more than once (token/shingle
    partials): stream the dataset to a stage-tier dir in ONE pass and
    return a lazy ``read_parquet`` over it. Re-reads stream from the
    managed disk tier (shared storage on a cluster) instead of pinning
    the whole derived dataset in the object store, where at 100 TB it
    would live in spill files anyway — but unmanaged and re-shipped per
    consumer. Cleaned at interpreter exit, or between queries via
    :func:`release_spills` once the returned Dataset is consumed."""
    import ray.data as rd

    out = stage_root(prefix)
    os.makedirs(out, exist_ok=True)
    ds.write_parquet(out)
    _register(out)
    return rd.read_parquet(out, columns=columns)


def read_hive_bucket(root: str, tag: str, col: str, bucket: int,
                     columns: list[str]) -> pa.Table | None:
    """Read one ``{tag}/{col}={bucket}`` hive partition (as written by
    ``Dataset.write_parquet(partition_cols=[col])``); None if absent."""
    import pyarrow.dataset as pads

    d = os.path.join(root, tag, f"{col}={bucket}")
    if not os.path.isdir(d):
        return None
    return pads.dataset(d).to_table(columns=columns)
