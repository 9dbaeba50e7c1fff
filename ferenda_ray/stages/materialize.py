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


def add_keys(batch: pa.Table, num_buckets: int = DEFAULT_BUCKETS,
             layout: str = "key") -> pa.Table:
    """Vectorized key/bucket computation + batch-local dedup (the partial
    aggregation step before the shuffle).

    ``layout`` picks the partition key:

    * ``"key"`` (default) — bucket by the triple-key hash: the global
      exact-dedup invariant holds (equal keys always meet in one
      bucket), but a re-crawled url's old triples hash across ALL
      buckets, so incremental merges must sweep the whole table.
    * ``"url"`` — bucket by ``hash(url)``: a url's triples are
      partition-local, so an incremental merge touches ONLY the delta
      urls' buckets (sweep IO ∝ delta, the 10^8-url daily-crawl
      layout). Trade-off: a key emitted by pages in different buckets
      survives once per bucket — key-exact dedup holds within a
      bucket / within a url, and the DISTINCT key set equals the key
      layout's (pytest-gated); exact global graph-set semantics need
      the key layout.
    """
    df = pl.from_arrow(batch)
    df = df.with_columns(
        pl.concat_str(
            [pl.col(c) for c in KEY_COLS], separator="\x1f"
        ).hash(seed=42).alias("key_hash")
    )
    part = (pl.col("url").hash(seed=42) if layout == "url"
            else pl.col("key_hash"))
    df = df.with_columns(
        (part % num_buckets).cast(pl.Int32).alias("bucket")
    )
    # batch-local dedup, deterministic survivor. Dedup keys on the KEY
    # COLUMNS themselves, not key_hash: a 64-bit hash collision between
    # distinct triples would silently drop one, and at 10^9+ triples
    # collisions are expected. key_hash is only the bucket key (note:
    # polars' hash is not guaranteed stable across polars versions, so
    # bucket ASSIGNMENT — and hence resume — assumes a pinned polars).
    df = df.sort(KEY_COLS + ["url"]).unique(subset=KEY_COLS,
                                            keep="first", maintain_order=True)
    out = df.to_arrow()
    # polars emits large_string; keep schema stable for ray blocks
    return out


def merge_bucket(bucket: int, out_dir: str, stage_dir: str) -> tuple:
    """Phase-2 unit of work: read one bucket's staged delta fragments,
    exact-dedup with a deterministic survivor (sort by key cols + url,
    keep first), atomic final partition write + manifest row."""
    import pyarrow.dataset as pads

    t0 = time.perf_counter()
    frag_dir = os.path.join(stage_dir, f"bucket={bucket}")
    t = pads.dataset(frag_dir).to_table()
    g = pl.from_arrow(t).sort(KEY_COLS + ["url"]).unique(
        subset=KEY_COLS, keep="first", maintain_order=True
    ).drop("key_hash")
    part_dir = os.path.join(out_dir, f"bucket={bucket:05d}")
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(part_dir, "part-0.parquet")
    out = g.to_arrow()
    # polars round-trip upgrades to large_string; pin the canonical schema
    out = out.cast(pa.schema([(n, pa.large_string() if n in
                               ("subj", "pred", "obj", "lang", "datatype",
                                "url") else out.schema.field(n).type)
                              for n in out.column_names]))
    pq.write_table(out, tmp)
    os.replace(tmp, final)
    t_ms = (time.perf_counter() - t0) * 1000
    _write_manifest_row(out_dir, bucket, len(g), t_ms)
    return bucket, len(g), t_ms


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _write_manifest_row(out_dir: str, bucket: int, n: int, t_ms: float) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"bucket": bucket, "n_triples": n, "t_ms": round(t_ms, 3)}, f)
    os.replace(tmp, os.path.join(mdir, f"bucket-{bucket:05d}.json"))


def _write_meta(out_dir: str, num_buckets: int,
                layout: str = "key") -> None:
    """Persist the table's bucketing config so later incremental merges
    can refuse a mismatched ``num_buckets`` or ``layout`` (a silent
    mismatch splits the keyspace differently and breaks the dedup /
    replace-by-url invariants)."""
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, "_meta.json")
    if not os.path.exists(path):
        tmp = os.path.join(mdir, f".tmp-meta-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump({"num_buckets": num_buckets, "layout": layout}, f)
        os.replace(tmp, path)


def table_meta(out_dir: str) -> dict | None:
    path = os.path.join(_manifest_dir(out_dir), "_meta.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        meta = json.load(f)
    meta.setdefault("layout", "key")  # pre-layout tables
    return meta


def table_num_buckets(out_dir: str) -> int | None:
    meta = table_meta(out_dir)
    return None if meta is None else meta["num_buckets"]


def _check_meta(out_dir: str, num_buckets: int, layout: str,
                what: str) -> None:
    meta = table_meta(out_dir)
    if meta is None:
        return
    if meta["num_buckets"] != num_buckets:
        raise ValueError(
            f"{what}: table at {out_dir} was built with "
            f"num_buckets={meta['num_buckets']}, got {num_buckets} — a "
            "mismatched bucket count would split the keyspace differently")
    if meta["layout"] != layout:
        raise ValueError(
            f"{what}: table at {out_dir} was built with "
            f"layout={meta['layout']!r}, got {layout!r} — a mismatched "
            "partition key breaks the dedup / replace-by-url invariants")


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
                num_buckets: int = DEFAULT_BUCKETS, resume: bool = True,
                layout: str = "key"):
    """Run the dedup + partitioned write; returns the manifest as a
    pandas DataFrame (small: one row per bucket written this run).
    ``layout``: see :func:`add_keys` — ``"url"`` makes later
    incremental merges delta-local at the cost of bucket-scoped (not
    global) key dedup."""
    _check_meta(out_dir, num_buckets, layout, "materialize")
    _write_meta(out_dir, num_buckets, layout)
    ds = triples_ds.map_batches(
        lambda b: add_keys(b, num_buckets, layout), batch_format="pyarrow"
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

    # Two-phase filesystem shuffle (the external-shuffle/compaction
    # pattern) instead of Ray's sort-based groupby exchange, whose
    # fixed sample/merge barrier cost (~20-30 s on a 1M-row exchange
    # regardless of CPU count) capped scaling efficiency:
    #   phase 1 — map-only streaming write: each task splits its blocks
    #     by `bucket` into hive-partitioned delta fragments (no
    #     all-to-all; scales linearly with CPUs);
    #   phase 2 — one independent task per bucket merges that bucket's
    #     fragments, dedups, writes the final partition + manifest row.
    # On a multi-node cluster the stage dir lives on the same shared
    # storage as the final partitions; phase-2 parallelism = num_buckets.
    import shutil

    stage_root = os.environ.get("FERENDA_RAY_STAGE_ROOT")
    if stage_root:
        # transient shuffle tier (e.g. /dev/shm locally; on a cluster,
        # node-local SSD or the shuffle service). Losing it only costs
        # re-running phase 1 for unfinished buckets — bucket-level
        # resume lives in the manifest, not the stage.
        stage_dir = os.path.join(
            stage_root, "ferenda_stage-" + uuid.uuid4().hex[:12])
    else:
        stage_dir = os.path.join(out_dir, "_stage")
    shutil.rmtree(stage_dir, ignore_errors=True)
    # NOTE: do NOT pass min_rows_per_file here — bundling write tasks
    # to a row target serializes the write stage (measured 9s → 60s+ on
    # an 80k-page run); one file per (map task, bucket) is fine.
    ds.write_parquet(stage_dir, partition_cols=["bucket"])
    try:
        buckets = sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(stage_dir)
            if name.startswith("bucket=")
        ) if os.path.isdir(stage_dir) else []
        if not buckets:
            return pd.DataFrame(columns=["bucket", "n_triples", "t_ms"])
        # phase 2 is a FIXED small fan-out (num_buckets independent
        # tasks) — plain ray tasks avoid a second Dataset executor
        # startup (~1s) on every run; each task is pure + idempotent
        import ray

        merge = ray.remote(merge_bucket)
        rows = ray.get([merge.remote(b, out_dir, stage_dir)
                        for b in buckets])
        return pd.DataFrame(rows, columns=["bucket", "n_triples", "t_ms"])
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


def read_triples(out_dir: str):
    """Read the materialized triple table back as a Dataset. Only the
    ``bucket=*`` partition dirs are read — a run killed between phase 1
    and cleanup can leave a transient ``_stage`` dir under ``out_dir``
    (when no FERENDA_RAY_STAGE_ROOT is set) that must not leak into
    reads."""
    import ray.data as rd

    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")))
    if not parts:
        raise FileNotFoundError(f"no bucket=* partitions under {out_dir}")
    return rd.read_parquet(parts)


def _nt_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def nt_lines(triples_ds):
    """N-Triples serialization (reference ``dump.nt`` sink S10,
    ``documentrepository.py:1741-1811``): one text line per triple."""

    def fmt(b: pa.Table) -> pa.Table:
        lines = []
        for s, p, o, is_uri, lang, dt in zip(
            b.column("subj").to_pylist(), b.column("pred").to_pylist(),
            b.column("obj").to_pylist(), b.column("obj_is_uri").to_pylist(),
            b.column("lang").to_pylist(), b.column("datatype").to_pylist(),
        ):
            if is_uri:
                ot = f"<{o}>"
            elif dt:
                ot = f'"{_nt_escape(o)}"^^<{dt}>'
            elif lang:
                ot = f'"{_nt_escape(o)}"@{lang}'
            else:
                ot = f'"{_nt_escape(o)}"'
            lines.append(f"<{s}> <{p}> {ot} .")
        return pa.table({"line": pa.array(lines, pa.string())})

    return triples_ds.map_batches(fmt, batch_format="pyarrow")


def write_nt(triples_ds, out_dir: str):
    """dump.nt as sharded text files — the reference's per-worker nt
    file pattern (``documentrepository.py:1861-1926``): each task
    writes one shard; returns the shard manifest DataFrame."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pa.Table) -> pa.Table:
        name = f"part-{uuid.uuid4().hex}.nt"
        path = os.path.join(out_dir, name)
        with open(path + ".tmp", "w") as f:
            for line in b.column("line").to_pylist():
                f.write(line + "\n")
        os.replace(path + ".tmp", path)
        return pa.table({"shard": pa.array([name], pa.string()),
                         "n_lines": pa.array([b.num_rows], pa.int64())})

    return nt_lines(triples_ds).map_batches(
        dump, batch_format="pyarrow", batch_size=None).to_pandas()


# -- incremental delta merge ------------------------------------------------

def merge_bucket_incremental(bucket: int, out_dir: str, stage_dir: str,
                             urls_path: str | None) -> tuple:
    """Incremental unit of work: old partition (if any) + this bucket's
    staged delta fragments → new partition.

    Replace-by-url semantics: old rows whose ``url`` appears in the
    delta url set are dropped FIRST (a re-crawled page's newer snapshot
    supersedes all triples the old snapshot emitted — the reference's
    archive-version rule, ``documentstore.py:367-437`` needed()/archive),
    then delta rows are unioned in and the exact KEY_COLS dedup reruns
    with the same deterministic survivor as a fresh build."""
    import pyarrow.dataset as pads

    t0 = time.perf_counter()
    frag_dir = os.path.join(stage_dir, f"bucket={bucket}")
    delta = (pl.from_arrow(pads.dataset(frag_dir).to_table())
             .drop("key_hash") if os.path.isdir(frag_dir) else None)
    final = os.path.join(out_dir, f"bucket={bucket:05d}", "part-0.parquet")
    old = None
    if os.path.exists(final):
        old = pl.from_arrow(pq.read_table(final))
        old_n = len(old)
        if urls_path is not None:
            urls = pl.from_arrow(
                pq.read_table(urls_path, columns=["url"]))["url"]
            old = old.filter(~pl.col("url").is_in(urls))
        if delta is None and len(old) == old_n:
            # neither delta rows nor superseded rows: zero-write bucket
            return bucket, old_n, 0.0, False
    if old is not None and delta is not None:
        g = pl.concat([old.select(delta.columns), delta])
    elif delta is not None:
        g = delta
    else:
        g = old
    g = g.sort(KEY_COLS + ["url"]).unique(subset=KEY_COLS, keep="first",
                                          maintain_order=True)
    part_dir = os.path.dirname(final)
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    out = g.to_arrow()
    out = out.cast(pa.schema([(n, pa.large_string() if n in
                               ("subj", "pred", "obj", "lang", "datatype",
                                "url") else out.schema.field(n).type)
                              for n in out.column_names]))
    pq.write_table(out, tmp)
    os.replace(tmp, final)
    t_ms = (time.perf_counter() - t0) * 1000
    _write_manifest_row(out_dir, bucket, len(g), t_ms)
    return bucket, len(g), t_ms, True


def materialize_incremental(delta_ds, out_dir: str,
                            num_buckets: int = DEFAULT_BUCKETS):
    """Merge a DELTA triples Dataset (newly-crawled + re-crawled pages,
    already latest-filtered) into an EXISTING materialized table —
    the incremental path the reference serves with per-basefile mtime
    gating (``needed()``), here at bucket granularity:

    * phase 1 stages the delta exactly like a fresh build (map-only
      hive write) and records the DISTINCT delta urls alongside;
    * phase 2 sweeps every existing bucket ∪ every delta bucket: a
      re-crawled url's OLD triples hash across arbitrary buckets, so
      the superseded-row delete must scan each partition — but a
      bucket with no delta rows AND no superseded rows is detected
      cheaply (one column filter) and NOT rewritten, so write IO
      stays proportional to the delta.

    ``num_buckets`` must equal the original build's (the manifest is
    bucket-addressed) — VALIDATED against the ``_meta.json`` the build
    persisted; a mismatch raises instead of silently splitting the
    keyspace (legacy tables without meta are backfilled with the passed
    value). Equality with a from-scratch rebuild on the combined input
    is pytest-gated (tests/test_incremental.py).

    Scale note: the whole-table delete scan is the price of the
    default triple-key-hash layout. A table built with
    ``layout="url"`` (see :func:`add_keys`) makes a url's triples
    partition-local, so the sweep shrinks to the DELTA's own buckets —
    phase 2 then enumerates only those, and write AND read IO stay
    proportional to the delta (the 10^8-url daily-crawl configuration;
    the merge machinery is unchanged). The layout is read from the
    table's meta, never guessed."""
    import shutil

    import ray

    meta = table_meta(out_dir)
    layout = meta["layout"] if meta is not None else "key"
    _check_meta(out_dir, num_buckets, layout, "materialize_incremental")
    _write_meta(out_dir, num_buckets, layout)
    ds = delta_ds.map_batches(
        lambda b: add_keys(b, num_buckets, layout), batch_format="pyarrow")
    stage_root = os.environ.get("FERENDA_RAY_STAGE_ROOT")
    stage_dir = (os.path.join(stage_root,
                              "ferenda_incr-" + uuid.uuid4().hex[:12])
                 if stage_root else os.path.join(out_dir, "_incr_stage"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    ds.write_parquet(stage_dir, partition_cols=["bucket"])
    try:
        delta_buckets = set(
            int(n.split("=", 1)[1]) for n in os.listdir(stage_dir)
            if n.startswith("bucket=")
        ) if os.path.isdir(stage_dir) else set()
        if not delta_buckets:
            return pd.DataFrame(columns=["bucket", "n_triples", "t_ms"])
        # distinct delta urls (small side; drives the replace rule)
        import pyarrow.dataset as pads

        urls = (pl.from_arrow(
            pads.dataset(stage_dir).to_table(columns=["url"]))
            .unique())
        urls_path = os.path.join(stage_dir, "_delta_urls.parquet")
        pq.write_table(urls.to_arrow(), urls_path)

        # url layout: superseded rows can only live where their url
        # hashes — the delta's own buckets; key layout must sweep all
        buckets = sorted(delta_buckets if layout == "url"
                         else delta_buckets | done_buckets(out_dir))
        merge = ray.remote(merge_bucket_incremental)
        rows = ray.get([merge.remote(b, out_dir, stage_dir, urls_path)
                        for b in buckets])
        return pd.DataFrame(
            [r[:3] for r in rows if r[3]],  # rewritten buckets only
            columns=["bucket", "n_triples", "t_ms"])
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


# -- generic resumable partitioned materialize -----------------------------

def materialize_table(ds, out_dir: str, *, key_cols: list[str],
                      num_buckets: int = 32, resume: bool = True,
                      dedup: bool = False):
    """The triple-materialize machinery generalized to ANY table:
    hash-bucket by ``key_cols`` → two-phase filesystem shuffle →
    one parquet partition + manifest row per bucket, resumable. Gives
    every derived product (sections, facets, generated HTML …) the
    same checkpoint-resume semantics as the triple store.

    ``dedup=True`` keeps one row per distinct ``key_cols`` tuple
    (deterministic survivor: full-row sort)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        df = df.with_columns(
            pl.concat_str([pl.col(c).cast(pl.Utf8) for c in key_cols],
                          separator="\x1f").hash(seed=42).alias("_kh"))
        df = df.with_columns(
            (pl.col("_kh") % num_buckets).cast(pl.Int32).alias("bucket"))
        return df.to_arrow()

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    skip = done_buckets(out_dir) if resume else set()
    if skip:
        skip_arr = sorted(skip)

        def _filter(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.invert(pc.is_in(
                b.column("bucket"), value_set=pa.array(skip_arr, pa.int32()))))

        ds = ds.map_batches(_filter, batch_format="pyarrow")

    import shutil

    stage_root = os.environ.get("FERENDA_RAY_STAGE_ROOT")
    stage_dir = (os.path.join(stage_root,
                              "ferenda_stage-" + uuid.uuid4().hex[:12])
                 if stage_root else os.path.join(out_dir, "_stage"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    ds.write_parquet(stage_dir, partition_cols=["bucket"])
    try:
        buckets = sorted(
            int(n.split("=", 1)[1]) for n in os.listdir(stage_dir)
            if n.startswith("bucket=")
        ) if os.path.isdir(stage_dir) else []
        if not buckets:
            return pd.DataFrame(columns=["bucket", "n_rows", "t_ms"])
        import ray

        merge = ray.remote(_merge_generic)
        rows = ray.get([merge.remote(b, out_dir, stage_dir, dedup, key_cols)
                        for b in buckets])
        return pd.DataFrame(rows, columns=["bucket", "n_rows", "t_ms"])
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


def _merge_generic(bucket: int, out_dir: str, stage_dir: str,
                   dedup: bool, key_cols: list[str]) -> tuple:
    import pyarrow.dataset as pads

    t0 = time.perf_counter()
    t = pads.dataset(os.path.join(stage_dir, f"bucket={bucket}")).to_table()
    g = pl.from_arrow(t)
    sort_cols = [c for c in g.columns if c != "_kh"]
    g = g.sort(sort_cols)
    if dedup:
        # dedup on the key columns themselves, not the 64-bit _kh (hash
        # collisions between distinct keys must not drop rows)
        g = g.unique(subset=key_cols, keep="first", maintain_order=True)
    g = g.drop("_kh")
    part_dir = os.path.join(out_dir, f"bucket={bucket:05d}")
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(g.to_arrow(), tmp)
    os.replace(tmp, os.path.join(part_dir, "part-0.parquet"))
    t_ms = (time.perf_counter() - t0) * 1000
    _write_manifest_row(out_dir, bucket, len(g), t_ms)
    return bucket, len(g), t_ms
