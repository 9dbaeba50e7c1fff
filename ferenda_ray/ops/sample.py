"""Sampling operators for training-data curation — subsample a corpus
deterministically (so reruns and resumed jobs pick the same rows), with
per-group quotas for balanced corpora.

* :func:`sample_events` — systematic hash sample: keep rows where a
  Lehmer-style mix of the key falls under the rate threshold.  Pure
  per-batch filter (no shuffle, no state); the mix is int64-safe so the
  DuckDB oracle computes the identical predicate → exact *(sql)* check.
* :func:`stratified_sample` — deterministic n-per-group quota: order
  rows within each group by (mix(key), key) and keep the first n.
  Mergeable top-n pattern: per-batch partial top-n per group inside
  ``map_batches`` (bounds shuffle input to n rows per group per block),
  then a final per-group top-n.  Oracle via ``row_number() OVER``.
* :func:`reservoir_sample` — seeded uniform k-reservoir over a Dataset
  of unknown size (Vitter's Algorithm R per block + weighted merge);
  random by design → rows-only driver check, statistical properties
  gated in tests.

The reference has no sampling surface (its closest is `downloadmax`
islice sampling, `decorators.py:355-371`); these are beyond-reference
training-pipeline additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

import ray.data as rd

# Lehmer-style multiplicative mix, safe in signed 64-bit for keys < 2^31
# and exactly reproducible in ANSI SQL: (key * 48271) % 2147483647.
_MIX_A = 48271
_MIX_M = 2147483647


def _mix(keys: np.ndarray) -> np.ndarray:
    return (keys.astype(np.int64) * _MIX_A) % _MIX_M


def sample_events(sf_dir: str, pct: int = 7):
    """Systematic ``pct``-percent sample of events keyed on event_id
    (deterministic: same rows every run, no RNG, no shuffle)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "value"])

    def keep(b: pa.Table) -> pa.Table:
        keys = np.asarray(b.column("event_id").to_numpy(zero_copy_only=False))
        return b.filter(pa.array(_mix(keys) % 100 < pct))

    return ds.map_batches(keep, batch_format="pyarrow").sort("event_id")


SAMPLE_EVENTS_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE (event_id * 48271) % 2147483647 % 100 < 7
ORDER BY event_id
"""


def stratified_sample(sf_dir: str, n_per_group: int = 20):
    """First ``n_per_group`` events per event_type in deterministic
    pseudo-random order (mix(event_id), event_id).  Partial top-n per
    batch caps the shuffle at n rows/group/block; the final per-group
    selection runs on that tiny residue."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def partial_topn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(
            ((pl.col("event_id") * _MIX_A) % _MIX_M).alias("rk"))
        return (df.sort(["rk", "event_id"])
                .group_by("event_type", maintain_order=True)
                .head(n_per_group).to_arrow())

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rk", "event_id"]).head(n_per_group)
        return g.drop(columns=["rk"])

    return (ds.map_batches(partial_topn, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(final_topn, batch_format="pandas")
            .sort(["event_type", "event_id"]))


STRATIFIED_SAMPLE_SQL = """
SELECT event_id, event_type, value
FROM (SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY (event_id * 48271) % 2147483647,
                                         event_id) AS rn
      FROM events)
WHERE rn <= 20
ORDER BY event_type, event_id
"""


def reservoir_sample(ds: rd.Dataset, k: int, seed: int = 0) -> pd.DataFrame:
    """Uniform k-sample without knowing |ds| up front: per-block
    reservoirs (item count + seeded RNG keyed on block content hash so
    the result is reproducible for a given dataset+seed), merged by
    weighted selection.  Returns a small pandas frame (k rows)."""

    def block_reservoir(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column("_n_src", pa.array([], pa.int64()))
        # Seed from stable content (first key column's first value + n),
        # not from global state → deterministic per block.  util.hash64
        # is process-independent (unlike builtin hash()).
        from ferenda_ray.util import hash64

        first = str(b.column(0)[0].as_py())
        rng = np.random.default_rng(
            np.uint64(seed) + np.uint64(hash64(f"{first}|{n}") % (2**32)))
        idx = rng.choice(n, size=min(k, n), replace=False)
        out = b.take(pa.array(np.sort(idx)))
        return out.append_column(
            "_n_src", pa.array([n] * len(idx), pa.int64()))

    parts = ds.map_batches(block_reservoir, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if len(parts) <= k:
        return parts.drop(columns=["_n_src"])
    # Weighted merge: each block's rows stand for n_src/|reservoir| items.
    rng = np.random.default_rng(seed)
    w = parts["_n_src"].to_numpy(dtype=np.float64)
    w = w / w.sum()
    pick = rng.choice(len(parts), size=k, replace=False, p=w)
    return parts.iloc[np.sort(pick)].drop(columns=["_n_src"]) \
                .reset_index(drop=True)


def sample_documents(sf_dir: str, k: int = 50):
    """k-document reservoir over the documents table (rows-only)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return reservoir_sample(ds, k)


# -- corpus mixing (source rebalancing to a token budget) -------------------

_MIX_SCALE = 10000


def mix_corpus(sf_dir: str):
    """Source-rebalanced corpus mix — the Dolma/RedPajama mixer step:
    downsample every over-represented source to the MEDIAN source's
    token total, so no single domain dominates the training mix.

    Two passes, both narrow:

    1. token counts per doc (one vectorized pass over text) feed a
       per-source sum — a ``groupby(source)`` whose output is
       #sources rows (constant, broadcast via ``ray.put``), from which
       the driver derives one integer keep-threshold per source:
       ``thr = floor(SCALE * budget / tokens_src)`` (``SCALE`` when the
       source is already within budget), budget = discrete median of
       the source totals;
    2. a pure per-batch filter keeps doc where
       ``mix(doc_id) % SCALE < thr[source]`` — deterministic,
       resume-stable, no shuffle.

    All arithmetic is int64 (floor division), so the DuckDB oracle
    computes the identical predicate (``quantile_disc`` = the same
    discrete median; ``//`` = the same floor division).
    """
    import ray
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def ntok(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            "doc_id", "source",
            pl.col("text").str.count_matches(r"\S+")
            .cast(pl.Int64).alias("n_tokens"))
        return df.to_arrow()

    counts = ds.map_batches(ntok, batch_format="pyarrow").materialize()
    totals = {r["source"]: int(r["sum(n_tokens)"]) for r in
              counts.groupby("source").aggregate(Sum("n_tokens"))
              .take_all()}
    sorted_totals = sorted(totals.values())
    budget = sorted_totals[(len(sorted_totals) - 1) // 2]  # quantile_disc .5
    thr = {s: _MIX_SCALE if t <= budget
           else (_MIX_SCALE * budget) // t
           for s, t in totals.items()}
    thr_ref = ray.put(thr)

    def keep(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        t = fetch(thr_ref)
        keys = np.asarray(b.column("doc_id").to_numpy(zero_copy_only=False))
        lim = (pl.from_arrow(b.select(["source"]))
               .select(pl.col("source").replace_strict(
                   t, return_dtype=pl.Int64))
               .to_series().to_numpy())
        return b.filter(pa.array(_mix(keys) % _MIX_SCALE < lim))

    return counts.map_batches(keep, batch_format="pyarrow")


MIX_CORPUS_SQL = f"""
WITH tok AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text, '\\S+')) AS n_tokens
    FROM documents
), tot AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS st
    FROM tok GROUP BY source
), med AS (
    SELECT quantile_disc(st, 0.5) AS budget FROM tot
), thr AS (
    SELECT source,
           CASE WHEN st <= budget THEN {_MIX_SCALE}
                ELSE ({_MIX_SCALE} * budget) // st END AS lim
    FROM tot, med
)
SELECT t.doc_id, t.source, t.n_tokens
FROM tok t JOIN thr USING (source)
WHERE (t.doc_id * 48271) % 2147483647 % {_MIX_SCALE} < thr.lim
"""


# -- curriculum ordering (exact global deciles by quality) ------------------

_CURR_BUCKETS = 32


def curriculum_deciles(sf_dir: str):
    """Curriculum-training order: every doc's EXACT global decile by
    ascending quality score (easy→hard scheduling reads deciles high
    to low). Distributed exact ranking without a global sort barrier:

    1. one pass computes the quality score (the classifier's sigmoid,
       ``ops.text.quality_classifier`` features);
    2. docs bucket by ``floor(score·B)`` — a pure, ORDER-PRESERVING
       function of the row (scores live in (0,1)), so bucket i holds
       exactly the rows ranked between buckets <i and >i; per-bucket
       counts reduce to B driver scalars;
    3. exclusive offsets broadcast back; each bucket sorts locally by
       (score, doc_id) and adds its offset → exact global 0-based
       rank; NTILE(10) arithmetic (first n%10 tiles one larger) maps
       rank → decile, matching DuckDB's ntile exactly.
    """
    import ray
    from ray.data.aggregate import Sum

    from ferenda_ray.ops.text import quality_z_expr

    def score(b: pa.Table) -> pa.Table:
        z = quality_z_expr()
        out = pl.from_arrow(b).select(
            "doc_id",
            (1.0 / (1.0 + (-z).exp())).alias("quality_score"))
        out = out.with_columns(
            (pl.col("quality_score") * _CURR_BUCKETS)
            .floor().cast(pl.Int32).alias("bucket"))
        return out.to_arrow()

    scored = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow").materialize()
    per_bucket = {r["bucket"]: r["count()"] for r in
                  scored.groupby("bucket").count().take_all()}
    offsets, acc = {}, 0
    for bkt in sorted(per_bucket):
        offsets[bkt] = acc
        acc += per_bucket[bkt]
    n = acc
    q, rem = divmod(n, 10)
    off_ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        from ferenda_ray.state import fetch

        g = g.sort_values(["quality_score", "doc_id"],
                          kind="mergesort").reset_index(drop=True)
        r = fetch(off_ref)[g["bucket"].iloc[0]] + np.arange(len(g))
        big = rem * (q + 1)
        decile = np.where(r < big, r // (q + 1) + 1,
                          (r - big) // max(q, 1) + rem + 1)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "quality_score":
                                 g["quality_score"].to_numpy(),
                             "decile": decile.astype(np.int64)})

    return (scored.groupby("bucket")
            .map_groups(rank_group, batch_format="pandas"))


def _curriculum_deciles_sql() -> str:
    from ferenda_ray.ops.text import (QUALITY_SCORE_SQL,
                                      quality_features_sql)

    return f"""
WITH f AS ({quality_features_sql("doc_id")}
), s AS (
    SELECT doc_id, {QUALITY_SCORE_SQL} AS quality_score
    FROM f
)
SELECT doc_id, quality_score,
       CAST(ntile(10) OVER (ORDER BY quality_score, doc_id) AS BIGINT)
           AS decile
FROM s
"""


CURRICULUM_DECILES_SQL = _curriculum_deciles_sql()
