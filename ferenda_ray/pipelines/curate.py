"""End-to-end training-data curation pipeline — the composed flagship
for the LLM-corpus side of the engine, chaining the curation operators
the way a production data pipeline does (CCNet/Dolma shape):

    quality gate  →  exact dedup  →  source mixing  →  sequence packing

1. **quality gate** — the fixed-weight logistic classifier
   (:mod:`ferenda_ray.ops.text` ``quality_classifier``) filters docs in
   the same single pass that tokenizes (BPE-ish count) and
   content-hashes them, so text is read ONCE and never crosses a
   shuffle: downstream stages see only skinny
   ``(doc_id, source, n, text_sha)`` rows.
2. **exact dedup** — hash-bucketed by content sha (D1/D2 pattern,
   winner = min doc_id), vectorized drop_duplicates per bucket — never
   per-key groups.
3. **source mixing** — per-source token totals of the SURVIVORS reduce
   to #sources driver scalars; integer thresholds broadcast back;
   per-batch Lehmer-hash filter (``ops.sample.mix_corpus`` semantics).
4. **sequence packing** — the distributed exact-prefix-sum packer
   (``ops.text.pack_from_counts``) emits the per-sequence training-feed
   summary.

Every stage's arithmetic is integer or single-division float, so the
whole composition is recomputed exactly by one SQL oracle
(:data:`CURATION_PIPELINE_SQL`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

import ray.data as rd

from ferenda_ray.ops.sample import _MIX_SCALE, _mix
from ferenda_ray.ops.text import _QC_B, _QC_W, STOPWORDS, pack_from_counts

_TOK_RE = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"


def curation_pipeline(sf_dir: str, max_len: int = 512,
                      num_buckets: int = 32, dedup_buckets: int = 16):
    """documents → packed-sequence summary (seq_id, n_docs, n_tokens)
    for the curated corpus; see module docstring for the stage chain."""
    import ray
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    sw = list(STOPWORDS)

    def gate(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        alpha = pl.col("text").str.to_lowercase().str.extract_all(r"[a-z]+")
        n_chars = pl.col("text").str.len_chars().cast(pl.Float64)
        n_space = pl.col("text").str.count_matches(r"\s").cast(pl.Float64)
        n_tok = pl.col("text").str.count_matches(r"\S+").cast(pl.Float64)
        z = (pl.lit(_QC_B)
             + (alpha.list.eval(pl.element().is_in(sw)).list.sum()
                .cast(pl.Float64) / alpha.list.len().cast(pl.Float64))
             .fill_nan(0.0) * _QC_W["stopword_ratio"]
             + ((n_chars - n_space) / n_tok) * _QC_W["mean_token_len"]
             + (pl.col("text").str.count_matches(r"[0-9]")
                .cast(pl.Float64) / n_chars) * _QC_W["digit_ratio"]
             + (1.0 - pl.col("text").str.split("\n").list.n_unique()
                / pl.col("text").str.split("\n").list.len())
             * _QC_W["frac_dup_lines"])
        kept = (df.with_columns(
                    (1.0 / (1.0 + (-z).exp()) >= 0.5).alias("keep"),
                    pl.col("text").str.count_matches(_TOK_RE)
                    .cast(pl.Int64).alias("n"))
                .filter(pl.col("keep") & (pl.col("n") > 0)))
        shas = [hashlib.sha1(t.encode()).hexdigest()
                for t in kept["text"].to_list()]
        out = kept.select("doc_id", "source", "n").with_columns(
            pl.Series("text_sha", shas, dtype=pl.String))
        return (out.with_columns(
            (pl.col("text_sha").hash(7) % dedup_buckets)
            .cast(pl.Int32).alias("bucket")).to_arrow())

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values("doc_id", kind="mergesort")
                .drop_duplicates("text_sha", keep="first")
                [["doc_id", "source", "n"]])

    uniq = (ds.map_batches(gate, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup_bucket, batch_format="pandas")
            .materialize())

    totals = {r["source"]: int(r["sum(n)"]) for r in
              uniq.groupby("source").aggregate(Sum("n")).take_all()}
    sorted_totals = sorted(totals.values())
    budget = sorted_totals[(len(sorted_totals) - 1) // 2]
    thr = {s: _MIX_SCALE if t <= budget else (_MIX_SCALE * budget) // t
           for s, t in totals.items()}
    thr_ref = ray.put(thr)

    def mix(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        t = fetch(thr_ref)
        keys = np.asarray(b.column("doc_id").to_numpy(zero_copy_only=False))
        lim = (pl.from_arrow(b.select(["source"]))
               .select(pl.col("source").replace_strict(
                   t, return_dtype=pl.Int64))
               .to_series().to_numpy())
        return (b.filter(pa.array(_mix(keys) % _MIX_SCALE < lim))
                .select(["doc_id", "n"]))

    mixed = uniq.map_batches(mix, batch_format="pyarrow")
    return pack_from_counts(mixed, max_len=max_len,
                            num_buckets=num_buckets)


def _features_sql() -> str:
    sw = ",".join(f"'{t}'" for t in sorted(STOPWORDS))
    return f"""
    SELECT doc_id, source, text,
           coalesce(CAST(len(list_filter(
                        regexp_extract_all(lower(text), '[a-z]+'),
                        t -> t IN ({sw}))) AS DOUBLE)
               / nullif(len(regexp_extract_all(lower(text), '[a-z]+')), 0),
               0.0) AS stopword_ratio,
           length(regexp_replace(text, '\\s', '', 'g'))
               * 1.0 / len(regexp_extract_all(text, '\\S+'))
               AS mean_token_len,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
               / CAST(length(text) AS DOUBLE) AS digit_ratio,
           1.0 - CAST(len(list_distinct(string_split(text, chr(10))))
                      AS DOUBLE)
               / len(string_split(text, chr(10))) AS frac_dup_lines
    FROM documents"""


CURATION_PIPELINE_SQL = f"""
WITH feat AS ({_features_sql()}
), kept AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text, '{_TOK_RE}')) AS n
    FROM feat
    WHERE 1.0 / (1.0 + exp(-({_QC_B}
            + stopword_ratio * {_QC_W["stopword_ratio"]}
            + mean_token_len * {_QC_W["mean_token_len"]}
            + digit_ratio * {_QC_W["digit_ratio"]}
            + frac_dup_lines * {_QC_W["frac_dup_lines"]}))) >= 0.5
      AND len(regexp_extract_all(text, '{_TOK_RE}')) > 0
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
), tot AS (
    SELECT source, CAST(sum(n) AS BIGINT) AS st FROM kept GROUP BY source
), med AS (
    SELECT quantile_disc(st, 0.5) AS budget FROM tot
), thr AS (
    SELECT source,
           CASE WHEN st <= budget THEN {_MIX_SCALE}
                ELSE ({_MIX_SCALE} * budget) // st END AS lim
    FROM tot, med
), mixed AS (
    SELECT k.doc_id, k.n FROM kept k JOIN thr USING (source)
    WHERE (k.doc_id * 48271) % 2147483647 % {_MIX_SCALE} < thr.lim
), ofs AS (
    SELECT doc_id, n,
           CAST(sum(n) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n
                AS BIGINT) AS s
    FROM mixed
), spans AS (
    SELECT doc_id, n, s, s + n AS e,
           unnest(range(s // 512, (s + n - 1) // 512 + 1)) AS seq
    FROM ofs
)
SELECT CAST(seq AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(least(e, (seq + 1) * 512) - greatest(s, seq * 512))
            AS BIGINT) AS n_tokens
FROM spans GROUP BY seq
"""
