"""End-to-end training-data curation pipeline — the composed flagship
for the LLM-corpus side of the engine, chaining the curation operators
the way a production data pipeline does (CCNet/Dolma shape):

    PII redaction → quality gate → decontamination → exact dedup
                  → source mixing → sequence packing

1. **PII redaction** — emails/phones/IPv4 → typed placeholders
   (:func:`ferenda_ray.ops.decontam.pii_clean`), vectorized Arrow RE2
   inside the same pass as the gate; every downstream feature, token
   count, hash and n-gram is computed over the CLEAN text.
2. **quality gate** — the fixed-weight logistic classifier
   (:func:`ferenda_ray.ops.text.quality_z_expr` — the one shared
   definition) filters docs in the same single pass that tokenizes
   (BPE-ish count) and content-hashes them, so text is read ONCE and
   never crosses a shuffle: downstream stages see only skinny
   ``(doc_id, source, n, text_sha)`` rows.
3. **decontamination** — benchmark docs are excluded and any doc
   sharing a word 5-gram with the benchmark is dropped. The benchmark
   n-gram set is BROADCAST exact and checked inside the same gate
   pass. In production the benchmark is a SEPARATE constant-size table
   (pass ``benchmark_parquet=``; real suites are MBs against a 100 TB
   corpus, so the broadcast is bounded by the benchmark). The default
   ``doc_id % 20 == 0`` slice is the sandbox stand-in that keeps the
   one-SQL-oracle property — it is corpus-PROPORTIONAL, so at scale
   it is only honest with the explicit benchmark table (or the
   exchange-based :func:`ferenda_ray.ops.decontam.decontaminate`).
4. **exact dedup** — hash-bucketed by content sha (D1/D2 pattern,
   winner = min doc_id), vectorized drop_duplicates per bucket — never
   per-key groups.
5. **source mixing** — per-source token totals of the SURVIVORS reduce
   to #sources driver scalars; integer thresholds broadcast back;
   per-batch Lehmer-hash filter (``ops.sample.mix_corpus`` semantics).
6. **sequence packing** — the distributed exact-prefix-sum packer
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
from ferenda_ray.ops.text import (QUALITY_SCORE_SQL, pack_from_counts,
                                  quality_features_sql, quality_z_expr)

_TOK_RE = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"


def curation_pipeline(sf_dir: str, max_len: int = 512,
                      num_buckets: int = 32, dedup_buckets: int = 16,
                      benchmark_parquet: str | None = None):
    """documents → packed-sequence summary (seq_id, n_docs, n_tokens)
    for the curated corpus; see module docstring for the stage chain.

    ``benchmark_parquet``: a separate constant-size benchmark table
    (``text`` column) whose n-grams define contamination — the
    production path. Default None = the sandbox ``doc_id % 20``
    eval-slice convention (SQL-oracle-checked)."""
    import ray
    from ray.data.aggregate import Sum

    from ferenda_ray.ops.decontam import (EVAL_MOD, gram_hash_rows,
                                          pii_clean)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    # wave 0: exact benchmark n-gram set over the REDACTED text
    # (constant-size when benchmark_parquet is given — module
    # docstring; the modulo slice is the sandbox oracle convention)
    def eval_grams(b: pa.Table) -> pa.Table:
        if benchmark_parquet is None:
            d = b.column("doc_id").to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(d % EVAL_MOD == 0))
        # per-row unique ids: gram_hash_rows masks windows by doc
        # boundary (did[start]==did[end]), so a shared id would emit
        # phantom grams spanning adjacent benchmark docs
        did = (b.column("doc_id") if "doc_id" in b.column_names
               else pa.array(np.arange(b.num_rows, dtype=np.int64)))
        return gram_hash_rows(pa.table({
            "doc_id": did,
            "text": pii_clean(b.column("text"))})).select(["gram"])

    ev_src = (rd.read_parquet(benchmark_parquet, columns=["text"])
              if benchmark_parquet else ds)
    ev: set = set()
    for bt in (ev_src.map_batches(eval_grams, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")):
        ev.update(bt.column("gram").to_pylist())
    eval_ref = ray.put(np.array(sorted(ev), np.int64))

    def gate(b: pa.Table) -> pa.Table:
        from ferenda_ray.state import fetch

        ev_arr = fetch(eval_ref)
        clean = pii_clean(b.column("text"))
        df = pl.from_arrow(pa.table({"doc_id": b.column("doc_id"),
                                     "source": b.column("source"),
                                     "text": clean}))
        z = quality_z_expr()
        kept = df.with_columns(
            (1.0 / (1.0 + (-z).exp()) >= 0.5).alias("keep"),
            pl.col("text").str.count_matches(_TOK_RE)
            .cast(pl.Int64).alias("n"))
        flt = pl.col("keep") & (pl.col("n") > 0)
        if benchmark_parquet is None:
            # the modulo convention carves the benchmark out of the
            # corpus itself, so those docs are excluded from training
            flt = flt & (pl.col("doc_id") % EVAL_MOD != 0)
        kept = kept.filter(flt)
        # contamination: the batch's distinct grams against the
        # broadcast eval set, one vectorized pass (no per-doc loop)
        grams = gram_hash_rows(
            kept.select("doc_id", "text").to_arrow())
        hit = np.isin(grams.column("gram").to_numpy(
            zero_copy_only=False), ev_arr)
        bad = np.unique(grams.column("doc_id").to_numpy(
            zero_copy_only=False)[hit])
        shas = [hashlib.sha1(t.encode()).hexdigest()
                for t in kept["text"].to_list()]
        out = (kept.select("doc_id", "source", "n")
               .with_columns(pl.Series("text_sha", shas,
                                       dtype=pl.String))
               .filter(~pl.col("doc_id").is_in(bad.tolist())))
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


def _curation_sql() -> str:
    from ferenda_ray.ops.decontam import EVAL_MOD, NGRAM_N, pii_clean_sql

    return f"""
WITH red AS (
    SELECT doc_id, source, {pii_clean_sql("text")} AS text
    FROM documents
), feat AS ({quality_features_sql("doc_id, source, text", src="red")}
), tokz AS (
    -- regexp_extract_all(\\S+): SQL trim() strips only spaces, so a
    -- leading/trailing \\n or \\t would yield empty tokens and shifted
    -- n-grams vs the operator's \\S+ extraction
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM red
), ng AS (
    SELECT DISTINCT doc_id,
           array_to_string(t[i:i+{NGRAM_N - 1}], ' ') AS g
    FROM (SELECT doc_id, t,
                 unnest(range(1, len(t) - {NGRAM_N - 2})) AS i
          FROM tokz)
), eval_g AS (
    SELECT DISTINCT g FROM ng WHERE doc_id % {EVAL_MOD} = 0
), contam AS (
    SELECT DISTINCT n.doc_id FROM ng n JOIN eval_g e USING (g)
    WHERE n.doc_id % {EVAL_MOD} <> 0
), kept AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text, '{_TOK_RE}')) AS n
    FROM feat
    WHERE {QUALITY_SCORE_SQL} >= 0.5
      AND len(regexp_extract_all(text, '{_TOK_RE}')) > 0
      AND doc_id % {EVAL_MOD} <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contam)
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


CURATION_PIPELINE_SQL = _curation_sql()
