"""Training-data curation operators: benchmark decontamination and PII
redaction over the ``documents`` table — first-class LLM-pipeline
components (task brief) with DuckDB oracles.

* :func:`decontaminate` — flag corpus documents sharing any word
  n-gram with a held-out benchmark/eval set (the standard "13-gram
  overlap" decontamination rule, scaled to n=5 for the short synthetic
  docs). Scale shape = the repo's Bloom-prefilter + exact-confirm
  semi-join (``ops/bloom.py``): the eval side's n-gram set is
  broadcast as a constant-size bitset; only bloom-surviving corpus
  n-grams enter the exact-confirm exchange keyed by
  ``hash(gram) % B`` — the same narrow-rows-only discipline as the
  MinHash candidate join. Confirm compares 64-bit gram hashes
  (md5-derived): at 10^12 grams the collision odds (~1e-7 per pair
  set) only ever ADD a flagged doc, never lose one.
* :func:`redact_pii` — vectorized PII scrubbing (emails, E.164-ish
  phone numbers, IPv4) via Arrow RE2 kernels
  (``pc.replace_substring_regex``); DuckDB's ``regexp_replace`` is
  also RE2, so the oracle is engine-independent but regex-identical.

Both stream: no driver-side text, no full materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

NGRAM_N = 5
EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 -> held-out benchmark doc

# RE2-safe patterns (same string fed to Arrow and DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def _docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


_GRAM_P = np.uint64(1099511628211)  # FNV prime: rolling combine mult


def gram_hash_rows(tab: pa.Table, n: int = NGRAM_N) -> pa.Table:
    """(doc_id, text) table → DISTINCT ``(doc_id, gram)`` word-n-gram
    hash rows, fully vectorized: polars hashes every token in one
    kernel, a numpy rolling polynomial combines each n-window
    (windows crossing doc boundaries masked out) — no per-gram python
    (the round-3 version paid ~26 µs of md5+interp overhead per gram,
    ~3M grams at sf0.1). Hash values only ever meet OTHER values from
    this same function (bloom prefilter, exact confirm, broadcast eval
    set), so the 64-bit mix just needs determinism + spread."""
    import polars as pl

    df = pl.from_arrow(tab.select(["doc_id", "text"]))
    e = (df.select("doc_id",
                   pl.col("text").str.extract_all(r"\S+").alias("tok"))
         .explode("tok").drop_nulls("tok"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "gram": pa.array([], pa.int64())})
    if not len(e):
        return empty
    did = e["doc_id"].to_numpy()
    th = (e.select(pl.col("tok").hash(11)).to_series()
          .to_numpy().astype(np.uint64))
    m = len(th)
    if m < n:
        return empty
    acc = th[:m - n + 1].copy()
    for j in range(1, n):
        acc *= _GRAM_P
        acc ^= th[j:m - n + 1 + j]
    # a window is valid iff it starts and ends inside ONE doc (token
    # runs are doc-contiguous after explode)
    valid = did[:m - n + 1] == did[n - 1:]
    out = pl.DataFrame({
        "doc_id": did[:m - n + 1][valid],
        "gram": acc[valid].view(np.int64),
    }).unique(maintain_order=True)
    return out.cast({"doc_id": pl.Int64, "gram": pl.Int64}).to_arrow()


def _gram_hashes(text: str, n: int = NGRAM_N) -> np.ndarray:
    """DISTINCT word-n-gram hashes of ONE doc — thin per-doc wrapper
    over :func:`gram_hash_rows` (tests + small callers)."""
    t = gram_hash_rows(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": pa.array([text], pa.string())}),
                       n)
    return t.column("gram").to_numpy(zero_copy_only=False)


def _gram_rows(b: pa.Table, keep_eval: bool) -> pa.Table:
    d = b.column("doc_id").to_numpy(zero_copy_only=False)
    mask = (d % EVAL_MOD == 0) == keep_eval
    return gram_hash_rows(b.filter(pa.array(mask)))


def decontaminate(sf_dir: str, num_buckets: int = 32):
    """(doc_id, n_contaminated) for every NON-eval doc sharing ≥1
    distinct n-gram with the eval slice, sorted by doc_id.

    Wave 1: eval n-grams → Bloom bitset (driver holds 128 KiB).
    Wave 2: corpus n-grams bloom-prefiltered; survivors + eval grams
    exchange once, keyed by gram-hash bucket; per-gram indicator
    aggregation (the ``graph.skeleton`` anti-join shape) counts, per
    corpus doc, its distinct grams that exist on the eval side."""
    from ferenda_ray.ops.bloom import bloom_build, bloom_contains
    from ferenda_ray.util import bucket_ints

    docs = _docs(sf_dir)
    eval_grams = docs.map_batches(
        lambda b: _gram_rows(b, keep_eval=True), batch_format="pyarrow")
    packed_ref = ray.put(bloom_build(eval_grams, "gram"))

    def corpus_side(b: pa.Table) -> pa.Table:
        t = _gram_rows(b, keep_eval=False)
        pk = ray.get(packed_ref)
        keys = t.column("gram").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(bloom_contains(pk, keys)))
        g = t.column("gram").to_numpy(zero_copy_only=False)
        return pa.table({
            "gram": t.column("gram"), "doc_id": t.column("doc_id"),
            "is_eval": pa.array(np.zeros(len(g), bool)),
            "bucket": pa.array(bucket_ints(g, num_buckets), pa.int32())})

    def eval_side(b: pa.Table) -> pa.Table:
        t = _gram_rows(b, keep_eval=True)
        g = t.column("gram").to_numpy(zero_copy_only=False)
        return pa.table({
            "gram": t.column("gram"), "doc_id": t.column("doc_id"),
            "is_eval": pa.array(np.ones(len(g), bool)),
            "bucket": pa.array(bucket_ints(g, num_buckets), pa.int32())})

    both = (docs.map_batches(corpus_side, batch_format="pyarrow")
            .union(docs.map_batches(eval_side, batch_format="pyarrow")))

    def confirm(g: pd.DataFrame) -> pd.DataFrame:
        # exact confirm within one gram-hash bucket, fully vectorized:
        # distinct grams present on the eval side, then per-corpus-doc
        # count of its distinct grams in that set
        eval_set = g.loc[g.is_eval, "gram"].unique()
        hits = g.loc[~g.is_eval & g.gram.isin(eval_set),
                     ["doc_id", "gram"]].drop_duplicates()
        out = (hits.groupby("doc_id", sort=True).size()
               .rename("n_contaminated").reset_index())
        return out.astype({"doc_id": "int64", "n_contaminated": "int64"})

    return (both.groupby("bucket")
            .map_groups(confirm, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Sum("n_contaminated", alias_name="n_contaminated"))
            .sort("doc_id"))


DECONTAMINATE_SQL = f"""
WITH tok AS (
    -- \\S+ extraction, not trim+split: trim() strips only spaces, so
    -- leading/trailing \\n/\\t would shift n-grams vs gram_hash_rows
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
    FROM documents
), ng AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+{NGRAM_N - 1}], ' ') AS g
    FROM (SELECT doc_id, t,
                 unnest(range(1, len(t) - {NGRAM_N - 2})) AS i
          FROM tok)
), eval_g AS (
    SELECT DISTINCT g FROM ng WHERE doc_id % {EVAL_MOD} = 0
)
SELECT n.doc_id, count(DISTINCT n.g) AS n_contaminated
FROM ng n JOIN eval_g e USING (g)
WHERE n.doc_id % {EVAL_MOD} <> 0
GROUP BY n.doc_id
ORDER BY n.doc_id
"""


# -- PII redaction ---------------------------------------------------------

def pii_clean(text):
    """Arrow array → PII-scrubbed array (emails → phones → IPv4, in
    that order — order matters, a replace can expose/consume later
    patterns). THE single definition; :func:`redact_pii` and the
    curation-pipeline gate both use it, and :func:`pii_clean_sql`
    mirrors it verbatim for oracles."""
    clean = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
    return pc.replace_substring_regex(clean, IPV4_RE, "<IP>")


def pii_clean_sql(x: str = "text") -> str:
    """SQL expression equivalent of :func:`pii_clean` (same RE2
    patterns, same order)."""
    return (f"regexp_replace(regexp_replace(regexp_replace({x}, "
            f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
            f"'{PHONE_RE}', '<PHONE>', 'g'), "
            f"'{IPV4_RE}', '<IP>', 'g')")


def redact_pii(sf_dir: str):
    """(doc_id, clean, n_emails, n_phones, n_ips): emails/phones/IPv4
    replaced by typed placeholder tokens, counts kept for curation
    stats. One vectorized Arrow pass — no python loop over rows."""

    def scrub(b: pa.Table) -> pa.Table:
        text = b.column("text")
        n_email = pc.count_substring_regex(text, EMAIL_RE)
        clean = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        n_phone = pc.count_substring_regex(clean, PHONE_RE)
        clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
        n_ip = pc.count_substring_regex(clean, IPV4_RE)
        clean = pc.replace_substring_regex(clean, IPV4_RE, "<IP>")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "clean": pc.cast(clean, pa.string()),
            "n_emails": pc.cast(n_email, pa.int64()),
            "n_phones": pc.cast(n_phone, pa.int64()),
            "n_ips": pc.cast(n_ip, pa.int64()),
        })

    return _docs(sf_dir).map_batches(scrub, batch_format="pyarrow")


REDACT_PII_SQL = f"""
WITH s1 AS (
    SELECT doc_id, text,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS c1
    FROM documents
), s2 AS (
    SELECT doc_id, n_emails,
           len(regexp_extract_all(c1, '{PHONE_RE}')) AS n_phones,
           regexp_replace(c1, '{PHONE_RE}', '<PHONE>', 'g') AS c2
    FROM s1
)
SELECT doc_id, regexp_replace(c2, '{IPV4_RE}', '<IP>', 'g') AS clean,
       n_emails, n_phones,
       len(regexp_extract_all(c2, '{IPV4_RE}')) AS n_ips
FROM s2
"""
