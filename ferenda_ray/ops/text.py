"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline primitives (token counting, language ID, quality
scoring, document fingerprinting) the task brief requires as first-class
components, each as a vectorized Ray Data stage.

Where the semantics are SQL-expressible the op has a DuckDB oracle —
including language ID (stopword-argmax with priority tie-break) and
winnowing fingerprints (the md5 token hash maps exactly onto DuckDB's
``md5_number_upper``, so the rolling hash + window-min recompute in
SQL); only the FSM-structured and tokenizer-id outputs stay rows-only.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import polars as pl
import pyarrow as pa

import ray.data as rd


def _docs(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# -- token counting (vectorized via polars) --------------------------------

def token_counts(sf_dir: str):
    """doc_id → n_tokens (maximal ``\\S+`` runs) + n_chars."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.select(
            pl.col("doc_id"),
            pl.col("text").str.count_matches(r"\S+").cast(pl.Int64).alias("n_tokens"),
            pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars_calc"),
        )
        return out.to_arrow()

    return ds.map_batches(count, batch_format="pyarrow")


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       length(text) AS n_chars_calc
FROM documents
"""


def quality_scores(sf_dir: str):
    """Per-doc quality ratio metrics (digit ratio, whitespace ratio,
    mean token length) — the length/punct-style quality scoring of
    large-corpus filtering pipelines, fully vectorized."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        n_chars = pl.col("text").str.len_chars().cast(pl.Float64)
        n_digits = pl.col("text").str.count_matches(r"[0-9]").cast(pl.Float64)
        n_space = pl.col("text").str.count_matches(r"\s").cast(pl.Float64)
        n_tokens = pl.col("text").str.count_matches(r"\S+").cast(pl.Float64)
        out = df.select(
            pl.col("doc_id"),
            (n_digits / n_chars).alias("digit_ratio"),
            (n_space / n_chars).alias("space_ratio"),
            ((n_chars - n_space) / n_tokens).alias("mean_token_len"),
        )
        return out.to_arrow()

    return ds.map_batches(score, batch_format="pyarrow")


QUALITY_SCORES_SQL = """
SELECT doc_id,
       length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE)
           AS digit_ratio,
       (length(text) - length(regexp_replace(text, '\\s', '', 'g')))
           / CAST(length(text) AS DOUBLE) AS space_ratio,
       length(regexp_replace(text, '\\s', '', 'g'))
           / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)
           AS mean_token_len
FROM documents
"""


# -- language ID (n-gram/stopword heuristic) -------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "que"},
    "de": {"der", "die", "das", "und", "von", "ein", "eine", "ist", "mit", "zu"},
    "sv": {"och", "att", "det", "som", "en", "av", "är", "för", "på", "med"},
}


def detect_lang(text: str) -> str:
    """Stopword-overlap language ID; 'und' when nothing matches."""
    toks = set(text.lower().split()[:200])
    best, best_n = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        n = len(toks & markers)
        if n > best_n:
            best, best_n = lang, n
    return best


def lang_id(sf_dir: str):
    """doc_id, lang (declared), lang_pred (heuristic), agree flag."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["lang_pred"] = [detect_lang(t) for t in df["text"]]
        df["agree"] = df["lang_pred"] == df["lang"]
        return df.drop(columns=["text"])

    return ds.map_batches(pred, batch_format="pandas")


def _lang_id_sql() -> str:
    """SQL oracle for :func:`lang_id`: the same stopword-overlap argmax
    (distinct first-200 tokens ∩ marker set), with python's tie rule —
    an earlier language in ``_LANG_MARKERS`` insertion order wins equal
    scores — encoded as a priority column."""
    values = ", ".join(
        f"('{lang}', {prio}, '{t}')"
        for prio, (lang, markers) in enumerate(_LANG_MARKERS.items())
        for t in sorted(markers))
    return f"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\\S+')[1:200]) AS t
    FROM documents
), dtok AS (
    SELECT DISTINCT doc_id, t FROM tok
), markers(lang, prio, t) AS (
    VALUES {values}
), scores AS (
    SELECT d.doc_id, m.lang, m.prio, count(*) AS n
    FROM dtok d JOIN markers m ON d.t = m.t
    GROUP BY d.doc_id, m.lang, m.prio
), best AS (
    SELECT doc_id, lang AS lang_pred,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, prio ASC) AS rn
    FROM scores
)
SELECT doc.doc_id, doc.lang, coalesce(b.lang_pred, 'und') AS lang_pred,
       coalesce(b.lang_pred, 'und') = doc.lang AS agree
FROM documents doc
LEFT JOIN best b ON b.doc_id = doc.doc_id AND b.rn = 1
"""


LANG_ID_SQL = _lang_id_sql()


# -- document fingerprinting (rolling hash) --------------------------------

_B = 1000003
_M = (1 << 61) - 1


def winnow_fingerprint(text: str, k: int = 5, w: int = 8) -> list[int]:
    """Winnowing fingerprint: rolling (Rabin-Karp) hashes of k-token
    grams, minimum per window of w — the standard local document
    fingerprint for overlap detection."""
    toks = text.split()
    if len(toks) < k:
        return []
    grams = []
    for i in range(len(toks) - k + 1):
        h = 0
        for t in toks[i : i + k]:
            th = hash_token(t)
            h = (h * _B + th) % _M
        grams.append(h)
    out = []
    prev = None
    for i in range(max(1, len(grams) - w + 1)):
        win = grams[i : i + w]
        m = min(win)
        if m != prev:
            out.append(m)
            prev = m
    return out


def hash_token(t: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")


def fingerprint_rows(sf_dir: str):
    """Exploded winnowing fingerprints — (doc_id, pos, fp) rows, the
    join-ready shape for cross-doc overlap detection (and the form the
    SQL oracle can hash-compare; the list-column variant below stays
    for sketch consumers)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        d_o, p_o, f_o = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            for pos, f in enumerate(winnow_fingerprint(t)):
                d_o.append(d)
                p_o.append(pos)
                f_o.append(f % (1 << 62))
        return pa.table({
            "doc_id": pa.array(d_o, pa.int64()),
            "pos": pa.array(p_o, pa.int64()),
            "fp": pa.array(f_o, pa.int64()),
        })

    return ds.map_batches(fp, batch_format="pyarrow")


def _fingerprint_rows_sql(k: int = 5, w: int = 8) -> str:
    """Winnowing recomputed in SQL: stepwise Rabin-Karp rolling hash in
    HUGEINT (md5_number_upper == the python token hash, endianness
    verified), window-min over w gram positions, consecutive-dup drop
    via lag()."""
    expr = f"md5_number_upper(t[i])::HUGEINT % {_M}"
    for j in range(1, k):
        expr = (f"(({expr}) * {_B} + "
                f"md5_number_upper(t[i+{j}])::HUGEINT) % {_M}")
    return f"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
    FROM documents
), g AS (
    SELECT doc_id, i, ({expr})::BIGINT AS h
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {k - 2})) AS i
          FROM tok)
), wins AS (
    SELECT doc_id, i,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
               AS m,
           count(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM g
), limited AS (
    SELECT doc_id, i, m FROM wins
    WHERE i <= greatest(1, n_grams - {w - 1})
), kept AS (
    SELECT doc_id, i, m,
           lag(m) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM limited
)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos,
       m % {1 << 62} AS fp
FROM kept WHERE prev IS NULL OR m <> prev
"""


FINGERPRINT_ROWS_SQL = _fingerprint_rows_sql()


def fingerprints(sf_dir: str):
    """doc_id → fingerprint count + first fingerprint (stable sketch of
    the doc; full list kept as a list column)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        fps = [winnow_fingerprint(t) for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
                "fingerprints": pa.array(
                    [[x % (1 << 62) for x in f] for f in fps],
                    pa.list_(pa.int64()),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# -- cross-doc span overlap via winnowing fingerprints ----------------------

_OVERLAP_MAX_DF = 20   # boilerplate cap: fps in more docs carry no signal
_OVERLAP_MIN_SHARED = 2
_N_FP_BUCKETS = 32     # coarse shuffle buckets (per-fp/per-pair grouping
                       # happens vectorized INSIDE each bucket task —
                       # groupby over millions of raw keys is the
                       # documented sort-shuffle trap, BASELINE §4)


def _fp_rows_ds(ds):
    """(doc_id, fp) rows — per-doc DISTINCT winnowing fingerprints."""

    def fp_rows(b: pa.Table) -> pa.Table:
        d_o, f_o = [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            for f in set(winnow_fingerprint(t)):
                d_o.append(d)
                f_o.append(f % (1 << 62))
        return pa.table({"doc_id": pa.array(d_o, pa.int64()),
                         "fp": pa.array(f_o, pa.int64())})

    return ds.map_batches(fp_rows, batch_format="pyarrow")


def _fp_pair_counts(rows, max_df: int,
                    num_buckets: int = _N_FP_BUCKETS):
    """(doc_a, doc_b, n_shared) from distinct (doc_id, fp) rows via two
    coarse hash-bucket exchanges: fp-hash buckets (per-fp df filter +
    pair emit as ONE vectorized self-merge per bucket), then pair-hash
    buckets (vectorized partial-count sum). Fingerprints in more than
    ``max_df`` docs are dropped before pairing — the LSH hot-bucket
    cap — so pair blowup is bounded by C(max_df, 2) per fp."""
    import numpy as np

    from ferenda_ray.util import bucket_ints

    def fp_bucket(b: pa.Table) -> pa.Table:
        f = b.column("fp").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(bucket_ints(f, num_buckets)))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("fp")["doc_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_df)]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        m = g[["doc_id", "fp"]].merge(g[["doc_id", "fp"]], on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"], sort=True).size()
               .rename("n").reset_index()
               .rename(columns={"doc_id_x": "doc_a",
                                "doc_id_y": "doc_b"}))
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "n": "int64"})

    partials = (rows.map_batches(fp_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(emit,
                                              batch_format="pandas"))

    def pair_bucket(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False)
        d = b.column("doc_b").to_numpy(zero_copy_only=False)
        key = a * np.int64(1000003) + d  # wrapping mix is fine for a
        return b.append_column(          # bucket id (bucket_ints remixes)
            "bucket", pa.array(bucket_ints(key, num_buckets)))

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["doc_a", "doc_b"], sort=True)["n"].sum()
               .rename("n_shared").reset_index())
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "n_shared": "int64"})

    return (partials.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(total, batch_format="pandas"))


def _doc_fp_counts(rows, num_buckets: int = _N_FP_BUCKETS):
    """(doc_id, n_fp) — total distinct-fp count per doc, bucketed count
    (same coarse-bucket rationale as :func:`_fp_pair_counts`)."""
    from ferenda_ray.util import bucket_ints

    def doc_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(bucket_ints(d, num_buckets)))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", sort=True).size().rename("n_fp")
               .reset_index())
        return out.astype({"doc_id": "int64", "n_fp": "int64"})

    return (rows.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(count, batch_format="pandas"))


def fingerprint_overlap_pairs(sf_dir: str,
                              min_shared: int = _OVERLAP_MIN_SHARED,
                              max_df: int = _OVERLAP_MAX_DF):
    """Doc pairs sharing ≥ ``min_shared`` distinct winnowing
    fingerprints — MOSS-style local overlap detection (shared spans,
    not whole-doc similarity; complements MinHash which misses short
    verbatim reuse inside otherwise-different docs).

    Shape: explode fingerprints (one pass over text), then the two
    coarse-bucketed exchanges of :func:`_fp_pair_counts` — per-fp
    grouping and pair counting both happen vectorized inside ≤32
    bucket tasks, never as a per-key Ray groupby."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("n_shared"),
                                         min_shared))

    rows = _fp_rows_ds(_docs(sf_dir, ["doc_id", "text"]))
    return (_fp_pair_counts(rows, max_df)
            .map_batches(keep, batch_format="pyarrow"))


FINGERPRINT_OVERLAP_SQL = f"""
WITH dfp AS (
    SELECT DISTINCT doc_id, fp FROM ({FINGERPRINT_ROWS_SQL})
), ok AS (
    SELECT doc_id, fp FROM dfp
    QUALIFY count(*) OVER (PARTITION BY fp) BETWEEN 2 AND {_OVERLAP_MAX_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {_OVERLAP_MIN_SHARED}
"""


_CONTAIN_TAU_PCT = 50


def fingerprint_containment_pairs(sf_dir: str,
                                  tau_pct: int = _CONTAIN_TAU_PCT,
                                  max_df: int = _OVERLAP_MAX_DF):
    """ASYMMETRIC near-dup detection: pairs where the smaller doc's
    fingerprint set is ≥ ``tau_pct``% covered by the shared set —
    catches quotation/repost containment that symmetric Jaccard (and
    MinHash) under-scores when sizes differ wildly. Output columns:
    (doc_a, doc_b, n_shared, n_a, n_b, containment_pct) with
    ``containment_pct = 100·n_shared // min(n_a, n_b)`` — pure integer
    arithmetic, so the SQL oracle is exact.

    Shape: the overlap pair stream (coarse fp-hash-bucketed, max_df
    cap — :func:`_fp_pair_counts`) plus per-doc TOTAL distinct-fp
    counts (uncapped — the denominator must not lose boilerplate
    mass), attached to the pair table via two bucketed cogroups (by
    doc_a, then doc_b); pairs and counts are both skinny, no
    driver-side map."""
    import pyarrow.compute as pc

    from ferenda_ray.bsp import spill_dataset

    num_buckets = 16
    # consumed twice (totals + pairs): spill to the disk tier instead
    # of pinning corpus-scale fp rows in the object store
    rows = spill_dataset(_fp_rows_ds(_docs(sf_dir, ["doc_id", "text"])),
                         "ferenda_fprows")
    counts = _doc_fp_counts(rows)
    pair_counts = _fp_pair_counts(rows, max_df)

    def attach(pairs_ds, counts_ds, pair_cols: list[str], key: str,
               out: str):
        """Bucketed cogroup: pair rows pick up the doc's n_fp. Both
        union sides carry the SAME columns (``pair_cols`` + nfp_side +
        bucket); the count side nulls the pair columns it lacks."""
        def tag_pairs(b: pa.Table) -> pa.Table:
            k = b.column(key).to_numpy(zero_copy_only=False)
            b = b.append_column("nfp_side",
                                pa.nulls(b.num_rows, pa.int64()))
            return b.append_column(
                "bucket", pa.array(k % num_buckets, pa.int32()))

        def tag_counts(b: pa.Table) -> pa.Table:
            k = b.column("doc_id").to_numpy(zero_copy_only=False)
            cols = {}
            for c in pair_cols:
                cols[c] = (b.column("doc_id") if c == key
                           else pa.nulls(b.num_rows, pa.int64()))
            cols["nfp_side"] = b.column("n_fp")
            t = pa.table(cols)
            return t.append_column(
                "bucket", pa.array(k % num_buckets, pa.int32()))

        def join(g: pd.DataFrame) -> pd.DataFrame:
            cnt = (g[g["nfp_side"].notna()]
                   [[key, "nfp_side"]].drop_duplicates(key))
            pr = g[g["nfp_side"].isna()].drop(columns=["nfp_side"])
            j = pr.merge(cnt, on=key)
            return j.rename(columns={"nfp_side": out}).drop(
                columns=["bucket"])

        return (pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
                .union(counts_ds.map_batches(tag_counts,
                                             batch_format="pyarrow"))
                .groupby("bucket")
                .map_groups(join, batch_format="pandas"))

    with_a = attach(pair_counts, counts,
                    ["doc_a", "doc_b", "n_shared"], "doc_a", "n_a")
    with_b = attach(with_a, counts,
                    ["doc_a", "doc_b", "n_shared", "n_a"], "doc_b", "n_b")

    def fin(b: pa.Table) -> pa.Table:
        import numpy as np

        # the cogroup merges ride through pandas (nullable → float);
        # re-cast so the output (and the driver's value hash) is int
        ns = (b.column("n_shared").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        na = b.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = b.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        da = (b.column("doc_a").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        db = (b.column("doc_b").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        pct = (100 * ns) // np.minimum(na, nb)
        out = pa.table({"doc_a": pa.array(da), "doc_b": pa.array(db),
                        "n_shared": pa.array(ns), "n_a": pa.array(na),
                        "n_b": pa.array(nb),
                        "containment_pct": pa.array(pct, pa.int64())})
        return out.filter(pc.greater_equal(out.column("containment_pct"),
                                           tau_pct))

    return with_b.map_batches(fin, batch_format="pyarrow")


FINGERPRINT_CONTAINMENT_SQL = f"""
WITH dfp AS (
    SELECT DISTINCT doc_id, fp FROM ({FINGERPRINT_ROWS_SQL})
), cnt AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM dfp GROUP BY doc_id
), ok AS (
    SELECT doc_id, fp FROM dfp
    QUALIFY count(*) OVER (PARTITION BY fp) BETWEEN 2 AND {_OVERLAP_MAX_DF}
), p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.n_shared, ca.n_fp AS n_a, cb.n_fp AS n_b,
       (100 * p.n_shared) // least(ca.n_fp, cb.n_fp) AS containment_pct
FROM p JOIN cnt ca ON ca.doc_id = p.doc_a
       JOIN cnt cb ON cb.doc_id = p.doc_b
WHERE (100 * p.n_shared) // least(ca.n_fp, cb.n_fp)
      >= {_CONTAIN_TAU_PCT}
"""


# -- plain-text structural parse (TextReader S5 analog) --------------------

_HEADING_LINE = __import__("re").compile(r"^(\d+(?:\.\d+)*)\.?\s+\S")


def text_blocks(text: str) -> list[dict]:
    """Chunk plain text into the FSM block stream the structural parser
    consumes: blank-line-separated paragraphs, with 'N. Title' lines as
    numbered headings and '- item' lines as list items (reference
    ``TextReader`` paragraph mode + the RFC rule pack's line shapes,
    ``textreader.py:11-352`` / ``rfc.py:337-380``)."""
    blocks: list[dict] = []
    for para in text.split("\n\n"):
        para = para.strip()
        if not para:
            continue
        first = para.split("\n", 1)[0]
        if _HEADING_LINE.match(first) and len(first) < 120:
            m = _HEADING_LINE.match(first)
            blocks.append({"kind": "heading",
                           "level": first.count(".") + 1,
                           "text": first})
            rest = para.split("\n", 1)
            if len(rest) > 1 and rest[1].strip():
                blocks.append({"kind": "paragraph",
                               "text": " ".join(rest[1].split())})
        elif all(line.lstrip().startswith(("-", "*"))
                 for line in para.splitlines()):
            for line in para.splitlines():
                blocks.append({"kind": "listitem",
                               "text": line.lstrip("-* ").strip()})
        else:
            blocks.append({"kind": "paragraph", "text": " ".join(para.split())})
    return blocks


# ``doc_structure`` recomputed in SQL: the text_blocks classification
# (blank-line paragraph split, 'N. Title' heading lines < 120 chars,
# all-lines-dashed list paragraphs) plus the FSM tree's counting rules —
# Sections are headings whose first line contains a dot (level =
# dots+1 ≥ 2, ``structure.is_section_heading``), a heading paragraph
# with trailing lines also yields one Paragraph, and each maximal run
# of consecutive list paragraphs folds into ONE UnorderedList
# (``structure.make_list`` consumes the whole listitem run). Docs whose
# text yields no blocks still emit a (0, 0, 0) row.
_HEAD_RE_SQL = r"'^\d+(\.\d+)*\.?\s+\S'"
DOC_STRUCTURE_SQL = f"""
WITH paras0 AS (
    SELECT doc_id,
           trim(unnest(string_split(text, chr(10) || chr(10)))) AS para,
           unnest(range(0, len(string_split(text, chr(10) || chr(10)))))
               AS i
    FROM documents
), paras AS (
    SELECT doc_id, para, i, string_split(para, chr(10))[1] AS fl
    FROM paras0 WHERE para <> ''
), cls AS (
    SELECT doc_id, i, para, fl,
           (regexp_matches(fl, {_HEAD_RE_SQL}) AND length(fl) < 120)
               AS is_heading,
           (NOT (regexp_matches(fl, {_HEAD_RE_SQL}) AND length(fl) < 120))
           AND len(list_filter(string_split(para, chr(10)),
                               l -> NOT regexp_matches(l, '^\\s*[-*]'))) = 0
               AS is_list
    FROM paras
), runs AS (
    SELECT doc_id, i, is_heading, is_list, para, fl,
           is_list AND NOT coalesce(
               lag(is_list) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
               AS list_run_start
    FROM cls
), agg AS (
    SELECT doc_id,
           sum(CASE WHEN is_heading AND length(fl)
                    - length(replace(fl, '.', '')) >= 1
               THEN 1 ELSE 0 END) AS n_sections,
           sum(CASE WHEN NOT is_heading AND NOT is_list THEN 1
                    WHEN is_heading AND position(chr(10) IN para) > 0
                         AND trim(substr(para,
                             position(chr(10) IN para) + 1)) <> ''
                    THEN 1 ELSE 0 END) AS n_paragraphs,
           sum(CASE WHEN list_run_start THEN 1 ELSE 0 END) AS n_lists
    FROM runs GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_sections, 0) AS BIGINT) AS n_sections,
       CAST(coalesce(a.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
       CAST(coalesce(a.n_lists, 0) AS BIGINT) AS n_lists
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def doc_structure(sf_dir: str):
    """Run the FSM structural parser over the plain-text ``documents``
    corpus: per doc, counts of sections / paragraphs / lists — the
    second corpus exercising the same parse engine as the web pipeline."""
    from ferenda_ray.stages.structure import parse_blocks

    ds = _docs(sf_dir, ["doc_id", "text"])

    def parse(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        secs, paras, lists = [], [], []
        for t in b.column("text").to_pylist():
            tree = parse_blocks(text_blocks(t or ""))

            def count(kind, node):
                return (1 if node.get("kind") == kind else 0) + sum(
                    count(kind, c) for c in node.get("children", []))

            secs.append(count("Section", tree))
            paras.append(count("Paragraph", tree))
            lists.append(count("UnorderedList", tree))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_sections": pa.array(secs, pa.int64()),
            "n_paragraphs": pa.array(paras, pa.int64()),
            "n_lists": pa.array(lists, pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# -- stopword ratio (quality filtering signal; SQL-oracle-checked) ---------

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that", "for",
             "it", "on", "with", "as", "at", "by")


def stopword_scores(sf_dir: str):
    """Per-doc stopword ratio over lowercase alpha tokens — the
    classic fluency/quality signal of corpus filtering pipelines,
    vectorized via polars list kernels."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sw = list(STOPWORDS)

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        toks = pl.col("text").str.to_lowercase().str.extract_all(r"[a-z]+")
        out = df.select(
            pl.col("doc_id"),
            (toks.list.eval(pl.element().is_in(sw)).list.sum()
             .cast(pl.Float64)
             / toks.list.len().cast(pl.Float64)).alias("stopword_ratio"),
        )
        return out.to_arrow()

    return ds.map_batches(score, batch_format="pyarrow")


STOPWORD_SCORES_SQL = """
SELECT doc_id,
       CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                            t -> t IN ('the','and','of','to','a','in','is',
                                       'that','for','it','on','with','as',
                                       'at','by'))) AS DOUBLE)
       / len(regexp_extract_all(lower(text), '[a-z]+')) AS stopword_ratio
FROM documents
"""


# -- tokenization to input ids (training-feed component) -------------------

_BPEISH = __import__("re").compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")
VOCAB_SIZE = 32768


def encode_ids(text: str) -> list[int]:
    """Deterministic token-id encoding: BPE-ish regex tokens hashed into
    a fixed vocab (a stand-in for a real BPE table — none ships here;
    the Ray-side plumbing is what a training feed needs: bounded ids,
    stable across workers/runs). Vocab hash = md5 first-8-bytes
    little-endian mod VOCAB_SIZE — exactly DuckDB's
    ``md5_number_upper(t) % VOCAB_SIZE`` (the SimHash-oracle identity,
    ``ops/dedup.py``), so the encoding is SQL-recomputable."""
    import hashlib

    return [int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                           "little") % VOCAB_SIZE
            for t in _BPEISH.findall(text)]


def tokenize_ids(sf_dir: str, max_len: int = 512):
    """documents → (doc_id, input_ids list<int32>, n_tokens) — the
    tokenize-for-training stage; truncation to max_len, vectorized
    emission, narrow output blocks ready for iter_batches consumption
    by a trainer."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def encode(b: pa.Table) -> pa.Table:
        ids_col, n_col = [], []
        for t in b.column("text").to_pylist():
            ids = encode_ids(t or "")
            n_col.append(len(ids))
            ids_col.append(ids[:max_len])
        return pa.table({
            "doc_id": b.column("doc_id"),
            "input_ids": pa.array(ids_col, pa.list_(pa.int32())),
            "n_tokens": pa.array(n_col, pa.int64()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def tokenize_id_rows(sf_dir: str, max_len: int = 512):
    """Exploded (doc_id, pos, token_id) form of :func:`tokenize_ids` —
    same encoder, one row per (truncated) token. This is the
    driver-oracled evidence for the tokenizer semantics (the list-column
    training feed above stays the consumption format); the SQL oracle
    recomputes the regex tokenization + md5 vocab hash per row."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def encode(b: pa.Table) -> pa.Table:
        import numpy as np

        dids, poss, tids = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            ids = encode_ids(t or "")[:max_len]
            dids.extend([d] * len(ids))
            poss.extend(range(len(ids)))
            tids.extend(ids)
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "token_id": pa.array(tids, pa.int32()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


TOKENIZE_ID_ROWS_SQL = f"""
WITH tok AS (
    SELECT doc_id,
           regexp_extract_all(text,
               '[A-Za-z]+|[0-9]{{1,3}}|[^\\sA-Za-z0-9]') AS toks
    FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, least(len(toks), 512))) AS BIGINT) AS pos,
       unnest(list_transform(toks[1:512],
              t -> CAST(md5_number_upper(t) % {VOCAB_SIZE} AS INT)))
           AS token_id
FROM tok WHERE len(toks) > 0
"""


# -- Gopher-style repetition signals (quality filtering) -------------------

def repetition_scores(sf_dir: str):
    """Per-doc repetition signals of corpus quality filtering (the
    Gopher/Dolma rule family): ``frac_dup_lines`` = 1 − distinct/total
    over newline-split lines, ``frac_top_bigram`` = occurrences of the
    most frequent word-bigram / total bigrams (0 when fewer than two
    ``\\S+`` tokens). Fully vectorized polars (explode + grouped shift,
    no per-row python); definitions mirrored exactly by the SQL
    oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        lines = df.select(
            "doc_id",
            (1.0 - pl.col("text").str.split("\n").list.n_unique()
             / pl.col("text").str.split("\n").list.len())
            .alias("frac_dup_lines"))
        ex = (df.select("doc_id",
                        pl.col("text").str.extract_all(r"\S+").alias("t"))
              .explode("t")
              .with_columns(pl.col("t").shift(-1).over("doc_id")
                            .alias("t2")))
        big = (ex.drop_nulls(["t", "t2"])
               .with_columns((pl.col("t") + " " + pl.col("t2"))
                             .alias("bg"))
               .group_by("doc_id", "bg").len()
               .group_by("doc_id")
               .agg((pl.col("len").max() / pl.col("len").sum())
                    .alias("frac_top_bigram")))
        out = (lines.join(big, on="doc_id", how="left")
               .with_columns(pl.col("frac_top_bigram").fill_null(0.0))
               .sort("doc_id"))
        return out.to_arrow()

    return ds.map_batches(score, batch_format="pyarrow")


REPETITION_SCORES_SQL = """
WITH lines AS (
    SELECT doc_id,
           1.0 - CAST(len(list_distinct(string_split(text, chr(10))))
                      AS DOUBLE)
               / len(string_split(text, chr(10))) AS frac_dup_lines
    FROM documents
), tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '\\S+')) AS t,
           unnest(range(0, len(regexp_extract_all(text, '\\S+')))) AS i
    FROM documents
), bigr AS (
    SELECT a.doc_id, a.t || ' ' || b.t AS bg
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), cnt AS (
    SELECT doc_id, bg, count(*) AS c FROM bigr GROUP BY doc_id, bg
), top AS (
    SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS frac_top_bigram
    FROM cnt GROUP BY doc_id
)
SELECT l.doc_id, l.frac_dup_lines,
       coalesce(t.frac_top_bigram, 0.0) AS frac_top_bigram
FROM lines l LEFT JOIN top t USING (doc_id)
"""


# -- sequence packing (concat-and-chunk training feed) ---------------------

def pack_sequences(sf_dir: str, max_len: int = 512,
                   num_buckets: int = 32):
    """GPT-style concat-and-chunk sequence packing over the tokenized
    corpus: documents in ``doc_id`` order form one global token
    stream, chunked into fixed ``max_len`` training sequences; returns
    the per-sequence summary (seq_id, n_docs contributing, n_tokens).

    Distributed exact prefix-sum without a global sort OR a driver
    row collect (the grouped-quantile offset pattern):

    1. one tokenize pass → per-doc ``n`` (narrow Dataset, materialized
       so the text is tokenized exactly once);
    2. docs bucket by ``doc_id`` RANGE (order-preserving partitioning,
       bounds from a min/max aggregate); per-bucket token sums reduce
       to the driver — O(num_buckets) scalars, never rows;
    3. exclusive bucket offsets broadcast back; each bucket locally
       sorts its docs, cumsums, adds its offset → every doc knows its
       global [start, end) span with no all-to-all exchange;
    4. each doc emits one row per overlapped sequence (pure span
       arithmetic, no token explosion), then a small
       ``groupby(seq_id)`` sum.

    The actual id feed for a trainer is the same spans + a gather of
    ``input_ids`` — layout pinned against a single-process oracle in
    pytest; this summary form is the driver-oracled evidence
    (window-cumsum SQL)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def ntok(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            "doc_id",
            pl.col("text").str.count_matches(
                r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")
            .cast(pl.Int64).alias("n"))
        return df.filter(pl.col("n") > 0).to_arrow()

    counts = ds.map_batches(ntok, batch_format="pyarrow")
    return pack_from_counts(counts, max_len=max_len,
                            num_buckets=num_buckets)


def pack_from_counts(counts, max_len: int = 512, num_buckets: int = 32):
    """The packing core over an already-tokenized ``(doc_id, n)``
    Dataset (n > 0) — reused by :func:`pack_sequences` and the curation
    pipeline; see pack_sequences for the distributed-prefix-sum
    design."""
    import numpy as np
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    counts = counts.materialize()
    bounds = counts.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = bounds["min(doc_id)"], bounds["max(doc_id)"]
    if lo is None or hi is None:  # empty upstream (e.g. gate kept 0
        # docs): Min/Max have no row — emit the typed empty result
        # instead of crashing on int arithmetic over None
        return rd.from_arrow(pa.table({
            "seq_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64())}))
    span = max(1, (hi - lo + num_buckets) // num_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((d - lo) // span, pa.int32()))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")
    per_bucket = {r["bucket"]: r["sum(n)"] for r in
                  bucketed.groupby("bucket").aggregate(Sum("n"))
                  .take_all()}
    offsets, acc = {}, 0
    for bkt in sorted(per_bucket):
        offsets[bkt] = acc
        acc += per_bucket[bkt]
    off_ref = ray.put(offsets)

    def spans(g):
        from ferenda_ray.state import fetch

        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n"].to_numpy()
        start = (fetch(off_ref)[g["bucket"].iloc[0]]
                 + np.concatenate(([0], np.cumsum(n)[:-1])))
        end = start + n
        first = start // max_len
        last = (end - 1) // max_len
        reps = (last - first + 1).astype(np.int64)
        seq = np.concatenate(
            [np.arange(f, l + 1) for f, l in zip(first, last)])
        s = np.repeat(start, reps)
        e = np.repeat(end, reps)
        ntoks = (np.minimum(e, (seq + 1) * max_len)
                 - np.maximum(s, seq * max_len))
        return pd.DataFrame({"seq_id": seq, "n_tokens": ntoks})

    return (bucketed.groupby("bucket")
            .map_groups(spans, batch_format="pandas")
            .groupby("seq_id")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))


PACK_SEQUENCES_SQL = """
WITH tok AS (
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]{1,3}|[^\\sA-Za-z0-9]')) AS n
    FROM documents
), nz AS (
    SELECT doc_id, n FROM tok WHERE n > 0
), ofs AS (
    SELECT doc_id, n,
           CAST(sum(n) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n
                AS BIGINT) AS s
    FROM nz
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


# -- TF-IDF top terms per document (two-pass; df broadcast or join) --------

# Above this many distinct terms the df map stops being broadcast and
# the hash(term)-bucketed cogroup takes over — open-vocabulary web text
# makes term→df itself too large for the driver / worker heaps.
DF_BROADCAST_LIMIT = int(__import__("os").environ.get(
    "FERENDA_RAY_DF_BROADCAST_LIMIT", "5000000"))


def _doc_terms(b: pa.Table) -> pl.DataFrame:
    """(doc_id, term, tf) for one batch — each document is one row, so
    tf is exact within the batch."""
    return (pl.from_arrow(b)
            .select("doc_id",
                    pl.col("text").str.to_lowercase()
                    .str.extract_all(r"[a-z0-9]+").alias("term"))
            .explode("term").drop_nulls()
            .group_by("doc_id", "term").len()
            .select("doc_id", "term",
                    pl.col("len").cast(pl.Int64).alias("tf")))


def tfidf_top_terms(sf_dir: str, k: int = 5,
                    df_broadcast_limit: int | None = None):
    """Top-k most characteristic terms per document by tf·(N/df).

    Two passes over documents.text:

    1. document-frequency aggregation — per-batch *distinct terms per
       doc* (not raw tokens) reduced to term → df with a
       ``groupby(term).count``; the df table is materialized and
       COUNTED, then either broadcast via ``ray.put`` (vocabulary below
       ``DF_BROADCAST_LIMIT``) or kept as a Dataset and hash-bucket
       joined (:func:`_tfidf_scored_join`) — the scale path is the
       default above the threshold, not an opt-in.
    2. scoring — recompute per-doc tf in-batch, join df, score =
       CAST(tf·N AS DOUBLE)/df (integer product then one
       exactly-rounded division, so the DuckDB oracle is bit-equal),
       keep the per-doc top-k (score desc, term asc).

    The raw-token multiset never crosses the wire — only (term, df)
    rows and the final k rows per doc (broadcast path), plus the
    (doc_id, term, tf) triples in the join path's term exchange."""
    import ray
    from ray.data.aggregate import Count

    path = f"{sf_dir}/documents.parquet"

    def distinct_terms(b: pa.Table) -> pa.Table:
        return _doc_terms(b).select("term").to_arrow()

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    df_ds = (ds.map_batches(distinct_terms, batch_format="pyarrow")
             .groupby("term").aggregate(Count(alias_name="df"))
             .materialize())
    n_docs = rd.read_parquet(path, columns=["doc_id"]).count()
    limit = (DF_BROADCAST_LIMIT if df_broadcast_limit is None
             else df_broadcast_limit)
    if df_ds.count() > limit:
        scored = _tfidf_scored_join(
            rd.read_parquet(path, columns=["doc_id", "text"]),
            df_ds, n_docs, k)
        return scored.sort(["doc_id", "term"])

    df_rows = df_ds.take_all()
    df_ref = ray.put(pl.DataFrame(
        {"term": [r["term"] for r in df_rows],
         "df": pl.Series([r["df"] for r in df_rows], dtype=pl.Int64)}))

    def score(b: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        out = (_doc_terms(b)
               .join(dfm, on="term", how="inner")
               .with_columns(((pl.col("tf") * n_docs).cast(pl.Float64)
                              / pl.col("df")).alias("score"))
               .sort(["doc_id", "score", "term"],
                     descending=[False, True, False])
               .group_by("doc_id", maintain_order=True).head(k))
        return out.to_arrow()

    return (rd.read_parquet(path, columns=["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .sort(["doc_id", "term"]))


def _tfidf_scored_join(docs_ds, df_ds, n_docs: int, k: int,
                       num_buckets: int = 32):
    """Open-vocabulary TF-IDF scale path: (doc_id, term, tf) rows
    co-partitioned with the (term, df) Dataset by ``hash(term)`` — one
    narrow shuffle keyed by term, the driver never sees the vocabulary
    — then a per-doc top-k groupby (a doc's terms land in many term
    buckets, so the top-k needs its own doc-keyed exchange). Scores are
    arithmetically identical to the broadcast path
    (tests/test_ops.py)."""
    from ferenda_ray.util import bucket_keys

    def tf_side(b: pa.Table) -> pa.Table:
        t = _doc_terms(b).to_arrow().cast(pa.schema(
            [("doc_id", pa.int64()), ("term", pa.string()),
             ("tf", pa.int64())]))
        n = t.num_rows
        return pa.table({
            "doc_id": t.column("doc_id"),
            "term": t.column("term"),
            "tf": t.column("tf"),
            "df": pa.array([0] * n, pa.int64()),
            "side": pa.array([0] * n, pa.int8()),
            "bucket": pa.array(bucket_keys(t.column("term"), num_buckets),
                               pa.int32()),
        })

    def df_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": pa.array([-1] * n, pa.int64()),
            "term": b.column("term"),
            "tf": pa.array([0] * n, pa.int64()),
            "df": b.column("df").cast(pa.int64()),
            "side": pa.array([1] * n, pa.int8()),
            "bucket": pa.array(bucket_keys(b.column("term"), num_buckets),
                               pa.int32()),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dfm = g[g.side == 1].set_index("term")["df"]
        tf = g[g.side == 0]
        out = tf.assign(df=tf.term.map(dfm).astype("int64"))
        out["score"] = (out.tf * n_docs).astype("float64") / out.df
        return out[["doc_id", "term", "tf", "df", "score"]]

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "term"], ascending=[False, True],
                          kind="mergesort")
        return g.head(k)

    scored = (docs_ds.map_batches(tf_side, batch_format="pyarrow")
              .union(df_ds.map_batches(df_side, batch_format="pyarrow"))
              .groupby("bucket")
              .map_groups(join_bucket, batch_format="pandas"))
    return scored.groupby("doc_id").map_groups(topk, batch_format="pandas")


TFIDF_SQL = """
WITH toks AS (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(tf.tf * (SELECT count(*) FROM documents) AS DOUBLE)
                      / df.df AS score
           FROM tf JOIN df USING (term)),
ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term) AS rn
           FROM scored)
SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 5
ORDER BY doc_id, term
"""


# -- corpus curation: per-language median-quality filter -------------------

def _mtl_ds(sf_dir: str):
    """(doc_id, lang, mean_token_len) — metric formula identical to
    quality_scores / QUALITY_SCORES_SQL so the oracle is bit-equal."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def metric(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        n_chars = pl.col("text").str.len_chars().cast(pl.Float64)
        n_space = pl.col("text").str.count_matches(r"\s").cast(pl.Float64)
        n_tokens = pl.col("text").str.count_matches(r"\S+").cast(pl.Float64)
        return df.select(
            pl.col("doc_id"), pl.col("lang"),
            ((n_chars - n_space) / n_tokens).alias("mean_token_len"),
        ).to_arrow()

    return ds.map_batches(metric, batch_format="pyarrow")


def curate_documents(sf_dir: str):
    """Training-corpus curation: keep documents whose quality metric
    exceeds their own language's median — the per-group-threshold
    filter every large-corpus pipeline runs (quality-classifier score >
    per-language cutoff).  Composition: exact per-group median via the
    histogram-refinement quantile op (no global sort), thresholds
    broadcast, then a stateless per-batch filter."""
    import ray

    from ferenda_ray.ops.sketch import exact_grouped_quantiles

    med = exact_grouped_quantiles(lambda: _mtl_ds(sf_dir),
                                  "lang", "mean_token_len", [0.5])
    cutoff = ray.put(dict(zip(med["lang"], med["p50"])))

    def keep(b: pa.Table) -> pa.Table:
        cut = ray.get(cutoff)
        df = pl.from_arrow(b)
        thr = pl.Series([cut[g] for g in df["lang"]])
        return df.filter(pl.col("mean_token_len") > thr).to_arrow()

    return (_mtl_ds(sf_dir)
            .map_batches(keep, batch_format="pyarrow")
            .sort("doc_id"))


CURATE_DOCUMENTS_SQL = """
WITH m AS (SELECT doc_id, lang,
                  length(regexp_replace(text, '\\s', '', 'g'))
                      / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)
                      AS mean_token_len
           FROM documents),
med AS (SELECT lang, quantile_disc(mean_token_len, 0.5) AS cut
        FROM m GROUP BY lang)
SELECT m.doc_id, m.lang, m.mean_token_len
FROM m JOIN med USING (lang)
WHERE m.mean_token_len > med.cut
ORDER BY m.doc_id
"""


# -- TextReader surface (reference textreader.py:11-352) --------------------

# re.ASCII pins \w/\s to the ASCII classes so the operator is
# bit-identical to the DuckDB RE2 oracle (RE2's \w/\s are ASCII-only;
# Python's default Unicode classes would join "café-\nlatte" where the
# SQL recompute does not).
_HYPHEN_WRAP = re.compile(r"(\w)-\n(\w)", re.ASCII)
_SOFT_WRAP = re.compile(r"(?<=\S)\n(?=\S)", re.ASCII)


def dehyphenate(text: str) -> str:
    """Join words hard-hyphenated across line breaks ("exam-\\nple" →
    "example"; reference TextReader linesep handling)."""
    return _HYPHEN_WRAP.sub(r"\1\2", text)


def dewrap(text: str) -> str:
    """Unwrap hard line-wrapped paragraphs: single newlines inside a
    paragraph become spaces, blank-line paragraph breaks are kept
    (reference ``TextReader.readparagraph`` unit semantics)."""
    return _SOFT_WRAP.sub(" ", dehyphenate(text))


def text_pages(text: str, page_break: str = "\f") -> list[str]:
    """Page-based iteration (reference ``TextReader.getiterator(
    readpage)``): split on form-feed, preserving page order; empty
    trailing pages dropped."""
    pages = text.split(page_break)
    while pages and not pages[-1].strip():
        pages.pop()
    return pages


def doc_pages(sf_dir: str):
    """Flat-map documents into (doc_id, page_no, dewrapped page text)
    rows — the reference's page-iterating TextReader consumption shape
    over the documents table."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def flat(b: pa.Table) -> pa.Table:
        ids, pnos, texts = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            for i, page in enumerate(text_pages(t)):
                ids.append(d)
                pnos.append(i)
                texts.append(dewrap(page))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "page_no": pa.array(pnos, pa.int32()),
                         "text": pa.array(texts, pa.large_string())})

    return ds.map_batches(flat, batch_format="pyarrow")


# doc_pages recomputed in SQL: form-feed split with ordinality,
# trailing-blank pages dropped (keep page_no ≤ last non-blank page),
# then dewrap = dehyphenate + soft-unwrap. The hyphen replace runs
# ONCE — Python dehyphenate() is a single consuming pass, so a chained
# wrap "x-\ny-\nz" must stay "xy-\nz" (a second pass would yield "xyz"
# and diverge). The soft-unwrap runs TWICE: the Python pattern is
# lookaround-based (non-consuming) and RE2 has no lookaround, so the
# capture-group emulation consumes the boundary chars — pass 1 leaves
# alternate newlines of a chain "a\nb\nc\nd", pass 2 clears them (any
# chain length resolves in two). Python classes are re.ASCII-pinned to
# RE2's ASCII \w/\s (see _HYPHEN_WRAP above).
_DEWRAP_SQL = (
    "regexp_replace(regexp_replace(regexp_replace("
    "{x}, '(\\w)-\\n(\\w)', '\\1\\2', 'g'), "
    "'(\\S)\\n(\\S)', '\\1 \\2', 'g'), "
    "'(\\S)\\n(\\S)', '\\1 \\2', 'g')")

DOC_PAGES_SQL = f"""
WITH pg AS (
    SELECT doc_id,
           unnest(string_split(text, chr(12))) AS ptext,
           unnest(range(0, len(string_split(text, chr(12))))) AS page_no
    FROM documents
), last_nonblank AS (
    SELECT doc_id, max(page_no) AS last_pg FROM pg
    WHERE regexp_matches(ptext, '\\S') GROUP BY doc_id
)
SELECT p.doc_id, CAST(p.page_no AS INTEGER) AS page_no,
       {_DEWRAP_SQL.format(x="p.ptext")} AS text
FROM pg p JOIN last_nonblank l
    ON l.doc_id = p.doc_id AND p.page_no <= l.last_pg
"""


# -- linear quality classifier (fasttext-classifier slot) ------------------

# Fixed published weights (no training in-env): favors prose-like docs —
# high stopword ratio, moderate token length, low digit density.
# SINGLE SOURCE OF TRUTH for the quality features: the polars
# pre-activation (quality_z_expr), the SQL feature block
# (quality_features_sql) and the SQL score expression
# (QUALITY_SCORE_SQL) are defined exactly once here and imported by
# quality_classifier, sample.curriculum_deciles and the
# pipelines.curate gate — one edited weight can no longer drift.
_QC_W = {"stopword_ratio": 6.0, "mean_token_len": 0.35,
         "digit_ratio": -8.0, "frac_dup_lines": -4.0}
_QC_B = -1.9   # calibrated so ~half the synthetic web corpus passes


def quality_z_expr() -> pl.Expr:
    """Polars expression for the logistic pre-activation
    ``z = b + w·x`` over the four text features (expects a ``text``
    column); score = ``1/(1+exp(-z))``."""
    sw = list(STOPWORDS)
    alpha = pl.col("text").str.to_lowercase().str.extract_all(r"[a-z]+")
    n_chars = pl.col("text").str.len_chars().cast(pl.Float64)
    n_space = pl.col("text").str.count_matches(r"\s").cast(pl.Float64)
    n_tok = pl.col("text").str.count_matches(r"\S+").cast(pl.Float64)
    return (pl.lit(_QC_B)
            + (alpha.list.eval(pl.element().is_in(sw)).list.sum()
               .cast(pl.Float64) / alpha.list.len().cast(pl.Float64))
            .fill_nan(0.0) * _QC_W["stopword_ratio"]
            + ((n_chars - n_space) / n_tok) * _QC_W["mean_token_len"]
            + (pl.col("text").str.count_matches(r"[0-9]")
               .cast(pl.Float64) / n_chars) * _QC_W["digit_ratio"]
            + (1.0 - pl.col("text").str.split("\n").list.n_unique()
               / pl.col("text").str.split("\n").list.len())
            * _QC_W["frac_dup_lines"])


def quality_features_sql(cols: str = "doc_id",
                         src: str = "documents") -> str:
    """SQL block computing the four features over ``src`` (a table or
    CTE name with a ``text`` column), carrying ``cols`` through (e.g.
    ``"doc_id"`` or ``"doc_id, source, text"``)."""
    sw = ",".join(f"'{t}'" for t in sorted(STOPWORDS))
    return f"""
    SELECT {cols},
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
    FROM {src}"""


# the sigmoid over the weighted features — interpolated from _QC_W/_QC_B
QUALITY_SCORE_SQL = (
    f"1.0 / (1.0 + exp(-({_QC_B}"
    f" + stopword_ratio * {_QC_W['stopword_ratio']}"
    f" + mean_token_len * {_QC_W['mean_token_len']}"
    f" + digit_ratio * {_QC_W['digit_ratio']}"
    f" + frac_dup_lines * {_QC_W['frac_dup_lines']})))")


def quality_classifier(sf_dir: str):
    """Model-based quality gate — the fasttext/CCNet classifier slot of
    LLM-data pipelines: ``score = sigmoid(w·x + b)`` over deterministic
    text features (stopword ratio, mean token length, digit density,
    duplicate-line fraction), ``keep = score >= 0.5``. Weights are fixed
    constants (this environment has no training data or model libs;
    swapping in learned weights is a one-dict change — the Ray stage
    shape, single pass, is what matters). One vectorized pass per
    batch, no shuffle; every feature and the logistic are recomputed
    exactly by the SQL oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    def score(b: pa.Table) -> pa.Table:
        z = quality_z_expr()
        return (pl.from_arrow(b)
                .select("doc_id",
                        (1.0 / (1.0 + (-z).exp())).alias("quality_score"))
                .with_columns((pl.col("quality_score") >= 0.5)
                              .alias("keep"))
                .to_arrow())

    return ds.map_batches(score, batch_format="pyarrow")


QUALITY_CLASSIFIER_SQL = f"""
WITH f AS ({quality_features_sql("doc_id")}
)
SELECT doc_id,
       {QUALITY_SCORE_SQL} AS quality_score,
       {QUALITY_SCORE_SQL} >= 0.5 AS keep
FROM f
"""


# -- unigram-LM cross-entropy scoring (perplexity-filter slot) -------------

def _bsp_doc_scores(partials, columns: list[str], score_bucket, finish,
                    num_buckets: int, prefix: str):
    """Token-bucket cogroup on the BSP disk tier (the
    ``dedup._verified_pairs`` pattern) shared by :func:`lm_cross_entropy`
    and :func:`dsir_scores` — token-level partials NEVER sit in the Ray
    object store and the scalar aggregates ride along as sidecars
    instead of re-traversing the partials:

    1. hive-write the (pre-collapsed) token partials by ``bucket`` —
       ONE streaming pass over text, straight to the stage tier;
    2. one ray task per bucket: ``score_bucket(df) → (per-doc partial
       frame (doc_id, s, n), scalar sidecar dict)``; the frame is
       exchanged by ``doc_id % B`` via :func:`bsp.write_partials`, the
       sidecars (bucket-local token/vocab totals) return to the driver
       and sum — constant driver state, no second traversal;
    3. one ray task per doc-bucket: fragments → per-doc (s, n) sums →
       ``finish(df, scalars)`` applies the scalar closing formula;
       results publish as a lazy Dataset (``bsp.publish_dataset``).

    Both exchanges move only skinny pre-aggregated rows; per-(doc,t)
    collapse in step 1 bounds any token's rows by #docs."""
    import shutil

    import ray
    from ferenda_ray.bsp import (publish_dataset, read_hive_bucket,
                                 read_partials, stage_root,
                                 write_partials)

    root = stage_root(prefix)
    try:
        partials.write_parquet(os.path.join(root, "tok"),
                               partition_cols=["bucket"])

        @ray.remote
        def bucket_task(b: int) -> dict:
            t = read_hive_bucket(root, "tok", "bucket", b, columns)
            if t is None or not t.num_rows:
                return {}
            df, scal = score_bucket(t.to_pandas())
            df["db"] = (df["doc_id"].to_numpy()
                        % num_buckets).astype("int32")
            write_partials(root, "doc", b, df, "db")
            return scal

        sides = ray.get([bucket_task.remote(b)
                         for b in range(num_buckets)])
        scalars: dict = {}
        for s in sides:
            for k, v in s.items():
                scalars[k] = scalars.get(k, 0) + v

        @ray.remote
        def doc_task(db: int) -> str:
            import pyarrow.parquet as pq

            g = read_partials(root, "doc", db)
            if g is None:
                out = pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "s": pd.Series([], dtype="float64"),
                     "n": pd.Series([], dtype="int64")})
            else:
                out = (g.groupby("doc_id", as_index=False)
                       .agg(s=("s", "sum"), n=("n", "sum"))
                       .astype({"doc_id": "int64", "s": "float64",
                                "n": "int64"}))
            path = os.path.join(root, f"scored-{db:05d}.parquet")
            pq.write_table(pa.Table.from_pandas(finish(out, scalars),
                                                preserve_index=False),
                           path)
            return path

        files = ray.get([doc_task.remote(db)
                         for db in range(num_buckets)])
        return publish_dataset(root, files, prefix + "_out")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def lm_cross_entropy(sf_dir: str):
    """Per-doc cross-entropy under the corpus unigram LM — the
    CCNet/Dolma perplexity-filter slot (there a KenLM model; here the
    corpus's own unigram distribution, which needs no external model):
    ``H(doc) = ln(N) − (Σ_t n_t·ln(c_t)) / n_doc`` over lowercase
    alpha tokens, where ``c_t`` is the corpus count of token ``t`` and
    ``N`` the corpus token total.

    Distributed shape = :func:`_bsp_doc_scores` — NO vocabulary
    broadcast (the df-map trap), token partials on the disk tier (never
    object-store-pinned), and ``N`` folded into the bucket pass as a
    scalar sidecar instead of a second traversal. Inside each bucket
    task a vectorized token-groupby yields every token's global ``c_t``
    (a token's rows all land in its bucket), immediately consumed as
    per-doc contributions ``n·ln(c_t)``; the count table never exists
    as a driver/broadcast object. Float note: per-doc sums of
    ~10-magnitude ln terms keep accumulation error ~1e-13, far inside
    the oracle gate's 1e-6 rounding."""
    import numpy as np

    num_buckets = 32
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        g = (df.select("doc_id",
                       pl.col("text").str.to_lowercase()
                       .str.extract_all(r"[a-z]+").alias("t"))
             .explode("t").drop_nulls("t")
             .group_by("doc_id", "t").len().rename({"len": "n"})
             .with_columns(pl.col("n").cast(pl.Int64)))
        # vectorized within-job-stable bucket hash (co-locates a
        # token's rows; nothing persisted depends on it)
        g = g.with_columns(
            (pl.col("t").hash(42) % num_buckets)
            .cast(pl.Int32).alias("bucket"))
        return g.to_arrow()

    def score_bucket(g: pd.DataFrame):
        c = g.groupby("t")["n"].transform("sum").to_numpy()
        part = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "s": g["n"].to_numpy() * np.log(c.astype(np.float64)),
            "n": g["n"].to_numpy(),
        })
        out = (part.groupby("doc_id", as_index=False)
               .agg(s=("s", "sum"), n=("n", "sum"))
               .astype({"doc_id": "int64", "s": "float64",
                        "n": "int64"}))
        return out, {"N": int(g["n"].sum())}

    def finish(df: pd.DataFrame, scal: dict) -> pd.DataFrame:
        logN = float(np.log(max(scal.get("N", 0), 1)))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "cross_entropy": logN - df["s"] / df["n"]})

    return _bsp_doc_scores(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["doc_id", "t", "n"], score_bucket, finish,
        num_buckets, "ferenda_lmce")


LM_CROSS_ENTROPY_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
    FROM documents
), grouped AS (
    SELECT doc_id, t, count(*) AS n FROM tok GROUP BY doc_id, t
), cnt AS (
    SELECT t, CAST(sum(n) AS BIGINT) AS c FROM grouped GROUP BY t
), tot AS (
    SELECT CAST(sum(n) AS BIGINT) AS N FROM grouped
), per AS (
    SELECT g.doc_id, sum(g.n * ln(cnt.c)) AS s,
           CAST(sum(g.n) AS BIGINT) AS n
    FROM grouped g JOIN cnt USING (t) GROUP BY g.doc_id
)
SELECT doc_id, ln((SELECT N FROM tot)) - s / n AS cross_entropy
FROM per
"""


# -- DSIR importance scoring (data selection for language models) ----------

DSIR_TARGET = "src0"  # the target-domain source slice


def dsir_scores(sf_dir: str, target_source: str = DSIR_TARGET):
    """Per-doc DSIR importance weight (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): for every
    NON-target doc, ``w(doc) = Σ_t n_t · (ln p̂_target(t) − ln
    p̂_raw(t))`` under add-one-smoothed unigram LMs of the target slice
    (``source == target_source``) vs the rest of the corpus. Positive
    weight = more target-like than raw-like; a trainer resamples
    top-weighted docs (the sampling step is ``ops/sample.py``'s job —
    this operator is the distributed scorer).

    Distributed shape = the :func:`_bsp_doc_scores` token-bucket
    cogroup on the disk tier: per-batch (doc, t, n, is_target)
    partials hive-written by hash(t) bucket (never object-store
    pinned), one bucket task sees every token's global target and raw
    counts and immediately folds them into per-doc partial sums, a
    bucketed doc-sum, then a scalar finish. The smoothing denominators
    ln(N+V) are per-doc multiples of n_doc, and V (global
    distinct-token count, exact — each token lives in exactly one
    bucket) plus the two N's ride back from the bucket pass as sidecar
    scalars; no vocabulary ever concentrates and the partials are
    never re-traversed."""
    import numpy as np

    num_buckets = 32
    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        g = (df.select("doc_id",
                       (pl.col("source") == target_source)
                       .alias("is_target"),
                       pl.col("text").str.to_lowercase()
                       .str.extract_all(r"[a-z]+").alias("t"))
             .explode("t").drop_nulls("t")
             .group_by("doc_id", "is_target", "t").len()
             .rename({"len": "n"})
             .with_columns(pl.col("n").cast(pl.Int64)))
        g = g.with_columns(
            (pl.col("t").hash(42) % num_buckets)
            .cast(pl.Int32).alias("bucket"))
        return g.to_arrow()

    def score_bucket(g: pd.DataFrame):
        c_tgt = (g["n"].where(g["is_target"], 0)
                 .groupby(g["t"]).transform("sum").to_numpy())
        c_raw = (g["n"].where(~g["is_target"], 0)
                 .groupby(g["t"]).transform("sum").to_numpy())
        raw = ~g["is_target"].to_numpy()
        n = g["n"].to_numpy()[raw]
        part = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[raw],
            "s": n * (np.log(c_tgt[raw] + 1.0)
                      - np.log(c_raw[raw] + 1.0)),
            "n": n,
        })
        out = (part.groupby("doc_id", as_index=False)
               .agg(s=("s", "sum"), n=("n", "sum"))
               .astype({"doc_id": "int64", "s": "float64",
                        "n": "int64"}))
        return out, {"n_tgt": int(g["n"][g["is_target"]].sum()),
                     "n_raw": int(g["n"][~g["is_target"]].sum()),
                     "v": int(g["t"].nunique())}

    def finish(df: pd.DataFrame, scal: dict) -> pd.DataFrame:
        # constant smoothing term: n_doc·(ln(N_raw+V) − ln(N_tgt+V))
        v = scal.get("v", 0)
        const = float(np.log(max(scal.get("n_raw", 0) + v, 1))
                      - np.log(max(scal.get("n_tgt", 0) + v, 1)))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "dsir_weight": df["s"] + df["n"] * const})

    return _bsp_doc_scores(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["doc_id", "is_target", "t", "n"], score_bucket, finish,
        num_buckets, "ferenda_dsir")


DSIR_SCORES_SQL = f"""
WITH tok AS (
    SELECT doc_id, source = '{DSIR_TARGET}' AS is_target,
           unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
    FROM documents
), grouped AS (
    SELECT doc_id, is_target, t, count(*) AS n
    FROM tok GROUP BY doc_id, is_target, t
), cnt AS (
    SELECT t,
           CAST(sum(CASE WHEN is_target THEN n ELSE 0 END) AS BIGINT)
               AS c_tgt,
           CAST(sum(CASE WHEN is_target THEN 0 ELSE n END) AS BIGINT)
               AS c_raw
    FROM grouped GROUP BY t
), scal AS (
    SELECT CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
           CAST(sum(c_raw) AS BIGINT) AS n_raw,
           CAST(count(*) AS BIGINT) AS v
    FROM cnt
)
SELECT g.doc_id,
       sum(g.n * (ln(cnt.c_tgt + 1.0) - ln(cnt.c_raw + 1.0)))
       + CAST(sum(g.n) AS BIGINT)
         * (ln((SELECT n_raw + v FROM scal))
            - ln((SELECT n_tgt + v FROM scal))) AS dsir_weight
FROM grouped g JOIN cnt USING (t)
WHERE NOT g.is_target
GROUP BY g.doc_id
"""


# -- collocation mining (bigram PMI) ----------------------------------------

def bigram_pmi(sf_dir: str, min_count: int = 5, num_buckets: int = 32):
    """Corpus-level collocations: every adjacent word bigram occurring
    ≥ ``min_count`` times, with its pointwise mutual information under
    the bigram-margin model ``pmi = ln(c₁₂·B / (c₁·c₂))`` where ``c₁``
    / ``c₂`` are the bigram-stream margins (occurrences as first /
    second element) and ``B`` the total bigram count. Margins rather
    than unigram counts keep the whole operator a single pass over the
    text; the ``min_count`` filter applies AFTER the margins, so the
    reported pmi is exact over the full stream.

    BSP shape (three skinny exchanges on the disk tier, text read
    once):

    1. per-batch polars bigram partial counts hive-written by
       ``hash(w1,w2)`` bucket — token-level data never pins the object
       store (``bsp.spill``-family discipline);
    2. one task per pair-bucket: exact bigram counts (each pair lives
       in exactly one bucket); margin partials mailed to ``hash(w)``
       token buckets, survivors (c ≥ min_count) mailed to ``hash(w1)``;
       the bucket-local total rides back as a sidecar scalar;
    3. one task per token-bucket attaches ``c1`` to survivors and
       forwards by ``hash(w2)``; a second wave attaches ``c2`` and
       closes the formula. Every exchanged row is pre-aggregated;
       margin volume is bounded by vocabulary, survivor volume by the
       min_count filter."""
    import numpy as np
    import ray

    from ferenda_ray.bsp import (publish_dataset, read_hive_bucket,
                                 read_partials, stage_root,
                                 write_partials)

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        ex = (df.select("doc_id",
                        pl.col("text").str.to_lowercase()
                        .str.extract_all(r"[a-z]+").alias("t"))
              .explode("t").drop_nulls("t")
              .with_columns(pl.col("t").shift(-1).over("doc_id")
                            .alias("t2"))
              .drop_nulls("t2"))
        g = (ex.group_by("t", "t2").len().rename(
                {"t": "w1", "t2": "w2", "len": "c"})
             .with_columns(pl.col("c").cast(pl.Int64)))
        g = g.with_columns(
            ((pl.col("w1").hash(7) ^ pl.col("w2").hash(13))
             % num_buckets).cast(pl.Int32).alias("bucket"))
        return g.to_arrow()

    def tok_bucket(arr, seed: int):
        import polars as pl_

        return ((pl_.Series(arr).hash(seed) % num_buckets)
                .cast(pl_.Int32).to_numpy())

    root = stage_root("ferenda_pmi")
    try:
        (ds.map_batches(partial, batch_format="pyarrow")
         .write_parquet(os.path.join(root, "big"),
                        partition_cols=["bucket"]))

        @ray.remote
        def pair_task(b: int) -> int:
            t = read_hive_bucket(root, "big", "bucket", b,
                                 ["w1", "w2", "c"])
            if t is None or not t.num_rows:
                return 0
            cnt = (t.to_pandas().groupby(["w1", "w2"], as_index=False,
                                         sort=True)["c"].sum())
            for col, tag in (("w1", "m1"), ("w2", "m2")):
                m = cnt.groupby(col, as_index=False, sort=True)["c"].sum()
                m.columns = ["w", "c"]
                m["tb"] = tok_bucket(m["w"].to_numpy(), 21)
                write_partials(root, tag, b, m, "tb")
            surv = cnt[cnt["c"] >= min_count].copy()
            if len(surv):
                surv["tb"] = tok_bucket(surv["w1"].to_numpy(), 21)
                write_partials(root, "sv1", b, surv, "tb")
            return int(cnt["c"].sum())

        b_total = sum(ray.get([pair_task.remote(b)
                               for b in range(num_buckets)]))

        @ray.remote
        def attach1(tb: int) -> None:
            sv = read_partials(root, "sv1", tb)
            if sv is None:
                return
            m1 = (read_partials(root, "m1", tb)
                  .groupby("w", sort=True)["c"].sum())
            sv["c1"] = m1.reindex(sv["w1"]).to_numpy().astype("int64")
            sv["tb2"] = tok_bucket(sv["w2"].to_numpy(), 21)
            write_partials(root, "sv2", tb,
                           sv[["w1", "w2", "c", "c1", "tb2"]], "tb2")

        ray.get([attach1.remote(tb) for tb in range(num_buckets)])

        @ray.remote
        def attach2(tb: int) -> str:
            sv = read_partials(root, "sv2", tb)
            if sv is None:
                sv = pd.DataFrame(
                    {"w1": pd.Series([], dtype="object"),
                     "w2": pd.Series([], dtype="object"),
                     "c": pd.Series([], dtype="int64"),
                     "c1": pd.Series([], dtype="int64")})
                sv["c2"] = pd.Series([], dtype="int64")
            else:
                m2 = (read_partials(root, "m2", tb)
                      .groupby("w", sort=True)["c"].sum())
                sv["c2"] = (m2.reindex(sv["w2"]).to_numpy()
                            .astype("int64"))
            out = pd.DataFrame({
                "w1": sv["w1"], "w2": sv["w2"],
                "n_pair": sv["c"].astype("int64"),
                # same association order as the SQL oracle:
                # (c·B) / (c1·c2)
                "pmi": np.log(sv["c"].to_numpy().astype("float64")
                              * float(b_total)
                              / (sv["c1"].to_numpy().astype("float64")
                                 * sv["c2"].to_numpy()
                                 .astype("float64"))),
            })
            import pyarrow.parquet as pq_

            path = os.path.join(root, f"pmi-{tb:05d}.parquet")
            pq_.write_table(pa.Table.from_pandas(out,
                                                 preserve_index=False),
                            path)
            return path

        files = ray.get([attach2.remote(tb)
                         for tb in range(num_buckets)])
        return publish_dataset(root, files, "ferenda_pmi_out")
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


BIGRAM_PMI_SQL = """
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t,
           unnest(range(0, len(regexp_extract_all(lower(text),
                                                  '[a-z]+')))) AS i
    FROM documents
), bigr AS (
    SELECT a.t AS w1, b.t AS w2
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), cnt AS (
    SELECT w1, w2, count(*) AS c FROM bigr GROUP BY w1, w2
), m1 AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM cnt GROUP BY w1
), m2 AS (
    SELECT w2, CAST(sum(c) AS BIGINT) AS c2 FROM cnt GROUP BY w2
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS bt FROM cnt
)
SELECT cnt.w1, cnt.w2, CAST(cnt.c AS BIGINT) AS n_pair,
       ln(CAST(cnt.c AS DOUBLE) * (SELECT bt FROM tot)
          / (CAST(c1 AS DOUBLE) * c2)) AS pmi
FROM cnt JOIN m1 USING (w1) JOIN m2 USING (w2)
WHERE cnt.c >= 5
"""


# -- Gopher quality rules (Rae et al. 2021) ---------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def normalize_docs(sf_dir: str):
    """Unicode + whitespace normalization per document — the CCNet/C4
    pre-pass every corpus pipeline runs before tokenization. The spec
    is frozen by the twin RE2 recompute in :data:`NORMALIZE_DOCS_SQL`
    (applied in the SAME rule order):

    1. delete C0 controls + DEL (TAB/LF/CR excluded: TAB is consumed
       by rule 4, CR by rule 3). This runs FIRST because DuckDB's
       ``nfc_normalize`` C-string-truncates at an embedded NUL;
       controls are canonically inert, so the order doesn't change
       the NFC result
    2. NFC normalization
    3. CR and CRLF → LF
    4. runs of spaces/tabs → one space
    5. blanks around newlines stripped
    6. leading/trailing whitespace trimmed

    Rules 2-6 are vectorized Arrow kernels (``replace_substring_
    regex``) — zero exchanges, zero Python rows. Rule 1 cannot be:
    pyarrow 16's ``utf8_normalize(form="NFC")`` decomposes but never
    COMPOSES (verified: e+U+0301 stays decomposed while DuckDB's
    ``nfc_normalize`` composes), so NFC takes a two-tier path — a
    vectorized ``string_is_ascii`` mask skips the (overwhelming at
    web scale) ASCII rows, and only the non-ASCII minority pays one
    ``unicodedata.normalize`` C call each. Still an embarrassingly
    parallel streaming map at 100 TB."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        import unicodedata

        import pyarrow.compute as pc

        raw = b.column("text")
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        x = pc.replace_substring_regex(
            raw, pattern=r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]",
            replacement="")
        nonascii = pc.fill_null(
            pc.invert(pc.string_is_ascii(x)), False)
        if pc.any(nonascii).as_py():
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            sub = pc.take(x, pc.indices_nonzero(nonascii)).to_pylist()
            x = pc.replace_with_mask(
                x, nonascii,
                pa.array([unicodedata.normalize("NFC", v)
                          for v in sub], x.type))
        x = pc.replace_substring_regex(x, pattern=r"\r\n?",
                                       replacement="\n")
        x = pc.replace_substring_regex(x, pattern=r"[ \t]+",
                                       replacement=" ")
        x = pc.replace_substring_regex(x, pattern=r"[ ]*\n[ ]*",
                                       replacement="\n")
        x = pc.replace_substring_regex(x, pattern=r"^[ \n]+|[ \n]+$",
                                       replacement="")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": x,
            "changed": pc.invert(pc.equal(x, raw)),
            "n_chars": pc.cast(pc.utf8_length(x), pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


NORMALIZE_DOCS_SQL = r"""
WITH n AS (
  SELECT doc_id, text AS raw,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            nfc_normalize(regexp_replace(text,
              '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')),
            '\r\n?', chr(10), 'g'),
          '[ \t]+', ' ', 'g'),
        '[ ]*\n[ ]*', chr(10), 'g'),
      '^[ \n]+|[ \n]+$', '', 'g') AS norm
  FROM documents)
SELECT doc_id, norm AS text, (norm <> raw) AS changed,
  CAST(length(norm) AS BIGINT) AS n_chars
FROM n
"""


def gopher_rules(sf_dir: str):
    """Gopher-style repetition-free quality heuristics per document
    (Rae et al. 2021 §A1.1), the rule pack most large-corpus curation
    stacks start from. Every rule is evaluated in EXACT integer
    arithmetic (threshold ratios become cross-multiplications), so the
    row hashes identically to the SQL recompute:

    - ``rule_len``        50 ≤ n_tokens ≤ 100 000
    - ``rule_mean_wlen``  3 ≤ mean word length ≤ 10
                          (3·n_tokens ≤ nospace_chars ≤ 10·n_tokens)
    - ``rule_symbol``     (#-chars + ellipses) / words ≤ 0.1
    - ``rule_bullet``     ≤ 90% of lines start with a bullet
    - ``rule_ellipsis``   ≤ 30% of lines end with an ellipsis
    - ``rule_alpha``      ≥ 80% of words contain an alphabetic char
    - ``rule_stopwords``  ≥ 2 distinct Gopher stop words appear as
                          whole tokens (exact token equality, not \\b —
                          RE2's ASCII \\b and Rust's Unicode \\b
                          diverge on accented neighbours)
    - ``keep``            conjunction of all seven

    Stateless vectorized batch map over a pruned two-column read; at
    100 TB this is embarrassingly parallel with zero exchanges."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rules(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        t = pl.col("text")
        n_tok = t.str.count_matches(
            r"[^\t\n\x0b\x0c\r ]+").cast(pl.Int64)
        nosp = (t.str.len_chars()
                - t.str.count_matches(
                    r"[\t\n\x0b\x0c\r ]")).cast(pl.Int64)
        n_sym = (t.str.count_matches("#", literal=True)
                 + t.str.count_matches(r"\.\.\.|…")).cast(pl.Int64)
        n_lines = (t.str.count_matches("\n", literal=True)
                   + 1).cast(pl.Int64)
        n_bullet = t.str.count_matches(
            r"(?m)^[ \t]*[-*•]").cast(pl.Int64)
        n_ellend = t.str.count_matches(
            r"(?m)(\.\.\.|…)$").cast(pl.Int64)
        n_alpha = t.str.count_matches(
            r"[^\t\n\x0b\x0c\r ]*[A-Za-z]"
            r"[^\t\n\x0b\x0c\r ]*").cast(pl.Int64)
        toks = t.str.to_lowercase().str.extract_all(
            r"[^\t\n\x0b\x0c\r ]+")
        n_stop = sum(
            toks.list.contains(w).cast(pl.Int64)
            for w in _GOPHER_STOPS).cast(pl.Int64)
        out = df.select(
            pl.col("doc_id"),
            n_tok.alias("n_tokens"),
            n_lines.alias("n_lines"),
            ((n_tok >= 50) & (n_tok <= 100_000)).alias("rule_len"),
            ((3 * n_tok <= nosp)
             & (nosp <= 10 * n_tok)).alias("rule_mean_wlen"),
            (10 * n_sym <= n_tok).alias("rule_symbol"),
            (10 * n_bullet <= 9 * n_lines).alias("rule_bullet"),
            (10 * n_ellend <= 3 * n_lines).alias("rule_ellipsis"),
            (10 * n_alpha >= 8 * n_tok).alias("rule_alpha"),
            (n_stop >= 2).alias("rule_stopwords"),
        )
        out = out.with_columns(
            (pl.col("rule_len") & pl.col("rule_mean_wlen")
             & pl.col("rule_symbol") & pl.col("rule_bullet")
             & pl.col("rule_ellipsis") & pl.col("rule_alpha")
             & pl.col("rule_stopwords")).alias("keep"))
        return out.to_arrow()

    return ds.map_batches(rules, batch_format="pyarrow")


_NSP_SQL = "[^\\t\\n\\x0b\\x0c\\r ]"


def _gopher_stop_sql(w: str) -> str:
    return (f"CAST(len(list_filter(regexp_extract_all(lower(text), "
            f"'{_NSP_SQL}+'), x -> x = '{w}')) > 0 AS BIGINT)")


GOPHER_RULES_SQL = f"""
WITH f AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '{_NSP_SQL}+')) AS n_tok,
    length(regexp_replace(text, '[\\t\\n\\x0b\\x0c\\r ]', '', 'g'))
        AS nosp,
    (length(text) - length(replace(text, '#', ''))
     + len(regexp_extract_all(text, '\\.\\.\\.|…'))) AS n_sym,
    (1 + length(text) - length(replace(text, chr(10), ''))) AS n_lines,
    len(regexp_extract_all(text, '(?m)^[ \\t]*[-*•]')) AS n_bullet,
    len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$')) AS n_ellend,
    len(regexp_extract_all(text,
        '{_NSP_SQL}*[A-Za-z]{_NSP_SQL}*')) AS n_alpha,
    ({' + '.join(_gopher_stop_sql(w) for w in _GOPHER_STOPS)}) AS n_stop
  FROM documents)
SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(n_lines AS BIGINT) AS n_lines,
  (n_tok >= 50 AND n_tok <= 100000) AS rule_len,
  (3 * n_tok <= nosp AND nosp <= 10 * n_tok) AS rule_mean_wlen,
  (10 * n_sym <= n_tok) AS rule_symbol,
  (10 * n_bullet <= 9 * n_lines) AS rule_bullet,
  (10 * n_ellend <= 3 * n_lines) AS rule_ellipsis,
  (10 * n_alpha >= 8 * n_tok) AS rule_alpha,
  (n_stop >= 2) AS rule_stopwords,
  (n_tok >= 50 AND n_tok <= 100000
   AND 3 * n_tok <= nosp AND nosp <= 10 * n_tok
   AND 10 * n_sym <= n_tok
   AND 10 * n_bullet <= 9 * n_lines
   AND 10 * n_ellend <= 3 * n_lines
   AND 10 * n_alpha >= 8 * n_tok
   AND n_stop >= 2) AS keep
FROM f
"""


def quality_budget_head(sf_dir: str, budget_tokens: int = 15_000,
                        id_buckets: int = 16):
    """Token-budgeted corpus selection (the "fill the training budget
    with the best docs first" cut every mixture recipe ends with):
    order documents by Gopher rule pass-count descending (exact 0-7
    integer — float quality scores would make the cut order
    hash-fragile), break ties by doc_id, and keep documents while the
    running token total stays within ``budget_tokens``. Returns the
    kept set with its exact cumulative position.

    Distributed exact prefix-sum over a COMPOSITE order without a
    global sort (the ``pack_sequences`` offset pattern): bucket =
    (7 − n_pass) major × doc_id-range minor, so ascending bucket index
    IS the (n_pass desc, doc_id asc) global order; per-bucket token
    sums reduce to O(8 × id_buckets) driver scalars, an exclusive scan
    seeds each bucket, and every bucket finishes locally."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ferenda_ray import bsp

    _RULES = ("rule_len", "rule_mean_wlen", "rule_symbol",
              "rule_bullet", "rule_ellipsis", "rule_alpha",
              "rule_stopwords")

    def scoreize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        npass = None
        for r in _RULES:
            c = pc.cast(b.column(r), pa.int64())
            npass = c if npass is None else pc.add(npass, c)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_pass": npass,
                         "n_tokens": b.column("n_tokens")})

    scored = bsp.spill_dataset(
        gopher_rules(sf_dir).map_batches(scoreize,
                                         batch_format="pyarrow"),
        "budget_head")

    bounds = scored.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = bounds["min(doc_id)"], bounds["max(doc_id)"]
    if lo is None or hi is None:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_pass": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64())}))
    span = max(1, (hi - lo + id_buckets) // id_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        p = b.column("n_pass").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket",
            pa.array((7 - p) * id_buckets + (d - lo) // span,
                     pa.int32()))

    bucketed = scored.map_batches(add_bucket, batch_format="pyarrow")
    per_bucket = {r["bucket"]: r["sum(n_tokens)"] for r in
                  bucketed.groupby("bucket")
                  .aggregate(Sum("n_tokens")).take_all()}
    offsets, acc = {}, 0
    for bkt in sorted(per_bucket):
        offsets[bkt] = acc
        acc += per_bucket[bkt]
    off_ref = ray.put(offsets)
    budget = int(budget_tokens)

    def head(g: pd.DataFrame) -> pd.DataFrame:
        from ferenda_ray.state import fetch

        off = fetch(off_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("doc_id", kind="mergesort")
        cum = off + g["n_tokens"].cumsum()
        out = g.loc[cum <= budget,
                    ["doc_id", "n_pass", "n_tokens"]].copy()
        out["cum_tokens"] = cum[cum <= budget]
        return out.astype({"n_pass": "int64", "cum_tokens": "int64"})

    return (bucketed.groupby("bucket")
            .map_groups(head, batch_format="pandas"))


def quality_budget_head_sql(budget_tokens: int = 15_000) -> str:
    """DuckDB oracle for :func:`quality_budget_head` (window cumsum
    over the same composite order; HUGEINT-cast per the driver
    contract)."""
    rules = ("rule_len", "rule_mean_wlen", "rule_symbol",
             "rule_bullet", "rule_ellipsis", "rule_alpha",
             "rule_stopwords")
    npass = " + ".join(f"CAST({r} AS BIGINT)" for r in rules)
    return f"""
WITH g AS ({GOPHER_RULES_SQL}),
s AS (SELECT doc_id, n_tokens, ({npass}) AS n_pass FROM g),
o AS (SELECT doc_id, n_pass, n_tokens,
        CAST(sum(n_tokens) OVER (ORDER BY n_pass DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
      FROM s)
SELECT doc_id, n_pass, n_tokens, cum_tokens
FROM o WHERE cum_tokens <= {int(budget_tokens)}
"""
