"""Host-level web-corpus analytics.

No reference-repo counterpart: the reference operates per document
repository and never aggregates across hosts. At web scale, host-level
statistics are the standard curation primitive (C4's blocklist
filtering and RefinedWeb's host-quality gates are host-keyed), so the
engine exposes them as a first-class operator over the raw pages
table ``(url, warc_ts, html, text, lang)``.

Shape: column-pruned read (``html`` never leaves storage) →
per-batch combiner collapsing snapshots to one partial row per
``(host, url)`` → ONE skinny exchange keyed by ``hash(host)`` →
exact per-host finals. The shuffle carries counters, not text, so
the exchange volume is ~#distinct-urls rows regardless of corpus
bytes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ferenda_ray.util import bucket_keys

_N_BUCKETS = 32


def host_of(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized authority extraction: the third ``/``-field of the
    url (``scheme://HOST/...``), matching SQL ``split_part(url, '/',
    3)`` — urls without an authority yield the empty string, exactly
    as split_part does."""
    import pyarrow.compute as pc

    # polars-produced batches carry large_string; the slice/join kernel
    # chain below wants utf8 — normalize first (zero-copy when already
    # utf8)
    urls = pc.cast(urls, pa.string())
    parts = pc.split_pattern(urls, "/")
    # slice to the single field then join: a 0-element slice (url has
    # fewer than 3 fields) joins to "", exactly split_part's missing-
    # field result — and unlike list_element it never raises
    host = pc.binary_join(pc.list_slice(parts, 2, 3), "")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    return host


def host_stats(pages_path: str, num_buckets: int = _N_BUCKETS):
    """Per-host corpus statistics: snapshot count, distinct-url count,
    total extracted-text codepoints. Exact (the per-batch combiner
    only pre-sums within a ``(host, url)`` group; distinct-url
    counting happens after the host-keyed exchange co-locates each
    host)."""

    def partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({
            "host": host_of(b.column("url")),
            "url": b.column("url"),
            "chars": pc.cast(pc.utf8_length(b.column("text")),
                             pa.int64()),
        })
        df = t.to_pandas()
        out = (df.groupby(["host", "url"], as_index=False, sort=False)
               .agg(n=("chars", "size"), chars=("chars", "sum")))
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("host", sort=True)
               .agg(n_snapshots=("n", "sum"),
                    n_urls=("url", "nunique"),
                    sum_text_chars=("chars", "sum"))
               .reset_index())
        return out.astype({"n_snapshots": "int64", "n_urls": "int64",
                           "sum_text_chars": "int64"})

    return (rd.read_parquet(pages_path, columns=["url", "text"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def host_stats_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`host_stats` (sum(BIGINT) → HUGEINT,
    hence the casts; length() counts codepoints like utf8_length)."""
    return (
        f"SELECT split_part(url, '/', 3) AS host, "
        f"count(*) AS n_snapshots, "
        f"count(DISTINCT url) AS n_urls, "
        f"CAST(sum(length(text)) AS BIGINT) AS sum_text_chars "
        f"FROM read_parquet('{pages_path}') GROUP BY host")


# --- URL canonicalization ------------------------------------------
# Crawl-side variant collapse (the WARC/CDX "canonical URL" pass every
# large crawl pipeline runs before dedup): fragment dropped, scheme +
# authority lowercased, default ports stripped, /index.html and
# trailing-slash folded, tracking parameters removed, surviving query
# parameters byte-sorted. The spec is frozen by the twin SQL
# expression below; differential fuzz pins the two engines together.

_TRACK_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canon_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized canonicalization of a url column (one polars
    expression chain, no Python per-row loop). Byte-identical to
    :func:`canon_url_sql_expr` — polars' Rust regex and DuckDB's RE2
    share semantics for every pattern used here."""
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    df = pl.DataFrame({"u": pl.Series("u", urls)})
    u = pl.col("u").str.split("#").list.first()
    head = (u.str.extract(r"^([^:/?#]+://[^/?]*)", 1)
            .fill_null("").str.to_lowercase()
            .str.replace(r":(80|443)$", ""))
    tail = u.str.replace(r"^[^:/?#]+://[^/?]*", "")
    path = tail.str.splitn("?", 2).struct.field("field_0")
    q = (tail.str.splitn("?", 2).struct.field("field_1")
         .fill_null(""))
    path = path.str.replace(r"/index\.html$", "/")
    path = (pl.when((path.str.len_chars() > 1)
                    & path.str.ends_with("/"))
            .then(path.str.head(-1)).otherwise(path))
    path = pl.when(path == "").then(pl.lit("/")).otherwise(path)
    qn = (q.str.split("&")
          .list.eval(pl.element().filter(
              (pl.element() != "")
              & ~pl.element().str.contains(_TRACK_RE)))
          .list.sort().list.join("&"))
    norm = head + path + pl.when(qn != "").then(
        pl.lit("?") + qn).otherwise(pl.lit(""))
    return df.select(norm.alias("n"))["n"].to_arrow().cast(pa.string())


def canon_url_sql_expr(col: str) -> str:
    """The same canonicalization as one DuckDB expression over
    ``col`` (RE2; the twin of :func:`canon_urls`)."""
    u = f"split_part({col}, '#', 1)"
    head = (f"regexp_replace(lower(coalesce(regexp_extract("
            f"{u}, '^([^:/?#]+://[^/?]*)', 1), '')), ':(80|443)$', '')")
    tail = f"regexp_replace({u}, '^[^:/?#]+://[^/?]*', '')"
    path0 = f"split_part({tail}, '?', 1)"
    q = (f"(CASE WHEN strpos({tail}, '?') > 0 "
         f"THEN substr({tail}, strpos({tail}, '?') + 1) ELSE '' END)")
    path1 = f"regexp_replace({path0}, '/index\\.html$', '/')"
    path2 = (f"(CASE WHEN length({path1}) > 1 AND {path1} LIKE '%/' "
             f"THEN substr({path1}, 1, length({path1}) - 1) "
             f"ELSE {path1} END)")
    path = f"(CASE WHEN {path2} = '' THEN '/' ELSE {path2} END)"
    qn = (f"array_to_string(list_sort(list_filter(string_split({q}, "
          f"'&'), x -> x <> '' AND NOT regexp_matches(x, "
          f"'{_TRACK_RE}'))), '&')")
    return (f"({head} || {path} || (CASE WHEN {qn} <> '' "
            f"THEN '?' || {qn} ELSE '' END))")


def url_canonical_groups(pages_path: str,
                         num_buckets: int = _N_BUCKETS):
    """Canonical-url variant groups over the raw pages table: per
    canonical url, the snapshot count and the number of distinct raw
    variants that collapsed into it. Same shape as :func:`host_stats`
    — pruned read (only ``url`` leaves storage), per-batch combiner to
    one partial row per (canonical, raw) pair, ONE skinny exchange
    keyed by ``hash(canonical)``."""

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"norm_url": canon_urls(b.column("url")),
                      "url": b.column("url")})
        out = (t.to_pandas()
               .groupby(["norm_url", "url"], as_index=False,
                        sort=False).size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        out["bucket"] = bucket_keys(out["norm_url"].to_numpy(),
                                    num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("norm_url", sort=True)
               .agg(n_snapshots=("n", "sum"),
                    n_variants=("url", "nunique"))
               .reset_index())
        return out.astype({"n_snapshots": "int64",
                           "n_variants": "int64"})

    return (rd.read_parquet(pages_path, columns=["url"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def url_canonical_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`url_canonical_groups`."""
    return (
        f"SELECT {canon_url_sql_expr('url')} AS norm_url, "
        f"count(*) AS n_snapshots, "
        f"count(DISTINCT url) AS n_variants "
        f"FROM read_parquet('{pages_path}') GROUP BY norm_url")


# --- C4-style line-level cleaning rules ------------------------------
# Raffel et al. 2020 §2.2 ("C4"): retain only lines that end in a
# terminal punctuation mark, have ≥5 words and don't mention
# "javascript"; drop pages with <3 sentences, any "lorem ipsum", or a
# curly brace. Evaluated per page snapshot over the EXTRACTED text —
# the natural companion to the Gopher pack (``ops/text.py``), but
# line-keyed where Gopher is token-keyed. All counters are exact
# integers, so rows hash identically to the SQL recompute.

def c4_line_rules(pages_path: str):
    """Per-snapshot C4 line statistics and keep flags over the pages
    table. Stateless vectorized batch map on a pruned three-column
    read — zero exchanges at any corpus size; at 100 TB this is
    embarrassingly parallel and IO-bound by design.

    A line is RETAINED iff (after stripping trailing blanks) it ends
    in ``.``/``!``/``?``/``"``, has ≥5 whitespace tokens, and does not
    contain "javascript" (case-insensitive). ``n_sentences`` counts
    terminal marks within retained lines. Keyed by (url, ts_s) since
    one url has several WARC snapshots."""
    import polars as pl

    _kept = (pl.element().str.strip_chars_end(" \t\r")
             .str.contains(r'[.!?"]$')
             & (pl.element().str.count_matches(
                 r"[^\t\n\x0b\x0c\r ]+") >= 5)
             & ~pl.element().str.to_lowercase()
             .str.contains("javascript", literal=True))

    def rules(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_s = pc.divide(
            pc.cast(pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    pa.int64()),
            1_000_000)
        df = pl.from_arrow(pa.table({"url": b.column("url"),
                                     "ts_s": ts_s,
                                     "text": b.column("text")}))
        t = pl.col("text")
        lines = t.str.split("\n")
        kept = lines.list.eval(pl.element().filter(_kept))
        n_lines = lines.list.len().cast(pl.Int64)
        n_kept = kept.list.len().cast(pl.Int64)
        n_sent = (kept.list.eval(
            pl.element().str.count_matches(r"[.!?]").cast(pl.Int64))
            .list.sum().fill_null(0).cast(pl.Int64))
        out = df.select(
            pl.col("url"), pl.col("ts_s"),
            n_lines.alias("n_lines"),
            n_kept.alias("n_kept_lines"),
            n_sent.alias("n_sentences"),
            (n_kept >= 1).alias("rule_line"),
            (n_sent >= 3).alias("rule_sentences"),
            (~t.str.to_lowercase()
             .str.contains("lorem ipsum", literal=True))
            .alias("rule_lorem"),
            (~t.str.contains("{", literal=True)).alias("rule_brace"),
        )
        out = out.with_columns(
            (pl.col("rule_line") & pl.col("rule_sentences")
             & pl.col("rule_lorem") & pl.col("rule_brace"))
            .alias("keep"))
        return out.to_arrow()

    return (rd.read_parquet(pages_path,
                            columns=["url", "warc_ts", "text"])
            .map_batches(rules, batch_format="pyarrow"))


def c4_line_rules_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`c4_line_rules` (RE2 twin of the polars
    Rust-regex predicates; ``rtrim`` charset is explicit because plain
    ``trim`` strips only spaces)."""
    return f"""
WITH f AS (
  SELECT url, CAST(epoch_us(warc_ts) // 1000000 AS BIGINT) AS ts_s, text,
         string_split(text, chr(10)) AS lines
  FROM read_parquet('{pages_path}')),
g AS (
  SELECT url, ts_s, text, len(lines) AS n_lines,
    list_filter(lines, x ->
      regexp_matches(rtrim(x, ' ' || chr(9) || chr(13)), '[.!?"]$')
      AND len(regexp_extract_all(x, '[^\\t\\n\\x0b\\x0c\\r ]+')) >= 5
      AND NOT contains(lower(x), 'javascript')) AS kept
  FROM f),
h AS (
  SELECT url, ts_s, text, n_lines, len(kept) AS n_kept,
    coalesce(list_sum(list_transform(kept,
      x -> len(regexp_extract_all(x, '[.!?]')))), 0) AS n_sent
  FROM g)
SELECT url, ts_s,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_kept AS BIGINT) AS n_kept_lines,
  CAST(n_sent AS BIGINT) AS n_sentences,
  n_kept >= 1 AS rule_line,
  n_sent >= 3 AS rule_sentences,
  NOT contains(lower(text), 'lorem ipsum') AS rule_lorem,
  NOT contains(text, '{{') AS rule_brace,
  (n_kept >= 1 AND n_sent >= 3
   AND NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{{')) AS keep
FROM h
"""


# --- Per-host recrawl statistics --------------------------------------

def host_crawl_stats(pages_path: str, num_buckets: int = _N_BUCKETS):
    """Crawl-scheduler view of each host: how many distinct urls, how
    many snapshots, how many urls were re-crawled (≥2 snapshots) and
    the deepest snapshot chain. Combiner-first like :func:`host_stats`
    — per-batch (host, url) counts, one hash(host) exchange, exact
    finals after per-url re-summing (a url's snapshots may straddle
    batches)."""

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"host": host_of(b.column("url")),
                      "url": b.column("url")})
        out = (t.to_pandas()
               .groupby(["host", "url"], as_index=False, sort=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        u = (g.groupby(["host", "url"], as_index=False, sort=False)
             ["n"].sum())
        out = (u.groupby("host", sort=True)
               .agg(n_urls=("url", "size"), n_snapshots=("n", "sum"),
                    n_recrawled=("n", lambda s: int((s >= 2).sum())),
                    max_snapshots=("n", "max"))
               .reset_index())
        return out.astype({"n_urls": "int64", "n_snapshots": "int64",
                           "n_recrawled": "int64",
                           "max_snapshots": "int64"})

    return (rd.read_parquet(pages_path, columns=["url"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def host_crawl_stats_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`host_crawl_stats`."""
    return f"""
WITH u AS (
  SELECT split_part(url, '/', 3) AS host, url, count(*) AS n
  FROM read_parquet('{pages_path}') GROUP BY host, url)
SELECT host, count(*) AS n_urls,
  CAST(sum(n) AS BIGINT) AS n_snapshots,
  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_recrawled,
  CAST(max(n) AS BIGINT) AS max_snapshots
FROM u GROUP BY host
"""


# --- Latest snapshot per CANONICAL url ---------------------------------

def canonical_latest(pages_path: str, num_buckets: int = _N_BUCKETS):
    """Latest-per-canonical-url dedup: collapse every canonicalization
    variant group to its newest snapshot — the crawl-side D4 twin (the
    kg pipeline's latest_filter dedups by RAW url; this one first folds
    variants via :func:`canon_urls`). Deterministic winner: max
    ``warc_ts``, ties by raw url ascending. The per-batch combiner
    keeps one candidate row per canonical url, so the exchange carries
    ≤ #distinct-canonicals rows per batch, never page payloads."""

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["norm_url", "ts_s", "url"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby("norm_url", as_index=False, sort=True).first())

    def partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_s = pc.divide(
            pc.cast(pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    pa.int64()),
            1_000_000)
        t = pa.table({"norm_url": canon_urls(b.column("url")),
                      "url": b.column("url"), "ts_s": ts_s})
        out = _best(t.to_pandas())
        out["ts_s"] = out["ts_s"].astype("int64")
        out["bucket"] = bucket_keys(out["norm_url"].to_numpy(),
                                    num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        out = _best(g[["norm_url", "url", "ts_s"]])
        return out.astype({"ts_s": "int64"})

    return (rd.read_parquet(pages_path, columns=["url", "warc_ts"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def canonical_latest_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`canonical_latest`."""
    return f"""
WITH c AS (
  SELECT {canon_url_sql_expr('url')} AS norm_url, url,
         CAST(epoch_us(warc_ts) // 1000000 AS BIGINT) AS ts_s
  FROM read_parquet('{pages_path}')),
r AS (
  SELECT norm_url, url, ts_s,
         row_number() OVER (PARTITION BY norm_url
                            ORDER BY ts_s DESC, url ASC) AS rn
  FROM c)
SELECT norm_url, url, ts_s FROM r WHERE rn = 1
"""


# --- Per-host quality rollup ------------------------------------------

def host_quality(pages_path: str, num_buckets: int = _N_BUCKETS):
    """RefinedWeb-style host-level curation gate: roll the per-snapshot
    C4 ``keep`` bits up to each host — snapshot count, kept count, and
    the kept rate in exact integer permille (``1000 * kept // total``,
    DuckDB ``//`` parity). Hosts whose keep rate collapses are what a
    crawl blocklist is made of; at 10^12 pages the exchange carries two
    counters per (host, batch), nothing else."""
    return host_quality_from_c4(c4_line_rules(pages_path), num_buckets)


def host_quality_from_c4(c4_ds, num_buckets: int = _N_BUCKETS):
    """The rollup over an already-built C4 Dataset — shared by
    :func:`host_quality` (fused chain) and :func:`curated_crawl`
    (spilled pass consumed twice)."""

    def partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({
            "host": host_of(b.column("url")),
            "keep": pc.cast(b.column("keep"), pa.int64()),
        })
        out = (t.to_pandas()
               .groupby("host", as_index=False, sort=False)
               .agg(n=("keep", "size"), n_kept=("keep", "sum")))
        out = out.astype({"n": "int64", "n_kept": "int64"})
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("host", sort=True)
               .agg(n_snapshots=("n", "sum"), n_kept=("n_kept", "sum"))
               .reset_index())
        out = out.astype({"n_snapshots": "int64", "n_kept": "int64"})
        out["kept_permille"] = (
            1000 * out["n_kept"] // out["n_snapshots"]).astype("int64")
        return out

    return (c4_ds.map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def host_quality_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`host_quality` — the C4 recompute as a
    CTE, rolled up by host."""
    return f"""
WITH c4 AS ({c4_line_rules_sql(pages_path)})
SELECT split_part(url, '/', 3) AS host,
  count(*) AS n_snapshots,
  CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS n_kept,
  CAST(1000 * sum(CAST(keep AS BIGINT)) // count(*) AS BIGINT)
    AS kept_permille
FROM c4 GROUP BY host
"""


# --- Apply the host gate (blocklist semi-join) -------------------------

HOST_BROADCAST_LIMIT = int(__import__("os").environ.get(
    "FERENDA_RAY_HOST_BROADCAST_LIMIT", "5000000"))


def gated_pages(pages_path: str, min_permille: int = 900,
                num_buckets: int = _N_BUCKETS,
                broadcast_limit: int | None = None):
    """Apply the :func:`host_quality` gate to the crawl: the snapshot
    list ``(host, url, ts_s)`` of every page whose host clears
    ``min_permille`` — i.e. the blocklist-application pass every
    C4/RefinedWeb pipeline runs after host scoring. Only the skinny
    key columns ever move; page payloads stay in storage.

    Two paths, auto-selected by host count (the repo's broadcast-vs-
    join convention, cf. ``kg.SNAPSHOT_BROADCAST_LIMIT``): below
    ``HOST_BROADCAST_LIMIT`` the passing-host set is one ``ray.put``
    broadcast read by every filter task; above it, pages and the
    quality table meet in schema-aligned hash(host)-bucketed cogroups
    (an indicator semi-join — no driver host set at any size). Both
    paths are bit-equality tested."""
    import numpy as np
    import ray

    from ferenda_ray import bsp

    # spill the quality table once: the lazy Dataset is consumed twice
    # below (host count, then the passing set / join side) and each
    # consumption would otherwise re-run the full C4 text pass
    hq = bsp.spill_dataset(host_quality(pages_path, num_buckets),
                           "gate_hq",
                           columns=["host", "kept_permille"])
    limit = (HOST_BROADCAST_LIMIT if broadcast_limit is None
             else broadcast_limit)

    def page_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_s = pc.divide(
            pc.cast(pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    pa.int64()),
            1_000_000)
        return pa.table({"host": host_of(b.column("url")),
                         "url": b.column("url"), "ts_s": ts_s})

    pages = rd.read_parquet(pages_path, columns=["url", "warc_ts"])

    # the quality table is one row per host — counting it is cheap and
    # the result is reused by whichever path wins
    if hq.count() <= limit:
        def passing(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.greater_equal(
                b.column("kept_permille"),
                min_permille)).select(["host"])

        good = pa.array(
            sorted(hq.map_batches(passing, batch_format="pyarrow")
                   .to_pandas()["host"]), pa.string())
        ref = ray.put(good)

        def keep(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ferenda_ray.state import fetch

            t = page_rows(b)
            mask = pc.is_in(t.column("host"), value_set=fetch(ref))
            return t.filter(mask)

        return pages.map_batches(keep, batch_format="pyarrow")

    # join path: schema-aligned indicator cogroups, no driver state
    def page_side(b: pa.Table) -> pa.Table:
        t = page_rows(b)
        out = t.to_pandas()
        out["is_page"] = np.int8(1)
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def gate_side(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["kept_permille"] >= min_permille]
        out = pd.DataFrame({"host": df["host"],
                            "url": "", "ts_s": np.int64(0)})
        out["is_page"] = np.int8(0)
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        passing = set(g.loc[g["is_page"] == 0, "host"])
        out = g[(g["is_page"] == 1) & g["host"].isin(passing)]
        return out[["host", "url", "ts_s"]].astype({"ts_s": "int64"})

    both = (pages.map_batches(page_side, batch_format="pyarrow")
            .union(hq.map_batches(gate_side, batch_format="pyarrow")))
    return both.groupby("bucket").map_groups(semi, batch_format="pandas")


def gated_pages_sql(pages_path: str, min_permille: int = 900) -> str:
    """DuckDB oracle for :func:`gated_pages`."""
    return f"""
WITH hq AS ({host_quality_sql(pages_path)})
SELECT split_part(url, '/', 3) AS host, url,
       CAST(epoch_us(warc_ts) // 1000000 AS BIGINT) AS ts_s
FROM read_parquet('{pages_path}')
WHERE split_part(url, '/', 3) IN
      (SELECT host FROM hq WHERE kept_permille >= {min_permille})
"""


# --- Crawl-curation flagship composition -------------------------------

def curated_crawl(pages_path: str, min_permille: int = 900,
                  num_buckets: int = _N_BUCKETS):
    """The end-to-end crawl-curation pipeline every web-corpus build
    runs before tokenization, as ONE composition of this module's
    operators: collapse canonicalization variants to the newest
    snapshot (:func:`canonical_latest`), keep pages passing the C4
    line rules (:func:`c4_line_rules`), and drop hosts whose keep rate
    misses ``min_permille`` (the :func:`host_quality` gate). Returns
    the curated snapshot list ``(host, norm_url, url, ts_s)``.

    Scale shape: the C4 pass runs ONCE and is spilled to the stage
    tier (``bsp.spill_dataset``) because two consumers need it (the
    per-page keep bits and the per-host rollup) — re-executing it
    would double the text read, and ``materialize()`` would pin a
    corpus-scale table in the object store. Page payloads never cross
    an exchange: stage 1 semi-joins winners⋈keep on hash(url) bucketed
    cogroups, stage 2 semi-joins survivors⋈passing-hosts on
    hash(host). Both sides of every union are schema-aligned skinny
    key rows."""
    import numpy as np

    from ferenda_ray import bsp

    c4 = bsp.spill_dataset(c4_line_rules(pages_path), "curated_c4",
                           columns=["url", "ts_s", "keep"])

    # per-host keep rollup over the spilled pass (the host_quality
    # rollup, shared implementation), thresholded to the passing set
    def q_pass(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(
            b.column("kept_permille"), min_permille)).select(["host"])

    passing = (host_quality_from_c4(c4, num_buckets)
               .map_batches(q_pass, batch_format="pyarrow"))

    # stage 1: winners ⋈ keep-true pages, bucketed by hash(url)
    def winner_side(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["norm_url", "url", "ts_s"]]
        df["side"] = np.int8(0)
        df["bucket"] = bucket_keys(df["url"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def keep_side(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.loc[df["keep"], ["url", "ts_s"]].copy()
        df.insert(0, "norm_url", "")
        df["side"] = np.int8(1)
        df["bucket"] = bucket_keys(df["url"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def semi_url(g: pd.DataFrame) -> pd.DataFrame:
        k = g.loc[g["side"] == 1, ["url", "ts_s"]].drop_duplicates()
        w = g.loc[g["side"] == 0, ["norm_url", "url", "ts_s"]]
        out = w.merge(k, on=["url", "ts_s"], how="inner")
        return out.astype({"ts_s": "int64"})

    def add_host(b: pa.Table) -> pa.Table:
        return b.append_column("host", host_of(b.column("url")))

    survivors = (canonical_latest(pages_path, num_buckets)
                 .map_batches(winner_side, batch_format="pyarrow")
                 .union(c4.map_batches(keep_side,
                                       batch_format="pyarrow"))
                 .groupby("bucket")
                 .map_groups(semi_url, batch_format="pandas")
                 .map_batches(add_host, batch_format="pyarrow"))

    # stage 2: survivors ⋈ passing hosts, bucketed by hash(host)
    def surv_side(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["host", "norm_url", "url", "ts_s"]]
        df["side"] = np.int8(0)
        df["bucket"] = bucket_keys(df["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def host_side(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["host"]].copy()
        df["norm_url"] = ""
        df["url"] = ""
        df["ts_s"] = np.int64(0)
        df["side"] = np.int8(1)
        df["bucket"] = bucket_keys(df["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def semi_host(g: pd.DataFrame) -> pd.DataFrame:
        ok = set(g.loc[g["side"] == 1, "host"])
        out = g.loc[(g["side"] == 0) & g["host"].isin(ok),
                    ["host", "norm_url", "url", "ts_s"]]
        return out.astype({"ts_s": "int64"})

    return (survivors.map_batches(surv_side, batch_format="pyarrow")
            .union(passing.map_batches(host_side,
                                       batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(semi_host, batch_format="pandas"))


def curated_crawl_sql(pages_path: str, min_permille: int = 900) -> str:
    """DuckDB oracle for :func:`curated_crawl`."""
    return f"""
WITH c4 AS ({c4_line_rules_sql(pages_path)}),
hq AS (
  SELECT split_part(url, '/', 3) AS host
  FROM c4 GROUP BY host
  HAVING 1000 * sum(CAST(keep AS BIGINT)) // count(*)
         >= {min_permille}),
c AS (
  SELECT {canon_url_sql_expr('url')} AS norm_url, url,
         CAST(epoch_us(warc_ts) // 1000000 AS BIGINT) AS ts_s
  FROM read_parquet('{pages_path}')),
r AS (
  SELECT norm_url, url, ts_s,
         row_number() OVER (PARTITION BY norm_url
                            ORDER BY ts_s DESC, url ASC) AS rn
  FROM c)
SELECT split_part(r.url, '/', 3) AS host, r.norm_url, r.url, r.ts_s
FROM r
JOIN (SELECT DISTINCT url, ts_s FROM c4 WHERE keep) k
  ON r.url = k.url AND r.ts_s = k.ts_s
WHERE r.rn = 1
  AND split_part(r.url, '/', 3) IN (SELECT host FROM hq)
"""


# --- Per-host language distribution ----------------------------------

def host_lang_stats(pages_path: str, num_buckets: int = _N_BUCKETS):
    """Per-host language distribution: page count, distinct-language
    count, and the majority language with its page count (ties broken
    by language ascending; the empty string is a real "undetected"
    class). Same shape as :func:`host_stats` — pruned two-column read,
    per-batch (host, lang) combiner, ONE skinny counter exchange keyed
    by ``hash(host)``. This is the CCNet/RefinedWeb host-routing
    primitive: decide per host which language pipeline its pages
    enter."""

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"host": host_of(b.column("url")),
                      "lang": b.column("lang")})
        out = (t.to_pandas()
               .groupby(["host", "lang"], as_index=False, sort=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        out["bucket"] = bucket_keys(out["host"].to_numpy(), num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finals(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["host", "lang"], as_index=False, sort=False)
               ["n"].sum())
        tot = (agg.groupby("host", sort=True)
               .agg(n_pages=("n", "sum"), n_langs=("lang", "nunique")))
        top = (agg.sort_values(["host", "n", "lang"],
                               ascending=[True, False, True],
                               kind="mergesort")
               .groupby("host", sort=True).first())
        out = tot.join(top.rename(
            columns={"lang": "top_lang", "n": "top_lang_pages"}))
        return out.reset_index().astype(
            {"n_pages": "int64", "n_langs": "int64",
             "top_lang_pages": "int64"})

    return (rd.read_parquet(pages_path, columns=["url", "lang"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(finals, batch_format="pandas"))


def host_lang_stats_sql(pages_path: str) -> str:
    """DuckDB oracle for :func:`host_lang_stats`."""
    return f"""
WITH c AS (
  SELECT split_part(url, '/', 3) AS host, lang, count(*) AS n
  FROM read_parquet('{pages_path}') GROUP BY host, lang),
r AS (
  SELECT host, lang, n,
         row_number() OVER (PARTITION BY host
                            ORDER BY n DESC, lang ASC) AS rn
  FROM c),
t AS (
  SELECT host, CAST(sum(n) AS BIGINT) AS n_pages,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM c GROUP BY host)
SELECT t.host, t.n_pages, t.n_langs,
       r.lang AS top_lang, CAST(r.n AS BIGINT) AS top_lang_pages
FROM t JOIN r ON t.host = r.host AND r.rn = 1
"""
