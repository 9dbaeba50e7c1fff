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
