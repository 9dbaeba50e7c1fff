"""S12 FulltextIndex as a real distributed inverted index (reference
``fulltextindex.py:25-601``: per-resource update() + relevance-ranked
query(), Whoosh/BM25 backend — rebuilt as partitioned-parquet postings
with term-bucket-pruned query).

Build (one map-only filesystem shuffle, the repo's two-phase style):

* tokenize each resource (frozen spec: lowercase ``\\w+`` runs);
* emit narrow postings rows ``(term, uri, tf, dl)``;
* hive-write partitioned by ``hash(term) % B`` — at 10^12 docs this is
  the only all-to-all, and it moves counts, never text;
* a tiny ``stats.json`` holds N and avgdl for BM25.

Query cost is O(postings of the query terms): only the query terms'
buckets are read (partition-pruned parquet read), df is counted
in-bucket, BM25-scored top-k returned with a deterministic
``(-score, uri)`` order. Scores are rounded to 4 decimals so the
ranking is reproducible across engines (the DuckDB oracle recomputes
BM25 independently from the raw table).

BM25 (k1=1.2, b=0.75, Lucene-style idf): score(q, d) =
Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
idf(t) = ln( (N−df+0.5)/(df+0.5) + 1 ).
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

K1 = 1.2
B = 0.75
_TOKEN = re.compile(r"\w+")


def tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


def build_index(ds, uri_col: str, text_col: str, out_dir: str,
                num_buckets: int = 32) -> dict:
    """Postings + stats from any (uri, text) Dataset. Returns stats."""
    from ray.data.aggregate import Count, Sum

    from ferenda_ray.util import stable_uint

    def postings(batch: pa.Table) -> pa.Table:
        terms, uris, tfs, dls = [], [], [], []
        for uri, text in zip(batch.column(uri_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            toks = tokenize(text)
            dl = len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in counts.items():
                terms.append(t)
                uris.append(str(uri))
                tfs.append(tf)
                dls.append(dl)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "uri": pa.array(uris, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
            "b": pa.array([stable_uint(t, num_buckets) for t in terms],
                          pa.int32()),
        })

    post = ds.map_batches(postings, batch_format="pyarrow")
    post.write_parquet(os.path.join(out_dir, "postings"),
                       partition_cols=["b"])

    # N docs + avgdl derived FROM the written postings (dl = Σ tf per
    # uri, already a postings column) — no second tokenize pass over
    # the corpus, one narrow aggregate over (uri, dl)
    written = rd.read_parquet(os.path.join(out_dir, "postings"),
                              columns=["uri", "dl"])
    per_doc = written.groupby("uri").aggregate(
        Count(alias_name="nterms"), Sum("dl", alias_name="dl_sum"))

    def first_dl(batch: pa.Table) -> pa.Table:
        # every posting of a doc carries the same dl; recover it
        n = batch.column("nterms").to_numpy(zero_copy_only=False)
        s = batch.column("dl_sum").to_numpy(zero_copy_only=False)
        return pa.table({"dl": pa.array(s // n, pa.int64())})

    agg = (per_doc.map_batches(first_dl, batch_format="pyarrow")
           .aggregate(Count(alias_name="n"), Sum("dl", alias_name="sum_dl")))
    stats = {"n_docs": int(agg["n"]), "avgdl": agg["sum_dl"] / agg["n"],
             "num_buckets": num_buckets}
    with open(os.path.join(out_dir, "stats.json"), "w") as fp:
        json.dump(stats, fp)
    return stats


def query_index(out_dir: str, q: str, k: int = 10) -> pa.Table:
    """BM25 top-k: reads ONLY the query terms' postings buckets."""
    from ferenda_ray.util import stable_uint

    with open(os.path.join(out_dir, "stats.json")) as fp:
        stats = json.load(fp)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    terms = sorted(set(tokenize(q)))
    scores: dict[str, float] = {}
    for term in terms:
        b = stable_uint(term, stats["num_buckets"])
        path = os.path.join(out_dir, "postings", f"b={b}")
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path, columns=["term", "uri", "tf", "dl"])
        t = t.filter(pa.compute.equal(t.column("term"), term))
        if not t.num_rows:
            continue
        df = t.num_rows
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        for uri, sc in zip(t.column("uri").to_pylist(), s):
            scores[uri] = scores.get(uri, 0.0) + float(sc)
    rows = sorted(((round(s, 4), u) for u, s in scores.items()),
                  key=lambda x: (-x[0], x[1]))[:k]
    return pa.table({
        "uri": pa.array([u for _, u in rows], pa.string()),
        "score": pa.array([s for s, _ in rows], pa.float64()),
    })


# -- typed/boosted fields (reference fulltextindex.py:65-301) --------------
#
# The reference assembles its index schema from each repo's facets()
# with TYPED fields carrying boosts (Label(boost=16), Text(boost=2),
# Identifier, …), so "title matches rank higher" is expressible. Here:
# postings carry a ``field`` column, BM25 runs per field (df / N /
# avgdl are per-field statistics over the docs that HAVE the field) and
# the document score is the boost-weighted sum of its field scores
# (BM25F-style linear combination).


def build_typed_index(ds, uri_col: str, fields: dict[str, float],
                      out_dir: str, num_buckets: int = 32) -> dict:
    """Postings ``(term, uri, field, tf, dl)`` hive-partitioned by
    ``hash(term)`` from any Dataset with one text column per field;
    ``fields`` maps column name → boost. Same single map-only shuffle
    as :func:`build_index`; stats (per-field N docs / avgdl / boost)
    derived from the written postings, no second tokenize pass."""
    from ray.data.aggregate import Count, Sum

    from ferenda_ray.util import stable_uint

    cols = list(fields)

    def postings(batch: pa.Table) -> pa.Table:
        terms, uris, fs, tfs, dls = [], [], [], [], []
        uri_vals = batch.column(uri_col).to_pylist()
        for f in cols:
            for uri, text in zip(uri_vals, batch.column(f).to_pylist()):
                toks = tokenize(text or "")
                if not toks:
                    continue  # docs without the field don't enter its stats
                counts: dict[str, int] = {}
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                for t, tf in counts.items():
                    terms.append(t)
                    uris.append(str(uri))
                    fs.append(f)
                    tfs.append(tf)
                    dls.append(len(toks))
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "uri": pa.array(uris, pa.string()),
            "field": pa.array(fs, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
            "b": pa.array([stable_uint(t, num_buckets) for t in terms],
                          pa.int32()),
        })

    post = ds.map_batches(postings, batch_format="pyarrow")
    post.write_parquet(os.path.join(out_dir, "postings"),
                       partition_cols=["b"])

    written = rd.read_parquet(os.path.join(out_dir, "postings"),
                              columns=["field", "uri", "dl"])
    per_doc = written.groupby(["field", "uri"]).aggregate(
        Count(alias_name="nterms"), Sum("dl", alias_name="dl_sum"))

    def doc_dl(batch: pa.Table) -> pa.Table:
        n = batch.column("nterms").to_numpy(zero_copy_only=False)
        s = batch.column("dl_sum").to_numpy(zero_copy_only=False)
        return pa.table({"field": batch.column("field"),
                         "dl": pa.array(s // n, pa.int64())})

    per_field = (per_doc.map_batches(doc_dl, batch_format="pyarrow")
                 .groupby("field")
                 .aggregate(Count(alias_name="n"),
                            Sum("dl", alias_name="sum_dl"))
                 .take_all())
    stats = {
        "num_buckets": num_buckets,
        "fields": {r["field"]: {"n_docs": int(r["n"]),
                                "avgdl": r["sum_dl"] / r["n"],
                                "boost": fields[r["field"]]}
                   for r in per_field},
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as fp:
        json.dump(stats, fp)
    return stats


def query_typed_index(out_dir: str, q: str, k: int = 10) -> pa.Table:
    """Boost-weighted BM25F top-k; reads only the query terms'
    postings buckets (same pruning as :func:`query_index`)."""
    from ferenda_ray.util import stable_uint

    with open(os.path.join(out_dir, "stats.json")) as fp:
        stats = json.load(fp)
    fstats = stats["fields"]
    terms = sorted(set(tokenize(q)))
    scores: dict[str, float] = {}
    for term in terms:
        b = stable_uint(term, stats["num_buckets"])
        path = os.path.join(out_dir, "postings", f"b={b}")
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path, columns=["term", "uri", "field", "tf",
                                         "dl"])
        t = t.filter(pa.compute.equal(t.column("term"), term))
        if not t.num_rows:
            continue
        tdf = t.to_pandas()
        for f, grp in tdf.groupby("field"):
            fs = fstats.get(f)
            if fs is None:
                continue
            df = len(grp)
            idf = math.log((fs["n_docs"] - df + 0.5) / (df + 0.5) + 1.0)
            tf = grp["tf"].to_numpy(dtype=np.float64)
            dl = grp["dl"].to_numpy(dtype=np.float64)
            s = (fs["boost"] * idf * tf * (K1 + 1)
                 / (tf + K1 * (1 - B + B * dl / fs["avgdl"])))
            for uri, sc in zip(grp["uri"], s):
                scores[uri] = scores.get(uri, 0.0) + float(sc)
    rows = sorted(((round(s, 4), u) for u, s in scores.items()),
                  key=lambda x: (-x[0], x[1]))[:k]
    return pa.table({
        "uri": pa.array([u for _, u in rows], pa.string()),
        "score": pa.array([s for s, _ in rows], pa.float64()),
    })


def boosted_bm25_sql(table_expr: str, query: str, uri_col: str,
                     fields: dict[str, float], k: int = 10) -> str:
    """Boost-weighted per-field BM25 recomputed independently in SQL
    (one :func:`bm25_sql`-shaped block per field, boost-scaled, summed
    per uri; per-field N/avgdl/df over docs that have the field)."""
    blocks = []
    for f, boost in fields.items():
        blocks.append(f"""
    SELECT u, {boost} * score AS score FROM (
        WITH tok AS (
            SELECT {uri_col} AS u,
                   unnest(regexp_extract_all(lower({f}), '\\w+')) AS term
            FROM {table_expr}
        ), tf AS (
            SELECT u, term, count(*) AS tf FROM tok GROUP BY u, term
        ), dl AS (
            SELECT u, count(*) AS dl FROM tok GROUP BY u
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
        ), qt AS (
            SELECT DISTINCT
                unnest(regexp_extract_all(lower('{query}'), '\\w+')) AS term
        ), df AS (
            SELECT term, count(*) AS df FROM tf
            WHERE term IN (SELECT term FROM qt) GROUP BY term
        )
        SELECT tf.u,
               sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({K1} + 1)
                   / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)))
                   AS score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (u)
        CROSS JOIN stats s
        GROUP BY tf.u)""")
    union = "\n    UNION ALL\n".join(blocks)
    return f"""
WITH per_field AS ({union}
)
SELECT CAST(u AS VARCHAR) AS uri, round(sum(score), 4) AS score
FROM per_field GROUP BY u
ORDER BY score DESC, uri ASC LIMIT {k}
"""


# -- driver-facing entry over the documents table --------------------------

FT_QUERY = "table scan merge"
_INDEX_CACHE: dict[str, str] = {}


def ft_search(sf_dir: str, q: str = FT_QUERY, k: int = 10):
    """Build-once-per-sf inverted index over ``documents``, then BM25
    top-k for a fixed query (driver gate entry)."""
    import hashlib

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    out = f"/tmp/ferenda_ray_ftidx/{key}"
    if _INDEX_CACHE.get(sf_dir) != out or not os.path.exists(
            os.path.join(out, "stats.json")):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        build_index(ds, "doc_id", "text", out)
        _INDEX_CACHE[sf_dir] = out
    return query_index(out, q, k)


def bm25_sql(table_expr: str, query: str, uri_col: str,
             text_col: str, k: int = 10) -> str:
    """BM25 recomputed independently in SQL over any (uri, text) table
    (same tokenizer: lowercase \\w+ runs via regexp_extract_all; same
    constants; round(…,4) both sides)."""
    return f"""
WITH tok AS (
    SELECT {uri_col} AS u,
           unnest(regexp_extract_all(lower({text_col}), '\\w+')) AS term
    FROM {table_expr}
), tf AS (
    SELECT u, term, count(*) AS tf FROM tok GROUP BY u, term
), dl AS (
    SELECT u, count(*) AS dl FROM tok GROUP BY u
), stats AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), qt AS (
    -- DISTINCT: a repeated query word must score once (the engine
    -- dedups query terms the same way)
    SELECT DISTINCT unnest(regexp_extract_all(lower('{query}'), '\\w+'))
        AS term
), df AS (
    SELECT term, count(*) AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
), scored AS (
    SELECT tf.u,
           sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({K1} + 1)
               / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)))
               AS score
    FROM tf
    JOIN df USING (term)
    JOIN dl USING (u)
    CROSS JOIN stats s
    GROUP BY tf.u
)
SELECT CAST(u AS VARCHAR) AS uri, round(score, 4) AS score
FROM scored ORDER BY score DESC, uri ASC LIMIT {k}
"""


FT_SEARCH_SQL = bm25_sql("documents", FT_QUERY, "doc_id", "text")
