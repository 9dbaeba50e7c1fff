"""Facet / TOC / feed / stats operators over the triples table —
the reference's derived-aggregation surface (SURVEY §2.5-2.6):

* :func:`faceted_data` — A1 ``facet_query``/``faceted_data``
  (``documentrepository.py:2163-2310``): pivot the long triples table
  into one row per subject with one column per facet predicate
  (first value wins, deterministically).
* :func:`toc_pagesets` / :func:`toc_select` — A2/A3
  (``documentrepository.py:2774-2914``): distinct selector values and
  per-value sorted listings, via selector functions (first letter,
  year — ``facet.py:128-338`` analogs).
* :func:`stats_count_distinct` — A4 ``wsgiapp.stats``
  (``wsgiapp.py:352-506``): per (facet, value) count-distinct of
  subjects.
* :func:`news_feeds` — A5/O3 (``documentrepository.py:3153-3300``):
  newest-first top-k per feed facet.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count

from ferenda_ray import schemas as S

DEFAULT_FACETS = {
    "rdf_type": S.RDF_TYPE,
    "dct_title": S.DCT_TITLE,
    "dct_identifier": S.DCT_IDENTIFIER,
    "dct_issued": S.DCT_ISSUED,
    "dct_language": S.DCT_LANGUAGE,
}


def faceted_data(triples_ds, facets: dict[str, str] | None = None):
    """Pivot: one row per subj, one column per facet predicate.

    DISTINCT + first-value semantics like the reference's SPARQL SELECT
    + duplicate-row removal; deterministic via per-group sort on
    (pred, obj). Shuffle key = subj (SURVEY §7.5)."""
    facets = facets or DEFAULT_FACETS
    pred_to_name = {p: n for n, p in facets.items()}
    names = list(facets.keys())
    num_buckets = 32

    def prefilter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ferenda_ray.util import bucket_keys

        b = b.filter(
            pc.is_in(b.column("pred"),
                     value_set=pa.array(list(pred_to_name), pa.string()))
        ).select(["subj", "pred", "obj"])
        return b.append_column(
            "bucket", pa.array(bucket_keys(b.column("subj"), num_buckets),
                               pa.int32()))

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized: thousands of subjects per bucket task, one pandas
        # pivot per task (a per-subject map_groups pays per-group python
        # overhead at every subject — the bucket pattern, SURVEY §7.5)
        g = (g.sort_values(["subj", "pred", "obj"], kind="mergesort")
             .drop_duplicates(subset=["subj", "pred"], keep="first"))
        wide = g.pivot(index="subj", columns="pred", values="obj")
        out = pd.DataFrame({"uri": wide.index})
        for name in names:
            pred = facets[name]
            col = (wide[pred] if pred in wide.columns
                   else pd.Series("", index=wide.index))
            out[name] = col.fillna("").to_numpy()
        return out

    return (
        triples_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pivot, batch_format="pandas")
    )


# -- selectors (facet.py:128-338 analogs) ---------------------------------

def sel_firstletter(v: str) -> str:
    return v[:1].lower() if v else ""


def sel_year(v: str) -> str:
    return v[:4] if v else ""


def toc_pagesets(facets_ds, column: str, selector=sel_firstletter):
    """Distinct selector values with doc counts (one page per value)."""

    def add_sel(b: pa.Table) -> pa.Table:
        vals = [selector(v) for v in b.column(column).to_pylist()]
        return pa.table({"sel": pa.array(vals, pa.string())})

    return (
        facets_ds.map_batches(add_sel, batch_format="pyarrow")
        .groupby("sel")
        .aggregate(Count(alias_name="n_docs"))
    )


def toc_select(facets_ds, column: str, selector=sel_firstletter,
               sort_col: str | None = None):
    """Group docs by selector value; within group, sort by the facet
    value (locale-free deterministic key) — one listing per TOC page."""
    sort_col = sort_col or column

    def add_sel(b: pa.Table) -> pa.Table:
        vals = [selector(v) for v in b.column(column).to_pylist()]
        return b.append_column("sel", pa.array(vals, pa.string()))

    def listing(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([sort_col, "uri"], kind="mergesort")
        g["pos"] = range(len(g))
        return g

    return (
        facets_ds.map_batches(add_sel, batch_format="pyarrow")
        .groupby("sel")
        .map_groups(listing, batch_format="pandas")
    )


def stats_count_distinct(triples_ds, preds: list[str] | None = None):
    """Per (pred, obj) distinct-subject counts — the API stats slices.
    Two-level aggregation (no per-group set state)."""
    preds = preds or [S.RDF_TYPE, S.DCT_LANGUAGE]

    def prefilter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.is_in(b.column("pred"), value_set=pa.array(preds, pa.string()))
        ).select(["pred", "obj", "subj"])

    per_subj = (
        triples_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(["pred", "obj", "subj"])
        .aggregate(Count(alias_name="n"))
    )
    return per_subj.groupby(["pred", "obj"]).aggregate(
        Count(alias_name="n_subjects")
    )


def news_feeds(facets_ds, feed_col: str = "dct_language",
               date_col: str = "dct_issued", k: int = 5):
    """Per feed value: newest-k docs sorted by issued date desc
    (deterministic tie-break on uri) — the Atom feed head."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([date_col, "uri"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["pos"] = range(len(g))
        return g[[feed_col, "uri", date_col, "pos"]]

    return facets_ds.groupby(feed_col).map_groups(head, batch_format="pandas")
