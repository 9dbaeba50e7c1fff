"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on a small
deterministic synthetic pages corpus (the BASELINE.json input_hint
table, synthesized per FIXTURES.md — /root/testdata has no pages
table). ``queries()`` exposes every implemented operator from
SURVEY.md §2 plus the training-data-pipeline components (dedup /
similarity / text analysis / multimodal); ``oracle_sql()`` gives the
DuckDB equivalent where the semantics are SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_CORPUS_CACHE: dict[int, str] = {}


def _pages_path(n_pages: int) -> str:
    """Deterministic synthetic pages corpus, materialized once per size
    under /tmp (content is a pure function of (seed, index))."""
    if n_pages not in _CORPUS_CACHE:
        import pyarrow.parquet as pq

        from ferenda_ray.sources.pages import corpus_table

        path = f"/tmp/ferenda_ray_corpus/pages_{n_pages}.parquet"
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(corpus_table(n_pages), tmp)
            os.replace(tmp, path)
        _CORPUS_CACHE[n_pages] = path
    return _CORPUS_CACHE[n_pages]


def _kg_triples_ds(n_pages: int = 300):
    from ferenda_ray.pipelines.kg import build_triples_ds

    return build_triples_ds(_pages_path(n_pages), link_concurrency=2,
                            batch_size=64)


def entry() -> Any:
    """Flagship: extract → parse → link → canonicalize on a synthetic
    sf0.001-scale pages corpus (~100 logical docs); returns the triples
    Dataset (lazy; driver counts rows)."""
    return _kg_triples_ds(100)


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from ferenda_ray.ops import ann, dedup, relational as rel, text

    q: dict[str, Callable[[str], Any]] = {
        # grouped aggregates / windows / pivots (SURVEY §2.5)
        "q1_pricing_summary": rel.q1_pricing_summary,
        "events_hourly": rel.events_hourly,
        "count_distinct_users": rel.count_distinct_users,
        "pivot_user_event_counts": rel.pivot_user_event_counts,
        # joins (SURVEY §2.4)
        "region_supplier_stats": rel.region_supplier_stats,
        "segment_top_orders": rel.segment_top_orders,
        "customers_without_events": rel.customers_without_events,
        "parts_in_lineitem_by_brand": rel.parts_in_lineitem_by_brand,
        "segment_order_stats": rel.segment_order_stats,
        "nation_order_rollup": rel.nation_order_rollup,
        # dedup / sort / top-k (SURVEY §2.6-2.7)
        "latest_event_per_user": rel.latest_event_per_user,
        "top5_orders": rel.top5_orders,
        "order_priority_counts": rel.order_priority_counts,
        "exact_dedup": dedup.exact_dedup,
        # text analysis (training-data components)
        "token_counts": text.token_counts,
        "quality_scores": text.quality_scores,
        "lang_id": text.lang_id,
        "fingerprints": text.fingerprints,
        # near-dup detection
        "minhash_dedup_pairs": dedup.minhash_dedup_pairs,
        "simhash_dup_pairs": dedup.simhash_dup_pairs,
        "embedding_dup_pairs": dedup.embedding_dup_pairs,
        # similarity search
        "ann_topk": ann.bruteforce_topk,
        "ann_ivf_topk": ann.ivf_topk,
        "knn_classify": ann.knn_classify,
    }

    # KG pipeline products (pages corpus synthesized; sf_dir sets scale)
    def _n_pages(sf_dir: str) -> int:
        return 300 if "0.01" in sf_dir else 100

    def kg_triples(sf_dir: str):
        return _kg_triples_ds(_n_pages(sf_dir))

    def kg_facets(sf_dir: str):
        from ferenda_ray.ops.facets import faceted_data

        return faceted_data(_kg_triples_ds(_n_pages(sf_dir)))

    def kg_stats(sf_dir: str):
        from ferenda_ray.ops.facets import stats_count_distinct

        return stats_count_distinct(_kg_triples_ds(_n_pages(sf_dir)))

    def kg_incoming_refs(sf_dir: str):
        from ferenda_ray.ops.graph import edges_from_triples, incoming_refs

        return incoming_refs(edges_from_triples(_kg_triples_ds(_n_pages(sf_dir))))

    def kg_pagerank(sf_dir: str):
        from ferenda_ray.ops.graph import edges_from_triples, pagerank

        return pagerank(edges_from_triples(_kg_triples_ds(_n_pages(sf_dir))),
                        n_iter=5)

    def media_features(sf_dir: str):
        import ray.data as rd

        from ferenda_ray.stages.multimodal import (MediaDecodeStage,
                                                   synthetic_media_table)

        ds = rd.from_arrow(synthetic_media_table(200))
        return ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                              batch_size=32, concurrency=2)

    q.update(
        {
            "kg_triples": kg_triples,
            "kg_facets": kg_facets,
            "kg_stats": kg_stats,
            "kg_incoming_refs": kg_incoming_refs,
            "kg_pagerank": kg_pagerank,
            "media_features": media_features,
        }
    )
    return q


def oracle_sql() -> dict[str, str]:
    from ferenda_ray.ops import ann, dedup, relational as rel, text

    return {
        "q1_pricing_summary": rel.Q1_SQL,
        "events_hourly": rel.EVENTS_HOURLY_SQL,
        "count_distinct_users": rel.COUNT_DISTINCT_SQL,
        "pivot_user_event_counts": rel.PIVOT_SQL,
        "region_supplier_stats": rel.REGION_SUPPLIER_SQL,
        "segment_top_orders": rel.SEGMENT_TOP_ORDERS_SQL,
        "customers_without_events": rel.CUSTOMERS_WITHOUT_EVENTS_SQL,
        "parts_in_lineitem_by_brand": rel.PARTS_IN_LINEITEM_SQL,
        "segment_order_stats": rel.SEGMENT_ORDER_STATS_SQL,
        "nation_order_rollup": rel.NATION_ORDER_ROLLUP_SQL,
        "latest_event_per_user": rel.LATEST_EVENT_SQL,
        "top5_orders": rel.TOP5_ORDERS_SQL,
        "order_priority_counts": rel.ORDER_PRIORITY_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "token_counts": text.TOKEN_COUNTS_SQL,
        "quality_scores": text.QUALITY_SCORES_SQL,
        "embedding_dup_pairs": dedup.EMBEDDING_DUP_SQL,
        "ann_topk": ann.ANN_TOPK_SQL,
        # rows-only (non-SQL-expressible): lang_id, fingerprints,
        # minhash/simhash near-dup, ivf/knn, kg_* (pipeline over the
        # synthesized pages corpus), media_features
    }
