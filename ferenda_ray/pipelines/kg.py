"""The flagship knowledge-graph-construction pipeline.

pages parquet → latest-per-url → extract → FSM structure → triple emit +
mention/entity linking (actor pool) → canonicalize → dedup/materialize,
end to end as one streaming Ray Data pipeline (BASELINE.json stages
extract → parse/triple-extract → entity-link → canonicalize/materialize;
reference call chains traced in SURVEY §3).

Design notes (scale):

* the wide ``html`` column is consumed inside ExtractStage and never
  crosses a shuffle; every downstream block is narrow.
* latest-per-url (reference ``download_is_different`` /
  archive-versioning semantics, ``documentrepository.py:1028-1034``) is
  computed as a NARROW aggregate — only (url, warc_ts) is shuffled —
  and applied as a broadcast semi-join filter on the main stream. At
  10^12 urls the url→max_ts map outgrows the driver: swap the broadcast
  for a hash-bucket join (bucket both sides by ``hash(url) % B``);
  the rest of the pipeline is unchanged.
* triple emission + linking is ONE actor-pool pass over docs (no
  dataset fan-out → no double execution of the extract stage).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Max

from ferenda_ray.sources import entities as ent
from ferenda_ray.stages import materialize as mat
from ferenda_ray.stages.canon import canon_batch, build_canonical_map
from ferenda_ray.stages.extract import extract_batch
from ferenda_ray.stages.link import EntityLinker, scan_citations, _MENTION
from ferenda_ray.stages.structure import structure_batch, sections_rows
from ferenda_ray.stages.triples import doc_triples
from ferenda_ray import schemas as S


def read_pages(path: str):
    """Prune at the read: the pipeline never needs the golden ``text``
    column (it re-derives text from html; tests compare the two)."""
    return rd.read_parquet(path, columns=["url", "warc_ts", "html", "lang"])


def latest_per_url_map(path: str) -> dict[str, object]:
    """url → max(warc_ts), computed over a NARROW read (2 columns)."""
    narrow = rd.read_parquet(path, columns=["url", "warc_ts"])
    agg = narrow.groupby("url").aggregate(Max("warc_ts", alias_name="max_ts"))
    pdf = agg.to_pandas()
    return dict(zip(pdf["url"], pdf["max_ts"]))


def latest_filter(batch: pa.Table, max_ref) -> pa.Table:
    """Broadcast semi-join: keep only the newest snapshot of each url.
    Stateless task; broadcast map resolved once per worker via the
    state cache."""
    import pandas as pd

    from ferenda_ray.state import fetch

    max_ts = fetch(max_ref)
    urls = batch.column("url").to_pylist()
    ts = batch.column("warc_ts").to_pylist()
    keep = [max_ts.get(u) == pd.Timestamp(t) or max_ts.get(u) == t
            for u, t in zip(urls, ts)]
    return batch.filter(pa.array(keep, pa.bool_()))


class TripleEmitStage:
    """Actor-pool stage: docs batch (url, warc_ts, lang, title, tree) →
    ALL triples for those docs (metadata + structure + citations +
    linked entity mentions) in one pass.

    Linker state (alias dict + embedding matrix) is broadcast via
    ``ray.put`` and loaded once per actor (SURVEY §2.3 ST1).
    """

    def __init__(self, alias_ref=None, emb_ref=None):
        def get(r):
            return ray.get(r) if isinstance(r, ray.ObjectRef) else r

        alias = get(alias_ref) if alias_ref is not None else {}
        uris, matrix = (None, None)
        if emb_ref is not None:
            uris, matrix = get(emb_ref)
        self.linker = EntityLinker(alias, uris, matrix)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for url, ts, lang, title, tj in zip(
            batch.column("url").to_pylist(),
            batch.column("warc_ts").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("title").to_pylist(),
            batch.column("tree").to_pylist(),
        ):
            tree = json.loads(tj)
            rows.extend(doc_triples(url, ts, lang, title, tree))
            for sec in sections_rows(url, tree, title):
                about, text = sec["about"], sec["text"]
                for target in scan_citations(text):
                    rows.append(_ref_triple(about, S.DCT_REFERENCES, target, url))
                for m in _MENTION.finditer(text):
                    uri = self.linker.link(m.group(1))
                    if uri is not None:
                        rows.append(_ref_triple(about, S.DCT_SUBJECT, uri, url))
        return pa.table(
            {
                "subj": pa.array([r["subj"] for r in rows], pa.string()),
                "pred": pa.array([r["pred"] for r in rows], pa.string()),
                "obj": pa.array([r["obj"] for r in rows], pa.string()),
                "obj_is_uri": pa.array([r["obj_is_uri"] for r in rows], pa.bool_()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
                "datatype": pa.array([r["datatype"] for r in rows], pa.string()),
                "url": pa.array([r["url"] for r in rows], pa.string()),
            }
        )


def _ref_triple(subj, pred, obj, url):
    return {
        "subj": subj, "pred": pred, "obj": obj,
        "obj_is_uri": True, "lang": "", "datatype": "", "url": url,
    }


def default_link_state(n_entities: int = ent.N_ENTITIES):
    """(alias dict, (uris, embedding matrix), canonical map) for the
    synthetic corpus — broadcast-ready."""
    import numpy as np

    etab = ent.entities_table(n_entities)
    alias = dict(
        zip(etab.column("label").to_pylist(), etab.column("entity_uri").to_pylist())
    )
    uris = etab.column("entity_uri").to_pylist()
    matrix = np.array(etab.column("embedding").to_pylist(), dtype=np.float32)
    entity_rows = [
        {"entity_uri": u, "label": l, "id": u.rsplit("/", 1)[-1]}
        for u, l in zip(uris, etab.column("label").to_pylist())
    ]
    canon = build_canonical_map(entity_rows, ent.sameas_map(n_entities))
    return alias, (uris, matrix), canon


def build_triples_ds(pages_path: str, *, link_concurrency=4,
                     batch_size: int = 64, dedupe_snapshots: bool = True):
    """pages parquet → canonical triples Dataset (lazy; not materialized)."""
    alias, emb, canon = default_link_state()
    alias_ref = ray.put(alias)
    emb_ref = ray.put(emb)
    canon_ref = ray.put(canon)

    import functools

    ds = read_pages(pages_path)
    if dedupe_snapshots:
        max_ref = ray.put(latest_per_url_map(pages_path))
        ds = ds.map_batches(
            functools.partial(latest_filter, max_ref=max_ref),
            batch_format="pyarrow", batch_size=batch_size,
        )
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(structure_batch, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(
        TripleEmitStage,
        fn_constructor_kwargs={"alias_ref": alias_ref, "emb_ref": emb_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=link_concurrency,
    )
    ds = ds.map_batches(
        functools.partial(canon_batch, canon_ref=canon_ref),
        batch_format="pyarrow", batch_size=8192,
    )
    return ds


def run_kg_pipeline(pages_path: str, out_dir: str, *,
                    num_buckets: int = mat.DEFAULT_BUCKETS,
                    link_concurrency=4, batch_size: int = 64,
                    resume: bool = True):
    """Full extract→link→canonicalize→materialize run; returns the
    manifest DataFrame (one row per bucket written)."""
    ds = build_triples_ds(pages_path, link_concurrency=link_concurrency,
                          batch_size=batch_size)
    return mat.materialize(ds, out_dir, num_buckets=num_buckets, resume=resume)
