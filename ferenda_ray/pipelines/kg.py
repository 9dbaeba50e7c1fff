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
  10^12 urls the url→max_ts map outgrows the driver, so above
  ``SNAPSHOT_BROADCAST_LIMIT`` snapshots ``_dedupe_stage``
  auto-switches to the hash-bucket join (bucket both sides by
  ``hash(url) % B``); the rest of the pipeline is unchanged.
* triple emission + linking is ONE actor-pool pass over docs (no
  dataset fan-out → no double execution of the extract stage).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray
import ray.data as rd
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


def _tie_digest(html) -> str:
    """Deterministic content digest used to break max-warc_ts ties."""
    import hashlib

    return hashlib.sha1(
        html if isinstance(html, (bytes, bytearray)) else bytes(html)
    ).hexdigest()


def latest_per_url_map(path: str) -> dict[str, tuple[int, str | None]]:
    """url → (max(warc_ts) in epoch-µs, tie-break digest or None),
    computed over a NARROW read (2 columns).

    The (url, warc_ts) projection is small relative to the html payload
    (~1/1000th), so a driver-side pyarrow group_by is the fast path — a
    distributed groupby here costs seconds of fixed scheduling overhead
    that dominates small runs and caps scaling. At 10^12 urls the
    url→max_ts map outgrows the driver either way; the scale path is
    :func:`latest_filter_join`.

    Ties (several snapshots of a url sharing max warc_ts — possible in
    real crawl data) are broken deterministically: the winner is the
    snapshot with the smallest sha1(html). html is read ONLY for tied
    urls (a filtered second scan; ties are rare)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(path).to_table(columns=["url", "warc_ts"])
    g = t.group_by("url").aggregate([("warc_ts", "max")])
    # store epoch-microseconds so the per-batch filter compares int64s
    us = pc.cast(g.column("warc_ts_max"), pa.int64()).to_pylist()
    max_map = dict(zip(g.column("url").to_pylist(), us))

    # vectorized tie detection: snapshots per (url, warc_ts), inner-
    # joined to the per-url max — rows with count > 1 are tied urls
    cnt = t.group_by(["url", "warc_ts"]).aggregate([([], "count_all")])
    maxtab = pa.table({"url": g.column("url"),
                       "warc_ts": g.column("warc_ts_max")})
    at_max = cnt.join(maxtab, keys=["url", "warc_ts"], join_type="inner")
    tied = (at_max.filter(pc.greater(at_max.column("count_all"), 1))
            .column("url").to_pylist())
    winner: dict[str, str] = {}
    if tied:
        tt = pads.dataset(path).to_table(
            columns=["url", "warc_ts", "html"],
            filter=pc.field("url").isin(tied))
        for u, ts, h in zip(
            tt.column("url").to_pylist(),
            pc.cast(tt.column("warc_ts"), pa.int64()).to_pylist(),
            tt.column("html").to_pylist(),
        ):
            if ts == max_map[u]:
                d = _tie_digest(h)
                if u not in winner or d < winner[u]:
                    winner[u] = d
    return {u: (m, winner.get(u)) for u, m in max_map.items()}


def latest_filter(batch: pa.Table, max_ref) -> pa.Table:
    """Broadcast semi-join: keep only the newest snapshot of each url.
    Stateless task; broadcast map resolved once per worker via the
    state cache. Vectorized: compare epoch-microsecond int64s, no
    per-row timestamp object construction; the sha1 tie-break runs only
    for rows of urls that actually have a max-ts tie (rare)."""
    import numpy as np
    import pyarrow.compute as pc

    from ferenda_ray.state import fetch

    max_us = fetch(max_ref)
    urls = batch.column("url").to_pylist()
    ts_us = pc.cast(batch.column("warc_ts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    want = np.fromiter((max_us.get(u, (-1, None))[0] for u in urls),
                       dtype=np.int64, count=len(urls))
    mask = ts_us == want
    if mask.any():
        html_col = None
        for i in np.nonzero(mask)[0]:
            w = max_us.get(urls[i], (None, None))[1]
            if w is not None:
                if html_col is None:
                    html_col = batch.column("html")
                if _tie_digest(html_col[i].as_py()) != w:
                    mask[i] = False
    return batch.filter(pa.array(mask, pa.bool_()))


def latest_filter_join(ds, *, num_buckets: int = 64):
    """Scale-path latest-per-url (the hash-bucket semi-join promised by
    the module docstring, for when the url→max_ts map outgrows the
    driver): the page stream is bucketed by ``hash(url) % B`` and each
    bucket task keeps the newest snapshot per url locally — the driver
    holds nothing. The wide html column crosses the shuffle once, which
    is unavoidable once the map can't be broadcast.

    Filter semantics are BIT-IDENTICAL to the broadcast path
    (``tests/test_pipeline.py``): keep rows with ts == max(url), and
    among max-ts ties only those whose sha1(html) is the minimum."""
    import pandas as pd

    from ferenda_ray.util import bucket_keys

    def add_bucket(b: pa.Table) -> pa.Table:
        buckets = bucket_keys(b.column("url"), num_buckets)
        return b.append_column("bucket", pa.array(buckets, pa.int32()))

    def keep_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            _ts=g["warc_ts"].astype("datetime64[us]").astype("int64"))
        top = g[g["_ts"] == g.groupby("url")["_ts"].transform("max")]
        # sha1 tie-break, computed only for rows of urls with a max tie
        sizes = top.groupby("url")["url"].transform("size")
        if (sizes > 1).any():
            tied = top[sizes > 1]
            digs = tied["html"].map(_tie_digest)
            keep = digs == digs.groupby(tied["url"]).transform("min")
            top = pd.concat([top[sizes == 1], tied[keep.to_numpy()]])
        return top.drop(columns=["_ts", "bucket"])

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(keep_latest, batch_format="pandas"))


# Above this many page snapshots (parquet metadata row count — no data
# read) the broadcast url→max_ts map stops being the default
# latest-per-url path and the hash-bucket join takes over: the MAP (one
# entry per distinct url), not the pages, is the driver-memory concern.
# 5M entries ≈ hundreds of MB of python dict — already a meaningful
# driver-heap bite; above that the join path is strictly safer (a 20M
# default was a multi-GB hazard before the switch tripped).
SNAPSHOT_BROADCAST_LIMIT = int(os.environ.get(
    "FERENDA_RAY_SNAPSHOT_BROADCAST_LIMIT", "5000000"))


def _dedupe_stage(ds, pages_path: str, dedupe_snapshots, batch_size: int):
    """latest-per-url with automatic broadcast-vs-join selection
    (reference D4 ``download_is_different``,
    ``documentrepository.py:1028-1034``). ``dedupe_snapshots`` values:
    True = auto (broadcast map below SNAPSHOT_BROADCAST_LIMIT snapshots,
    bucketed join above), "join"/"map" = forced, False = off. The two
    paths are bit-equality tested (tests/test_pipeline.py)."""
    import functools

    import pyarrow.dataset as pads

    if not dedupe_snapshots:
        return ds
    if dedupe_snapshots == "join":
        return latest_filter_join(ds)
    if (dedupe_snapshots is True
            and pads.dataset(pages_path).count_rows()
            > SNAPSHOT_BROADCAST_LIMIT):
        return latest_filter_join(ds)
    max_ref = ray.put(latest_per_url_map(pages_path))
    return ds.map_batches(
        functools.partial(latest_filter, max_ref=max_ref),
        batch_format="pyarrow", batch_size=batch_size)


_LINKER_CACHE: dict = {}


def _linker_for(alias_ref, emb_ref) -> EntityLinker:
    """EntityLinker built once per worker process from the broadcast
    state (alias dict + embedding matrix shipped via ``ray.put`` ONCE,
    resolved zero-copy from the local object store)."""
    from ferenda_ray.state import fetch

    key = (alias_ref.hex() if isinstance(alias_ref, ray.ObjectRef)
           else id(alias_ref),
           emb_ref.hex() if isinstance(emb_ref, ray.ObjectRef)
           else id(emb_ref))
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        alias = fetch(alias_ref) if alias_ref is not None else {}
        uris, matrix = fetch(emb_ref) if emb_ref is not None else (None, None)
        linker = _LINKER_CACHE[key] = EntityLinker(alias, uris, matrix)
    return linker


def triple_emit_batch(batch: pa.Table, alias_ref=None,
                      emb_ref=None) -> pa.Table:
    """Stateless task stage: docs batch (url, warc_ts, lang, title,
    tree) → ALL triples for those docs (metadata + structure + citations
    + linked entity mentions) in one pass.

    A task (not actor-pool) stage so the fused
    extract→structure→triple-emit chain elastically uses EVERY cluster
    CPU — a fixed actor pool caps the whole fused chain at pool size
    (observed: half the CPUs idle). The linker state is still loaded
    once per worker via ``_linker_for`` (SURVEY §2.3 ST1 semantics; the
    actor-pool variant remains as ``TripleEmitStage``).
    """
    return _emit(batch, _linker_for(alias_ref, emb_ref))


def pages_to_triples_batch(batch: pa.Table, alias_ref=None,
                           emb_ref=None) -> pa.Table:
    """Single-pass pages → triples: extract + FSM structure + emit +
    link without serializing the blocks/tree to JSON between stages.
    The stage boundaries still exist as composable functions
    (extract_batch / structure_batch / triple_emit_batch feed the
    sections/entries/composite products); the flagship uses this fused
    path because the per-doc JSON round trips were pure overhead inside
    one fused Ray task."""
    from ferenda_ray.stages import extract as ex
    from ferenda_ray.stages.structure import parse_blocks

    linker = _linker_for(alias_ref, emb_ref)
    if ex._EXTRACTOR is None:
        ex._EXTRACTOR = ex._FastExtractor()
    extractor = ex._EXTRACTOR
    rows: list[dict] = []
    for url, ts, lang_in, html in zip(
        batch.column("url").to_pylist(),
        batch.column("warc_ts").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("html").to_pylist(),
    ):
        try:
            lang, title, blocks = extractor.run(html)
            tree = parse_blocks(blocks)
        except Exception:
            lang, title, tree = "", "", {"kind": "Body", "children": []}
        _emit_doc(url, ts, (lang or lang_in or ""), title, tree, linker,
                  rows)
    return _rows_table(rows)


class TripleEmitStage:
    """Actor-pool variant of ``triple_emit_batch`` (state in
    ``__init__``): use when linker state is too heavy for per-process
    caches or needs GPU residency."""

    def __init__(self, alias_ref=None, emb_ref=None):
        def get(r):
            return ray.get(r) if isinstance(r, ray.ObjectRef) else r

        alias = get(alias_ref) if alias_ref is not None else {}
        uris, matrix = (None, None)
        if emb_ref is not None:
            uris, matrix = get(emb_ref)
        self.linker = EntityLinker(alias, uris, matrix)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _emit(batch, self.linker)


def _emit_doc(url, ts, lang, title, tree: dict, linker: EntityLinker,
              rows: list[dict]) -> None:
    """All triples for ONE parsed document appended to ``rows``."""
    rows.extend(doc_triples(url, ts, lang, title, tree))
    for sec in sections_rows(url, tree, title):
        about, text = sec["about"], sec["text"]
        for target in scan_citations(text):
            rows.append(_ref_triple(about, S.DCT_REFERENCES, target, url))
        for m in _MENTION.finditer(text):
            uri = linker.link(m.group(1))
            if uri is not None:
                rows.append(_ref_triple(about, S.DCT_SUBJECT, uri, url))


def _rows_table(rows: list[dict]) -> pa.Table:
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


def _emit(batch: pa.Table, linker: EntityLinker) -> pa.Table:
    rows: list[dict] = []
    for url, ts, lang, title, tj in zip(
        batch.column("url").to_pylist(),
        batch.column("warc_ts").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("title").to_pylist(),
        batch.column("tree").to_pylist(),
    ):
        _emit_doc(url, ts, lang, title, json.loads(tj), linker, rows)
    return _rows_table(rows)


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


def build_triples_ds(pages_path: str, *, link_concurrency=None,
                     batch_size: int = 64, dedupe_snapshots: bool = True,
                     content_filter: list[str] | None = None):
    """pages parquet → canonical triples Dataset (lazy; not materialized).

    ``link_concurrency=None`` (default) runs triple-emit+linking as
    stateless tasks (linker built once per worker process from the
    broadcast refs) so the fused heavy chain scales to every CPU; an
    integer switches to a fixed actor pool of that size (for heavy /
    GPU-resident linker state)."""
    alias, emb, canon = default_link_state()
    alias_ref = ray.put(alias)
    emb_ref = ray.put(emb)
    canon_ref = ray.put(canon)

    import functools

    if link_concurrency is None:
        # single-pass fused path: extract+parse+emit+link in one task fn
        ds = read_pages(pages_path)
        if content_filter:
            from ferenda_ray.stages.extract import raw_prefilter

            ds = ds.map_batches(
                functools.partial(raw_prefilter, needles=content_filter),
                batch_format="pyarrow", batch_size=batch_size,
            )
        ds = _dedupe_stage(ds, pages_path, dedupe_snapshots, batch_size)
        ds = ds.map_batches(
            functools.partial(pages_to_triples_batch, alias_ref=alias_ref,
                              emb_ref=emb_ref),
            batch_format="pyarrow", batch_size=batch_size,
        )
    else:
        ds = build_docs_ds(pages_path, batch_size=batch_size,
                           dedupe_snapshots=dedupe_snapshots)
        ds = ds.map_batches(
            TripleEmitStage,
            fn_constructor_kwargs={"alias_ref": alias_ref, "emb_ref": emb_ref},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=link_concurrency,
        )
    # NOTE: keep this batch_size == the chain's batch_size — operator
    # fusion makes the LARGEST batch_size in the fused chain the input
    # bundling unit, and a big value here (e.g. 8192 docs) collapses the
    # whole heavy chain into a handful of giant tasks (observed: 3 tasks
    # on 32 CPUs).
    ds = ds.map_batches(
        functools.partial(canon_batch, canon_ref=canon_ref),
        batch_format="pyarrow", batch_size=batch_size,
    )
    return ds


def build_docs_ds(pages_path: str, *, batch_size: int = 64,
                  dedupe_snapshots: bool = True):
    """pages parquet → docs Dataset (url, warc_ts, lang, title, text,
    tree) — the shared upstream of triples / sections / entries."""
    ds = read_pages(pages_path)
    ds = _dedupe_stage(ds, pages_path, dedupe_snapshots, batch_size)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                        batch_size=batch_size)
    return ds.map_batches(structure_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def build_sections_ds(pages_path: str, *, batch_size: int = 64):
    """The fulltext-index table (reference S12 ``relate_fulltext``,
    ``documentrepository.py:2010-2086``): one row per addressable
    (url, fragment) resource with its plaintext."""
    from ferenda_ray.stages.structure import sections_batch

    return build_docs_ds(pages_path, batch_size=batch_size).map_batches(
        sections_batch, batch_format="pyarrow", batch_size=batch_size)


def build_entries_ds(pages_path: str, *, batch_size: int = 64):
    """Per-doc lineage/validation rows (reference DocumentEntry /
    ``get_status`` A6 analog)."""
    from ferenda_ray.stages.triples import entries_batch

    return build_docs_ds(pages_path, batch_size=batch_size).map_batches(
        entries_batch, batch_format="pyarrow", batch_size=batch_size)


def run_kg_pipeline(pages_path: str, out_dir: str, *,
                    num_buckets: int = mat.DEFAULT_BUCKETS,
                    link_concurrency=None, batch_size: int = 64,
                    resume: bool = True):
    """Full extract→link→canonicalize→materialize run; returns the
    manifest DataFrame (one row per bucket written)."""
    ds = build_triples_ds(pages_path, link_concurrency=link_concurrency,
                          batch_size=batch_size)
    return mat.materialize(ds, out_dir, num_buckets=num_buckets, resume=resume)
