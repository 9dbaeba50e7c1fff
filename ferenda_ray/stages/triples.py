"""Stage S2b — RDF-shaped triple emission from parsed documents.

The reference distills triples by rendering XHTML+RDFa and re-parsing it
(``decorators.py:209-235``); per SURVEY §7.6.3 we emit triples DIRECTLY
from the element tree + metadata — same triple set, no XHTML round trip,
no blank nodes (section subjects are skolemized to ``url#S{ordinal}``
fragment URIs, sidestepping the reference's glacial bnode graph_diff,
``decorators.py:245-258``).

Doc-level triples mirror ``parse_metadata_from_soup``
(``documentrepository.py:1209-1250``): rdf:type, dcterms:title (language
tagged), dcterms:identifier, dcterms:language, dcterms:issued (xsd:date
from warc_ts), prov:wasGeneratedBy. Section triples mirror
``decorate_bodyparts`` (``w3c.py:290-303``): rdf:type bibo:DocumentPart,
bibo:chapter ordinal, dcterms:title, dcterms:isPartOf/hasPart.

Batch-level validations replace the reference's render-time checks:
required predicates (``decorators.py:239-244``) and the
``max_resources=1000`` sub-resource cap
(``documentrepository.py:1613-1629``) — violations flagged in the
``entries`` lineage stream, never raised (a poison row must not kill a
batch).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ferenda_ray import schemas as S

MAX_RESOURCES = 1000
REQUIRED_PREDICATES = (S.RDF_TYPE, S.DCT_TITLE, S.DCT_IDENTIFIER)


def _t(subj, pred, obj, *, uri=False, lang="", datatype="", url=""):
    return {
        "subj": subj,
        "pred": pred,
        "obj": obj,
        "obj_is_uri": uri,
        "lang": lang,
        "datatype": datatype,
        "url": url,
    }


def doc_triples(url: str, warc_ts, lang: str, title: str, tree: dict) -> list[dict]:
    """All metadata/structure triples for one parsed document."""
    out = [
        _t(url, S.RDF_TYPE, S.BIBO_DOCUMENT, uri=True, url=url),
        _t(url, S.DCT_IDENTIFIER, url.rsplit("/", 1)[-1], url=url),
        _t(url, S.PROV_WASGENERATEDBY, S.ENGINE_URI, uri=True, url=url),
    ]
    if title:
        out.append(_t(url, S.DCT_TITLE, title, lang=lang, url=url))
    if lang:
        out.append(_t(url, S.DCT_LANGUAGE, lang, url=url))
    if warc_ts is not None:
        out.append(
            _t(url, S.DCT_ISSUED, warc_ts.date().isoformat(),
               datatype=S.XSD_DATE, url=url)
        )

    def walk(elem, parent_uri):
        for ch in elem.get("children", []):
            if ch["kind"] != "Section":
                continue
            s_uri = f"{url}#S{ch['ordinal']}"
            out.append(_t(s_uri, S.RDF_TYPE, S.BIBO_DOCUMENTPART, uri=True, url=url))
            out.append(_t(s_uri, S.BIBO_CHAPTER, ch["ordinal"], url=url))
            if ch.get("title"):
                out.append(_t(s_uri, S.DCT_TITLE, ch["title"], lang=lang, url=url))
            out.append(_t(s_uri, S.DCT_ISPARTOF, parent_uri, uri=True, url=url))
            out.append(_t(parent_uri, S.DCT_HASPART, s_uri, uri=True, url=url))
            walk(ch, s_uri)

    walk(tree, url)
    return out


def validate_doc(url: str, triples: list[dict]) -> tuple[bool, str]:
    """required-predicate + max-resources checks → (ok, reason)."""
    preds = {t["pred"] for t in triples if t["subj"] == url}
    missing = [p for p in REQUIRED_PREDICATES if p not in preds]
    if missing:
        return False, f"missing required predicates: {','.join(missing)}"
    n_res = len({t["subj"] for t in triples})
    if n_res > MAX_RESOURCES:
        return False, f"too many resources: {n_res} > {MAX_RESOURCES}"
    return True, ""


def _triples_to_table(rows: list[dict]) -> pa.Table:
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


def triples_batch(batch: pa.Table) -> pa.Table:
    """docs batch (url, warc_ts, lang, title, tree) → triples rows."""
    rows: list[dict] = []
    ts_col = batch.column("warc_ts").to_pylist()
    for url, ts, lang, title, tj in zip(
        batch.column("url").to_pylist(),
        ts_col,
        batch.column("lang").to_pylist(),
        batch.column("title").to_pylist(),
        batch.column("tree").to_pylist(),
    ):
        rows.extend(doc_triples(url, ts, lang, title, json.loads(tj)))
    return _triples_to_table(rows)


def entries_batch(batch: pa.Table) -> pa.Table:
    """docs batch → per-doc lineage rows for the parse stage (validation
    results; reference DocumentEntry analog)."""
    urls, oks, reasons = [], [], []
    for url, ts, lang, title, tj in zip(
        batch.column("url").to_pylist(),
        batch.column("warc_ts").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("title").to_pylist(),
        batch.column("tree").to_pylist(),
    ):
        ok, reason = validate_doc(url, doc_triples(url, ts, lang, title, json.loads(tj)))
        urls.append(url)
        oks.append(ok)
        reasons.append(reason)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "stage": pa.array(["parse"] * len(urls), pa.string()),
            "ok": pa.array(oks, pa.bool_()),
            "reason": pa.array(reasons, pa.string()),
            "t_ms": pa.array([0.0] * len(urls), pa.float64()),
        }
    )
