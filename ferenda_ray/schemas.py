"""Fixed Arrow schemas for the engine's logical tables.

Maps the reference's file-per-document artifacts onto columnar tables
(SURVEY.md §1.2):

* ``pages``    — input_hint table of crawled web pages.
* ``blocks``   — flat extracted block stream per page (pre-FSM chunks).
* ``docs``     — per-page extraction output: text + element-tree JSON
                 (reference analog: ``parsed/<basefile>.xhtml``,
                 ``documentrepository.py:1387-1424``).
* ``triples``  — long-form RDF-shaped triple table (reference analog:
                 ``distilled/<basefile>.rdf`` union ``dump.nt``,
                 ``decorators.py:209-235``).
* ``sections`` — one row per addressable (url, fragment) resource
                 (reference analog: fulltext index docs,
                 ``fulltextindex.py:120-151``).
* ``entries``  — per-doc lineage/metrics (reference analog:
                 ``documententry.py:27-145``).
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("tree", pa.large_string()),  # element-tree JSON (elements.py:53-67 analog)
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_uri", pa.bool_()),
        ("lang", pa.string()),       # "" when absent/datatyped
        ("datatype", pa.string()),   # "" when plain/lang literal or URI
        ("url", pa.string()),        # provenance page
    ]
)

SECTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("fragment", pa.string()),   # "" for the doc root
        ("about", pa.string()),      # url + ("#" + fragment if fragment)
        ("title", pa.string()),
        ("ordinal", pa.string()),
        ("text", pa.large_string()),
    ]
)

ENTRIES = pa.schema(
    [
        ("url", pa.string()),
        ("stage", pa.string()),
        ("ok", pa.bool_()),
        ("reason", pa.string()),
        ("t_ms", pa.float64()),
    ]
)

# Well-known vocabulary URIs (Dublin Core / RDF / bibo / prov / foaf),
# the namespaces the reference binds in make_graph
# (documentrepository.py:1363-1375).
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DCT = "http://purl.org/dc/terms/"
DCT_TITLE = DCT + "title"
DCT_IDENTIFIER = DCT + "identifier"
DCT_LANGUAGE = DCT + "language"
DCT_ISSUED = DCT + "issued"
DCT_REFERENCES = DCT + "references"
DCT_SUBJECT = DCT + "subject"
DCT_HASPART = DCT + "hasPart"
DCT_ISPARTOF = DCT + "isPartOf"
BIBO = "http://purl.org/ontology/bibo/"
BIBO_DOCUMENT = BIBO + "Document"
BIBO_DOCUMENTPART = BIBO + "DocumentPart"
BIBO_CHAPTER = BIBO + "chapter"
PROV_WASGENERATEDBY = "http://www.w3.org/ns/prov#wasGeneratedBy"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_DATE = XSD + "date"
XSD_GYEARMONTH = XSD + "gYearMonth"
ENGINE_URI = "https://ferenda-ray.example.org/engine"
