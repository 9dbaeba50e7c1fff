"""ECMA-standard clause rule pack over the FSM engine (reference
``sources/tech/ecma.py`` — a ``PDFDocumentRepository``: the download
side is n/a here, the pack supplies the PARSE conventions an ECMA
standard's PDF text stream follows):

* numbered clause headings (``1 Scope``, ``4.2.1 Requirements`` —
  dotted ordinals, nesting by ordinal depth with multi-level unwind,
  exactly the rfc/w3c re-nesting shape, ``stages/structure.py``);
* annex headings (``Annex A (normative) Grammar``) — top-level
  sections keyed by letter;
* ``NOTE`` / ``NOTE n`` paragraphs — typed child elements.

Input is the PDF path's textbox stream (``stages/pdf.py``): raw
``(doc_id, fmt, data)`` intermediates parse + glue inside the batch,
boxes ordered (page, top) become the chunk stream, and the FSM
re-nests them. :func:`ecma_rows_batch` flattens the tree to one row
per clause/annex with paragraph/note tallies — every column
recomputable by a DuckDB window scan over the cached textbox rows
(:func:`ecma_clauses_sql`), so the driver oracle checks the pack's
SEMANTICS (nearest-preceding-heading ownership), not self-consistency.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ferenda_ray.stages.fsm import FSMParser

# ASCII-pinned (the oracle regexes are RE2)
_CLAUSE_RE = re.compile(r"^(\d+(?:\.\d+)*) ([A-Z].*)$", re.ASCII)
_ANNEX_RE = re.compile(
    r"^Annex ([A-Z])(?: \((normative|informative)\))?(?: (.*))?$",
    re.ASCII)
_NOTE_RE = re.compile(r"^NOTE(?: \d+)? ", re.ASCII)
MAX_HEADING_LEN = 80  # a numbered line longer than this is body text


def is_clause(parser, chunk) -> bool:
    t = chunk["text"]
    return len(t) <= MAX_HEADING_LEN and _CLAUSE_RE.match(t) is not None


def is_annex(parser, chunk) -> bool:
    t = chunk["text"]
    return len(t) <= MAX_HEADING_LEN and _ANNEX_RE.match(t) is not None


def is_note(parser, chunk) -> bool:
    return _NOTE_RE.match(chunk["text"]) is not None


def is_paragraph(parser, chunk) -> bool:
    return True


def _make_body(parser) -> dict:
    return parser.make_children({"kind": "Body", "children": []})


def _make_clause(parser) -> dict:
    chunk = parser.reader.next()
    m = _CLAUSE_RE.match(chunk["text"])
    return parser.make_children({
        "kind": "Clause", "ordinal": m.group(1), "title": m.group(2),
        "children": []})


def _make_annex(parser) -> dict:
    chunk = parser.reader.next()
    m = _ANNEX_RE.match(chunk["text"])
    return parser.make_children({
        "kind": "Annex", "ordinal": m.group(1),
        "normative": m.group(2) == "normative",
        "title": m.group(3) or "", "children": []})


def _make_note(parser) -> dict:
    chunk = parser.reader.next()
    return {"kind": "Note", "text": chunk["text"]}


def _make_paragraph(parser) -> dict:
    chunk = parser.reader.next()
    return {"kind": "Paragraph", "text": chunk["text"]}


def _depth(ordinal: str) -> int:
    return ordinal.count(".") + 1


def clause_or_unwind(parser, chunk):
    """Deeper ordinal opens a child clause; otherwise unwind to the
    ancestor that can host it (the structure.py section_or_unwind
    shape, reference ``fsmparser.py`` (False, newstate) semantics)."""
    d = _depth(_CLAUSE_RE.match(chunk["text"]).group(1))
    cur = parser.current_state
    if cur == "body" or (cur[0] == "clause" and d > cur[1]):
        return (_make_clause, ("clause", d))
    if cur[0] == "annex":  # clauses inside an annex nest under it
        return (_make_clause, ("clause", d))
    return (False, None)


def annex_or_unwind(parser, chunk):
    """Annexes are top level: unwind everything below body."""
    if parser.current_state == "body":
        return (_make_annex, ("annex", 0))
    return (False, None)


def make_parser() -> FSMParser:
    p = FSMParser()
    p.set_recognizers(is_annex, is_clause, is_note, is_paragraph)
    p.set_transitions({
        ("*", is_clause): clause_or_unwind,
        ("*", is_annex): annex_or_unwind,
        ("*", is_note): (_make_note, None),
        ("*", is_paragraph): (_make_paragraph, None),
    })
    p.initial_state = "body"
    p.initial_constructor = _make_body
    return p


def parse_boxes(texts: list[str]) -> dict:
    """Ordered textbox texts → ECMA element tree."""
    return make_parser().parse([{"text": t} for t in texts])


def clause_rows(doc_id: int, tree: dict) -> list[dict]:
    """Tree → one row per Clause/Annex: ordinal, kind, title, depth,
    direct-child paragraph/note tallies."""
    rows: list[dict] = []

    def walk(elem, depth):
        for ch in elem.get("children", []):
            if ch["kind"] in ("Clause", "Annex"):
                kids = ch.get("children", [])
                rows.append({
                    "doc_id": doc_id, "ordinal": ch["ordinal"],
                    "kind": ch["kind"], "title": ch["title"],
                    "depth": (_depth(ch["ordinal"])
                              if ch["kind"] == "Clause" else 1),
                    "n_paragraphs": sum(k["kind"] == "Paragraph"
                                        for k in kids),
                    "n_notes": sum(k["kind"] == "Note" for k in kids),
                })
                walk(ch, depth + 1)

    walk(tree, 1)
    return rows


def ecma_rows_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fmt, data) PDF intermediates → clause/annex rows (parse
    + glue + FSM inside the batch — a document never spans batches)."""
    from ferenda_ray.stages.pdf import (box_text, glue_textboxes,
                                        parse_hocr, parse_pdf2xml)

    rows: list[dict] = []
    for doc_id, fmt, data in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("fmt").to_pylist(),
                                 batch.column("data").to_pylist()):
        try:
            pages = (parse_pdf2xml(data) if fmt == "pdf2xml"
                     else parse_hocr(data))
        except Exception:
            continue  # poison pills must not fail the batch
        texts = [box_text(b).strip() for page in pages
                 for b in glue_textboxes(page)]
        rows.extend(clause_rows(doc_id, parse_boxes(texts)))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "ordinal": pa.array([r["ordinal"] for r in rows], pa.string()),
        "kind": pa.array([r["kind"] for r in rows], pa.string()),
        "title": pa.array([r["title"] for r in rows], pa.string()),
        "depth": pa.array([r["depth"] for r in rows], pa.int64()),
        "n_paragraphs": pa.array([r["n_paragraphs"] for r in rows],
                                 pa.int64()),
        "n_notes": pa.array([r["n_notes"] for r in rows], pa.int64()),
    })


def ecma_clauses_sql(parquet_path: str) -> str:
    """DuckDB recompute over the cached textbox rows: a box's owner is
    the nearest PRECEDING clause/annex heading (exactly what FSM
    nesting yields for direct children — a deeper clause closes its
    parent's paragraph run), tallied by a running-max window."""
    return f"""
WITH tb AS (
    SELECT doc_id, trim(text) AS t,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY page, top, "left") AS rn
    FROM read_parquet('{parquet_path}/*.parquet')
), tagged AS (
    SELECT doc_id, t, rn,
           (len(t) <= {MAX_HEADING_LEN} AND regexp_matches(
               t, '^([0-9]+(\\.[0-9]+)*) ([A-Z].*)$')) AS is_clause,
           (len(t) <= {MAX_HEADING_LEN} AND regexp_matches(
               t, '^Annex ([A-Z])( \\((normative|informative)\\))?( (.*))?$'))
               AS is_annex,
           regexp_matches(t, '^NOTE( [0-9]+)? ') AS is_note
    FROM tb
), owned AS (
    SELECT doc_id, t, rn, is_clause, is_annex, is_note,
           max(CASE WHEN is_clause OR is_annex THEN rn END)
               OVER (PARTITION BY doc_id ORDER BY rn) AS head_rn
    FROM tagged
), heads AS (
    SELECT doc_id, rn AS head_rn,
           CASE WHEN is_clause
                THEN regexp_extract(t, '^([0-9]+(\\.[0-9]+)*) ', 1)
                ELSE regexp_extract(t, '^Annex ([A-Z])', 1) END AS ordinal,
           CASE WHEN is_clause THEN 'Clause' ELSE 'Annex' END AS kind,
           CASE WHEN is_clause
                THEN regexp_extract(t, '^[0-9]+(\\.[0-9]+)* (.*)$', 2)
                ELSE coalesce(nullif(regexp_extract(t,
                    '^Annex [A-Z]( \\((normative|informative)\\))? (.*)$',
                    3), ''), '') END AS title,
           CASE WHEN is_clause
                THEN len(string_split(regexp_extract(
                    t, '^([0-9]+(\\.[0-9]+)*) ', 1), '.'))
                ELSE 1 END AS depth
    FROM tagged WHERE is_clause OR is_annex
), tallies AS (
    SELECT doc_id, head_rn,
           sum(CASE WHEN NOT (is_clause OR is_annex OR is_note)
               THEN 1 ELSE 0 END) AS n_paragraphs,
           sum(CASE WHEN is_note THEN 1 ELSE 0 END) AS n_notes
    FROM owned WHERE head_rn IS NOT NULL AND rn > head_rn
    GROUP BY doc_id, head_rn
)
SELECT h.doc_id, h.ordinal, h.kind, h.title,
       CAST(h.depth AS BIGINT) AS depth,
       CAST(coalesce(t.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
       CAST(coalesce(t.n_notes, 0) AS BIGINT) AS n_notes
FROM heads h LEFT JOIN tallies t USING (doc_id, head_rn)
"""


def synthetic_ecma_pdf2xml(doc_id: int) -> bytes:
    """Deterministic ECMA-convention pdf2xml intermediate: title box,
    numbered clauses to depth 3 with unwinds, NOTE paragraphs, one
    annex — the structure conventions the pack recognizes."""
    heading_font = ('\t<fontspec id="0" size="14" '
                    'family="ECMA+Sans-Bold" color="#000000"/>')
    body_font = ('\t<fontspec id="1" size="10" family="ECMA+Serif" '
                 'color="#000000"/>')
    blocks = [
        (0, f"Standard ECMA-{400 + doc_id}"),
        (0, "1 Scope"),
        (1, f"This Standard defines synthetic construct {doc_id}."),
        (0, "2 Conformance"),
        (1, "A conforming implementation satisfies every clause."),
        (1, "NOTE Conformance is self-declared."),
        (0, "2.1 Normative references"),
        (1, f"ECMA-{400 + (doc_id + 1) % 40} applies."),
        (0, "2.1.1 Dated references"),
        (1, "Only the edition cited applies."),
        (0, "3 Definitions"),  # unwind 2.1.1 -> top level
        (1, f"NOTE 2 Terms follow common usage in doc {doc_id}."),
        (1, "Terms and definitions are given below."),
        (0, "Annex A (normative) Grammar"),
        (1, "The grammar is given in extended BNF."),
        (1, "NOTE Annex notes are typed too."),
    ]
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<pdf2xml producer="poppler" version="0.24.3">',
           '<page number="1" position="absolute" top="0" left="0" '
           'height="1263" width="892">', heading_font, body_font]
    top = 80
    for font, text in blocks:
        # headings in the bold font, body in serif; vertical gaps keep
        # glue_textboxes from merging separate logical blocks
        out.append(f'<text top="{top}" left="90" width="600" '
                   f'height="{14 if font else 18}" font="{font}">'
                   f'{text}</text>')
        top += 60
    out.append("</page>")
    out.append("</pdf2xml>")
    return "\n".join(out).encode()
