"""Stage S2 — webtext structural rule pack over the FSM engine.

Re-nests the flat block stream from extraction into a nested element tree
(Body → Section(ordinal) → Paragraph/List/Preformatted), the same job the
reference's RFC and W3C rule packs do over their chunk streams
(``rfc.py:382-428`` numbered-section recognizers, ``w3c.py:179-207``
FSM re-nesting of flat H1-H4 structure). Section ordinals are dotted
numbers ("1", "1.2", "1.2.3"); nesting is by ordinal depth with
multi-level unwind.

Also derives the ``sections`` table (one row per addressable fragment,
reference analog ``documentrepository.py:2010-2086`` fulltext resource
selection + ``decorate_bodyparts`` ``w3c.py:290-303``).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ferenda_ray.stages.fsm import FSMParser

_ORDINAL_RE = re.compile(r"^(\d+(?:\.\d+)*)\.?\s+(.*)$")


# -- recognizers (priority order; reference rfc.py:337-380 analog) --------

def is_section_heading(parser, chunk) -> bool:
    return (
        chunk["kind"] == "heading"
        and chunk["level"] >= 2
        and _ORDINAL_RE.match(chunk["text"]) is not None
    )


def is_heading(parser, chunk) -> bool:
    return chunk["kind"] == "heading"


def is_listitem(parser, chunk) -> bool:
    return chunk["kind"] == "listitem"


def is_cell(parser, chunk) -> bool:
    return chunk["kind"] == "cell"


def is_preformatted(parser, chunk) -> bool:
    return chunk["kind"] == "preformatted"


def is_paragraph(parser, chunk) -> bool:
    return True  # fallback


# -- constructors ---------------------------------------------------------

def make_body(parser) -> dict:
    return parser.make_children({"kind": "Body", "children": []})


def make_section(parser) -> dict:
    chunk = parser.reader.next()
    m = _ORDINAL_RE.match(chunk["text"])
    ordinal, title = m.group(1), m.group(2)
    elem = {
        "kind": "Section",
        "ordinal": ordinal,
        "title": title,
        "children": [],
    }
    return parser.make_children(elem)


def make_heading(parser) -> dict:
    chunk = parser.reader.next()
    return {"kind": "Heading", "level": chunk["level"], "text": chunk["text"]}


def make_paragraph(parser) -> dict:
    chunk = parser.reader.next()
    return {"kind": "Paragraph", "text": chunk["text"]}


def make_pre(parser) -> dict:
    chunk = parser.reader.next()
    return {"kind": "Preformatted", "text": chunk["text"]}


def make_list(parser) -> dict:
    """Consume the run of consecutive listitem chunks into a (possibly
    NESTED) list tree, driven by the extractor's per-item ``depth`` /
    ``ordered`` metadata (reference ``elements.py:632-660``
    OrderedList/UnorderedList/ListItem nesting; items without metadata —
    e.g. hand-written FSM fixtures — stay a flat UnorderedList)."""
    first = parser.reader.peek()
    root = {"kind": "OrderedList" if first.get("ordered")
            else "UnorderedList", "children": []}
    stack: list[tuple[int, dict]] = [(first.get("depth", 1), root)]
    while not parser.reader.eof:
        nxt = parser.reader.peek()
        if nxt["kind"] != "listitem":
            break
        d = nxt.get("depth", 1)
        if (d <= stack[0][0]
                and (root["kind"] == "OrderedList") != bool(nxt.get("ordered"))):
            break  # ol↔ul change at top level → sibling list (next parse)
        parser.reader.next()
        while len(stack) > 1 and d < stack[-1][0]:
            stack.pop()
        if (len(stack) > 1 and d == stack[-1][0]
                and (stack[-1][1]["kind"] == "OrderedList")
                != bool(nxt.get("ordered"))):
            # ol↔ul change at a NESTED depth: close the sublist and open
            # a sibling sublist of the matching kind under the same host
            stack.pop()
            cur = stack[-1][1]
            if not cur["children"]:
                cur["children"].append({"kind": "ListItem", "text": ""})
            host = cur["children"][-1]
            sub = {"kind": "OrderedList" if nxt.get("ordered")
                   else "UnorderedList", "children": []}
            host.setdefault("children", []).append(sub)
            stack.append((d, sub))
        if d > stack[-1][0]:
            # deeper item: open a sublist under the last item of the
            # current list (synthesize a host item for malformed input)
            cur = stack[-1][1]
            if not cur["children"]:
                cur["children"].append({"kind": "ListItem", "text": ""})
            host = cur["children"][-1]
            sub = {"kind": "OrderedList" if nxt.get("ordered")
                   else "UnorderedList", "children": []}
            host.setdefault("children", []).append(sub)
            stack.append((d, sub))
        stack[-1][1]["children"].append(
            {"kind": "ListItem", "text": nxt["text"]})
    return root


def make_table(parser) -> dict:
    """Consume the run of consecutive cell chunks into a
    Table → TableRow → TableCell tree using the extractor's row/tdepth
    metadata (reference ``elements.py`` Table/TableRow/TableCell). A
    change in the extractor's per-document table id (``tid``) marks the
    start of a SIBLING table (left for the next parse call); a row-index
    decrease is kept as a fallback boundary for tid-less fixtures."""
    first = parser.reader.peek()
    table = {"kind": "Table", "children": []}
    cur_row = None
    last_row_idx = -1
    depth = first.get("tdepth", 1)
    tid = first.get("tid")
    while not parser.reader.eof:
        nxt = parser.reader.peek()
        if nxt["kind"] != "cell":
            break
        r = nxt.get("row", 0)
        if (nxt.get("tid") != tid or nxt.get("tdepth", 1) != depth
                or r < last_row_idx):
            break  # sibling/other table
        parser.reader.next()
        if r != last_row_idx:
            cur_row = {"kind": "TableRow", "children": []}
            table["children"].append(cur_row)
            last_row_idx = r
        cur_row["children"].append({"kind": "TableCell",
                                    "text": nxt["text"],
                                    "header": bool(nxt.get("header"))})
    return table


def _depth(ordinal: str) -> int:
    return ordinal.count(".") + 1


def section_or_unwind(parser, chunk):
    """Data-dependent transition: a numbered heading either opens a child
    subsection (deeper ordinal) or belongs to an ancestor → unwind
    (reference ``fsmparser.py:229-239`` (False, newstate) semantics)."""
    d = _depth(_ORDINAL_RE.match(chunk["text"]).group(1))
    cur = parser.current_state
    if cur == "body" or d > cur[1]:
        return (make_section, ("section", d))
    return (False, None)


def make_parser() -> FSMParser:
    p = FSMParser()
    p.set_recognizers(
        is_section_heading, is_heading, is_listitem, is_cell,
        is_preformatted, is_paragraph
    )
    p.set_transitions(
        {
            ("*", is_section_heading): section_or_unwind,
            ("*", is_heading): (make_heading, None),
            ("*", is_listitem): (make_list, None),
            ("*", is_cell): (make_table, None),
            ("*", is_preformatted): (make_pre, None),
            ("*", is_paragraph): (make_paragraph, None),
        }
    )
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


def parse_blocks(blocks: list[dict]) -> dict:
    """blocks → element tree (fresh per-doc parse, shared parser config)."""
    return make_parser().parse(blocks)


def serialize_tree(tree: dict) -> str:
    """Canonical JSON serialization of an element tree (reference analog:
    ``elements.serialize``, ``elements.py:53-67``)."""
    return json.dumps(tree, ensure_ascii=False, sort_keys=True)


# -- in-tree citation annotation (LinkSubject) ------------------------------

def _link_parts(text: str) -> list[dict] | None:
    """Split a text span around its citation spans into Str/LinkSubject
    parts (reference ``citationparser.py:120-145`` inserts LinkSubject
    nodes in place of matched text). None when there is nothing to
    link."""
    from ferenda_ray.stages.link import scan_citation_spans

    spans = scan_citation_spans(text)
    if not spans:
        return None
    parts: list[dict] = []
    pos = 0
    for s, e, uri in spans:
        if s > pos:
            parts.append({"kind": "Str", "text": text[pos:s]})
        parts.append({"kind": "LinkSubject", "uri": uri,
                      "text": text[s:e]})
        pos = e
    if pos < len(text):
        parts.append({"kind": "Str", "text": text[pos:]})
    return parts


def annotate_citations(elem: dict) -> dict:
    """Recursively attach ``parts`` (Str/LinkSubject sequence) to every
    text-bearing Paragraph/ListItem containing citations, IN the tree —
    so the generate stage emits linked HTML. ``text`` is kept verbatim
    (plaintext derivations and triple emission are unchanged)."""
    if elem.get("kind") in ("Paragraph", "ListItem") and elem.get("text"):
        parts = _link_parts(elem["text"])
        if parts:
            elem["parts"] = parts
    for ch in elem.get("children", []):
        annotate_citations(ch)
    return elem


# -- sections derivation --------------------------------------------------

def _element_text(elem: dict) -> list[str]:
    out = []
    if elem.get("text"):
        out.append(elem["text"])
    for ch in elem.get("children", []):
        if ch["kind"] == "Section":
            continue  # sub-resources excluded (_extract_plaintext analog,
            # reference documentrepository.py:2131-2150)
        out.extend(_element_text(ch))
    return out


def sections_rows(url: str, tree: dict, doc_title: str) -> list[dict]:
    """One row per addressable resource: the doc root (fragment "") plus
    every Section (fragment "S{ordinal}")."""
    rows = [
        {
            "url": url,
            "fragment": "",
            "about": url,
            "title": doc_title,
            "ordinal": "",
            "text": " ".join(_element_text(tree)),
        }
    ]

    def walk(elem):
        for ch in elem.get("children", []):
            if ch["kind"] == "Section":
                frag = f"S{ch['ordinal']}"
                rows.append(
                    {
                        "url": url,
                        "fragment": frag,
                        "about": f"{url}#{frag}",
                        "title": ch["title"],
                        "ordinal": ch["ordinal"],
                        "text": " ".join(_element_text(ch)),
                    }
                )
                walk(ch)

    walk(tree)
    return rows


# -- Ray stages -----------------------------------------------------------

def structure_batch(batch: pa.Table) -> pa.Table:
    """docs batch (with ``blocks`` JSON) → + ``tree`` JSON column.

    Stateless task-pool stage; each document parse is independent.
    """
    trees = []
    for bj in batch.column("blocks").to_pylist():
        try:
            trees.append(serialize_tree(
                annotate_citations(parse_blocks(json.loads(bj)))))
        except Exception:
            trees.append(serialize_tree({"kind": "Body", "children": []}))
    out = batch.drop_columns(["blocks"])
    return out.append_column("tree", pa.array(trees, pa.large_string()))


def sections_batch(batch: pa.Table) -> pa.Table:
    """docs batch (with ``tree``) → sections rows (flat-map shaped)."""
    rows: list[dict] = []
    for url, title, tj in zip(
        batch.column("url").to_pylist(),
        batch.column("title").to_pylist(),
        batch.column("tree").to_pylist(),
    ):
        rows.extend(sections_rows(url, json.loads(tj), title))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "fragment": pa.array([r["fragment"] for r in rows], pa.string()),
            "about": pa.array([r["about"] for r in rows], pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "ordinal": pa.array([r["ordinal"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
        }
    )
