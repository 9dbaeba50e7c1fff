"""reStructuredText → element tree (reference M21,
``sources/general/static.py:22-180``: docutils ``publish_string`` →
soup → elements; here docutils' doctree is walked directly into the
engine's element schema — same node kinds as the HTML/wiki packs).

Stateless batch stage; the docutils parse is per-row pure."""

from __future__ import annotations

import json

import pyarrow as pa


def _walk(node) -> list[dict]:
    import docutils.nodes as n

    out: list[dict] = []
    for child in node.children:
        if isinstance(child, n.section):
            title = ""
            kids = []
            for c in child.children:
                if isinstance(c, n.title):
                    title = c.astext()
                else:
                    kids.extend(_walk_one(c))
            out.append({"kind": "Section", "ordinal": "",
                        "title": " ".join(title.split()), "children": kids})
        else:
            out.extend(_walk_one(child))
    return out


def _walk_one(child) -> list[dict]:
    import docutils.nodes as n

    if isinstance(child, n.section):
        return _walk_parent_with_section(child)
    if isinstance(child, n.title):
        return [{"kind": "Heading", "level": 1,
                 "text": " ".join(child.astext().split())}]
    if isinstance(child, n.paragraph):
        return [{"kind": "Paragraph", "text": " ".join(child.astext().split())}]
    if isinstance(child, n.literal_block):
        return [{"kind": "Preformatted", "text": child.astext()}]
    if isinstance(child, (n.bullet_list, n.enumerated_list)):
        kind = ("OrderedList" if isinstance(child, n.enumerated_list)
                else "UnorderedList")
        items = [{"kind": "ListItem", "text": " ".join(li.astext().split())}
                 for li in child.children]
        return [{"kind": kind, "children": items}]
    if hasattr(child, "children") and child.children:
        return _walk(child)
    return []


def _walk_parent_with_section(sec) -> list[dict]:
    import docutils.nodes as n

    title = ""
    kids: list[dict] = []
    for c in sec.children:
        if isinstance(c, n.title):
            title = c.astext()
        else:
            kids.extend(_walk_one(c))
    return [{"kind": "Section", "ordinal": "",
             "title": " ".join(title.split()), "children": kids}]


def rst_parse(text: str) -> dict:
    """reST source → element tree (docutils errors are silenced; a
    failed parse yields an empty Body — poison-pill safety)."""
    try:
        from docutils.core import publish_doctree

        doctree = publish_doctree(
            text, settings_overrides={"report_level": 5,
                                      "halt_level": 5,
                                      "file_insertion_enabled": False,
                                      "raw_enabled": False})
        return {"kind": "Body", "children": _walk(doctree)}
    except Exception:
        return {"kind": "Body", "children": []}


def rst_batch(batch: pa.Table, rst_col: str = "rst") -> pa.Table:
    trees = [json.dumps(rst_parse(t or ""), ensure_ascii=False, sort_keys=True)
             for t in batch.column(rst_col).to_pylist()]
    out = batch.drop_columns([rst_col])
    return out.append_column("tree", pa.array(trees, pa.large_string()))
