"""MediaWiki-style markup → element tree (reference M20,
``sources/general/wiki.py:35-356``, which wraps a third-party mw parser;
rebuilt as a small deterministic line parser covering the constructs the
reference's keyword/mediawiki repos rely on: ``== headings ==``,
``* unordered`` / ``# ordered`` list items, ``[[wiki links]]``,
``'''bold'''``/``''italic''`` (stripped to text), blank-line paragraphs).

A batch stage like the HTML structural pack: markup string column →
element-tree JSON + extracted link targets (the keyword-term source,
reference ``keyword.py:105-222``)."""

from __future__ import annotations

import json
import re

import pyarrow as pa

_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$")
_LINK = re.compile(r"\[\[([^|\]]+)(?:\|([^\]]*))?\]\]")
_QUOTES = re.compile(r"'{2,3}")


def _inline(text: str, links: list[str]) -> str:
    def sub(m):
        links.append(m.group(1).strip())
        return (m.group(2) if m.group(2) is not None else m.group(1)).strip()

    return _QUOTES.sub("", _LINK.sub(sub, text)).strip()


def wiki_parse(markup: str) -> tuple[dict, list[str]]:
    """markup → (element tree, wiki-link targets in order)."""
    links: list[str] = []
    children: list[dict] = []
    para: list[str] = []
    cur_list: dict | None = None

    def flush_para():
        nonlocal para
        if para:
            text = " ".join(" ".join(para).split())
            if text:
                children.append({"kind": "Paragraph", "text": text})
            para = []

    def flush_list():
        nonlocal cur_list
        if cur_list is not None:
            children.append(cur_list)
            cur_list = None

    for line in markup.splitlines():
        m = _HEADING.match(line)
        if m:
            flush_para(); flush_list()
            children.append({"kind": "Heading", "level": len(m.group(1)),
                             "text": _inline(m.group(2), links)})
        elif line.startswith(("*", "#")):
            flush_para()
            kind = "OrderedList" if line[0] == "#" else "UnorderedList"
            if cur_list is None or cur_list["kind"] != kind:
                flush_list()
                cur_list = {"kind": kind, "children": []}
            cur_list["children"].append(
                {"kind": "ListItem", "text": _inline(line.lstrip("*# "), links)})
        elif not line.strip():
            flush_para(); flush_list()
        else:
            flush_list()
            para.append(_inline(line, links))
    flush_para(); flush_list()
    return {"kind": "Body", "children": children}, links


def wiki_batch(batch: pa.Table, markup_col: str = "markup") -> pa.Table:
    """(id?, markup) batch → + tree JSON + semicolon-joined link targets."""
    trees, link_lists = [], []
    for mk in batch.column(markup_col).to_pylist():
        tree, links = wiki_parse(mk or "")
        trees.append(json.dumps(tree, ensure_ascii=False, sort_keys=True))
        link_lists.append(";".join(links))
    out = batch.drop_columns([markup_col])
    out = out.append_column("tree", pa.array(trees, pa.large_string()))
    return out.append_column("links", pa.array(link_lists, pa.string()))
