"""Stage S1 — deterministic HTML → text/block extraction.

Reference semantics: ``soup_from_basefile`` + ``parse_document_from_soup``
(``documentrepository.py:1188-1282``) + ``elements_from_soup``
(``ferenda/elements/html.py:23-72``): parse the downloaded HTML, drop
non-content elements (script/style/font/map/center), keep the main content
as a flat-ish element stream. Rebuilt here on the stdlib ``html.parser``
(no lxml in this environment) as a pure function suitable for
``map_batches(batch_format="pyarrow")``.

THE FROZEN EXTRACTION SPEC (the per-url byte-identical invariant from
BASELINE.json lives here — do not change without regenerating goldens):

1. Decode ``html`` bytes as UTF-8 (errors="replace").
2. Elements dropped with their entire content:
   ``script style noscript template font map center head`` (the reference's
   drop list + head; ``<title>`` inside head is captured as metadata only).
3. Block elements — each produces one text block:
   ``h1..h6 p li pre blockquote dt dd td th caption figcaption``.
   Opening a block while another is open flushes the outer one first
   (blocks never nest; an ``<li>`` containing a nested list yields the
   li-prefix text as its own block).
4. All other elements are transparent containers; character data outside
   any block element is accumulated and flushed as an implicit paragraph
   when the next block opens or its container ends.
5. ``<br>`` contributes a single space (newline inside ``pre``).
6. Block text is ``normalize_space``-ed (whitespace runs → single space,
   strip) — except ``pre`` blocks, which keep internal whitespace verbatim
   with one leading and trailing newline stripped.
7. Blocks whose normalized text is empty are dropped.
8. Page text = ``"\\n\\n".join(block texts)``.
9. Page lang = the ``lang`` attribute of ``<html>`` ("" when absent);
   title = content of ``<title>`` (normalized), falling back to the first
   ``h1`` block.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import pyarrow as pa

from ferenda_ray.util import normalize_space

DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "font", "map", "center", "head"}
)
BLOCK_TAGS = frozenset(
    {
        "h1", "h2", "h3", "h4", "h5", "h6",
        "p", "li", "pre", "blockquote",
        "dt", "dd", "td", "th", "caption", "figcaption",
    }
)
HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _Extractor(HTMLParser):
    """Single-pass streaming extractor. One instance is reused across rows
    (call :meth:`run`); state is reset per document."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.reset_doc()

    def reset_doc(self) -> None:
        self.blocks: list[dict] = []
        self.lang = ""
        self.title = ""
        self._drop_depth = 0
        self._cur_tag: str | None = None      # open block tag, if any
        self._cur_parts: list[str] = []        # text of the open block
        self._loose_parts: list[str] = []      # text outside any block
        self._in_title = False
        self._title_parts: list[str] = []
        self._list_stack: list[bool] = []      # open ul/ol; True = ordered
        self._table_stack: list[dict] = []     # open tables: {"row": idx}
        self._table_counter = 0                # per-doc monotone <table> id

    # -- flushing ---------------------------------------------------------
    def _flush_block(self) -> None:
        if self._cur_tag is None:
            return
        tag = self._cur_tag
        raw = "".join(self._cur_parts)
        self._cur_tag = None
        self._cur_parts = []
        if tag == "pre":
            text = raw
            if text.startswith("\n"):
                text = text[1:]
            if text.endswith("\n"):
                text = text[:-1]
            if not text.strip():
                return
            kind, level = "preformatted", 0
        else:
            text = normalize_space(raw)
            if not text:
                return
            if tag in HEADING_LEVEL:
                kind, level = "heading", HEADING_LEVEL[tag]
            elif tag == "li":
                kind, level = "listitem", 0
            elif tag in ("td", "th") and self._table_stack:
                kind, level = "cell", 0
            else:
                kind, level = "paragraph", 0
        blk = {"kind": kind, "level": level, "text": text}
        if kind == "cell":
            # table-context metadata for FSM row/table re-nesting
            # (reference elements.py table model); text spec unchanged
            blk["row"] = max(0, self._table_stack[-1]["row"])
            blk["header"] = tag == "th"
            blk["tdepth"] = len(self._table_stack)
            # monotone table id: lets the FSM break between ADJACENT
            # sibling tables even when row indices don't reset
            blk["tid"] = self._table_stack[-1]["tid"]
        if kind == "listitem":
            # list-context metadata for the FSM's nested-list re-nesting
            # (reference elements.py:632-660 Ordered/UnorderedList);
            # text segmentation (the frozen spec above) is unchanged
            blk["depth"] = max(1, len(self._list_stack))
            blk["ordered"] = bool(self._list_stack and self._list_stack[-1])
        self.blocks.append(blk)

    def _flush_loose(self) -> None:
        if not self._loose_parts:
            return
        text = normalize_space("".join(self._loose_parts))
        self._loose_parts = []
        if text:
            self.blocks.append({"kind": "paragraph", "level": 0, "text": text})

    # -- parser hooks -----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            if tag == "br":
                sep = "\n" if self._cur_tag == "pre" else " "
                if self._cur_tag is not None:
                    self._cur_parts.append(sep)
                else:
                    self._loose_parts.append(sep)
            return
        if tag == "html":
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v
            return
        if tag == "title":
            # captured as metadata even though <head> content is dropped
            self._in_title = True
            return
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in ("ul", "ol"):
            # a nested list opening inside an open <li> must flush the
            # li text FIRST (at its own depth) before the push; the
            # flush boundary is the same one the next <li> start would
            # force, so extracted text is unchanged
            self._flush_block()
            self._list_stack.append(tag == "ol")
            return
        if tag == "table":
            self._flush_block()
            self._table_counter += 1
            self._table_stack.append({"row": -1, "tid": self._table_counter})
            return
        if tag == "tr":
            self._flush_block()
            if self._table_stack:
                self._table_stack[-1]["row"] += 1
            return
        if tag in BLOCK_TAGS:
            self._flush_block()
            self._flush_loose()
            self._cur_tag = tag
        # other tags: transparent

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
            return
        if tag in DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS and tag == self._cur_tag:
            self._flush_block()
        elif tag in ("body", "html", "div", "section", "article", "ul", "ol",
                     "dl", "table", "main", "aside", "header", "footer",
                     "nav", "figure"):
            self._flush_block()
            self._flush_loose()
            if tag in ("ul", "ol") and self._list_stack:
                self._list_stack.pop()
            elif tag == "table" and self._table_stack:
                self._table_stack.pop()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)
            return
        if self._drop_depth:
            return
        if self._cur_tag is not None:
            self._cur_parts.append(data)
        else:
            self._loose_parts.append(data)

    # -- entry point ------------------------------------------------------
    def run(self, html_bytes: bytes) -> tuple[str, str, list[dict]]:
        """Extract one document → (lang, title, blocks)."""
        self.reset()           # HTMLParser internal state
        self.reset_doc()
        self.feed(html_bytes.decode("utf-8", errors="replace"))
        self.close()
        self._flush_block()
        self._flush_loose()
        title = normalize_space("".join(self._title_parts))
        if not title:
            for b in self.blocks:
                if b["kind"] == "heading" and b["level"] == 1:
                    title = b["text"]
                    break
        return self.lang, title, self.blocks


def raw_prefilter(batch: pa.Table, needles: list[str]) -> pa.Table:
    """Filter-before-parse (Sparser, VLDB'18 — see PAPERS.md): drop
    pages whose RAW html bytes can't possibly satisfy a content
    predicate, BEFORE the expensive parse. A vectorized Arrow substring
    scan over the binary column costs ~1% of a parse; rows are kept if
    ANY needle occurs. False positives are fine (the real predicate
    re-checks after parse); false negatives are impossible for plain
    substring predicates."""
    import pyarrow.compute as pc

    if not needles:
        return batch
    col = batch.column("html")
    mask = pc.match_substring(col, needles[0])
    for n in needles[1:]:
        mask = pc.or_(mask, pc.match_substring(col, n))
    return batch.filter(mask)


def page_text(blocks: list[dict]) -> str:
    """Rule 8 of the spec: the canonical page text."""
    return "\n\n".join(b["text"] for b in blocks)


def extract_page(html_bytes: bytes) -> tuple[str, str, str, list[dict]]:
    """Convenience single-doc API → (lang, title, text, blocks)."""
    ex = _Extractor()
    lang, title, blocks = ex.run(html_bytes)
    return lang, title, page_text(blocks), blocks


import re as _re

_TAG_END = _re.compile(r'(?:[^>"\']|"[^"]*"|\'[^\']*\')*>')
_TAG_NAME = _re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*")
_ATTR = _re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
_RAWTEXT = {"script", "style"}  # html.parser CDATA_CONTENT_ELEMENTS


class _FastExtractor(_Extractor):
    """Regex-tokenizer drive of the SAME handler methods (block
    semantics, drop lists, title/lang capture are all inherited) —
    ~4x faster than the stdlib ``html.parser`` event loop, which
    dominated the extract stage profile. ``_Extractor`` remains the
    reference implementation; equivalence is pinned by
    tests/test_extract_fast.py (corpus + hypothesis fuzz)."""

    def run(self, html_bytes: bytes) -> tuple[str, str, list[dict]]:
        self.reset_doc()
        s = html_bytes.decode("utf-8", errors="replace")
        n = len(s)
        pos = 0
        unescape = __import__("html").unescape
        while pos < n:
            lt = s.find("<", pos)
            if lt < 0:
                lt = n
            if lt > pos:
                data = s[pos:lt]
                if "&" in data:
                    data = unescape(data)
                self.handle_data(data)
            if lt >= n:
                break
            pos = lt
            nxt = s[pos + 1] if pos + 1 < n else ""
            if nxt == "!":
                if s.startswith("<!--", pos):
                    end = s.find("-->", pos + 4)
                    pos = n if end < 0 else end + 3
                else:
                    end = s.find(">", pos + 2)
                    pos = n if end < 0 else end + 1
                continue
            if nxt == "?":
                end = s.find(">", pos + 2)
                pos = n if end < 0 else end + 1
                continue
            if nxt == "/":
                m = _TAG_NAME.match(s, pos + 2)
                if m:
                    end = s.find(">", m.end())
                    pos = n if end < 0 else end + 1
                    self.handle_endtag(m.group(0).lower())
                else:
                    end = s.find(">", pos + 2)
                    pos = n if end < 0 else end + 1
                continue
            m = _TAG_NAME.match(s, pos + 1)
            if not m:
                self.handle_data("<")
                pos += 1
                continue
            tag = m.group(0).lower()
            tm = _TAG_END.match(s, m.end())
            if tm is None:
                break  # unterminated tag at EOF: html.parser drops it
            body_end = tm.end() - 1
            pos = tm.end()
            attrs = []
            if tag == "html":
                for am in _ATTR.finditer(s, m.end(), body_end):
                    v = am.group(2)
                    if v and v[0] in "\"'":
                        v = v[1:-1]
                    if v and ("&" in v):
                        v = unescape(v)
                    attrs.append((am.group(1).lower(), v))
            self.handle_starttag(tag, attrs)
            if s[body_end - 1] == "/" and tag not in VOID_TAGS:
                self.handle_endtag(tag)  # <x/> startendtag semantics
            elif tag in _RAWTEXT:
                rm = _re.search(rf"</{tag}(?=[\s>/])|</{tag}$", s[pos:],
                                _re.I)
                pos = n if rm is None else pos + rm.start()
                # content skipped: script/style are DROP_TAGS — their
                # data would be discarded by handle_data anyway
        self._flush_block()
        self._flush_loose()
        title = normalize_space("".join(self._title_parts))
        if not title:
            for b in self.blocks:
                if b["kind"] == "heading" and b["level"] == 1:
                    title = b["text"]
                    break
        return self.lang, title, self.blocks


_EXTRACTOR: _FastExtractor | None = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` function: pages batch → docs batch.

    Stateless (runs as elastic task pool); the parser instance is a
    per-process singleton so it is constructed once per worker, not once
    per batch. Input columns ``(url, warc_ts, html, lang)``; the wide
    ``html`` column is consumed here and NOT emitted — downstream blocks
    stay narrow (SURVEY §7.6.6).

    Output columns: ``url, warc_ts, lang, title, text, blocks`` where
    ``blocks`` is the JSON block stream feeding the FSM structural parser.
    """
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = _FastExtractor()
    return _extract_batch(_EXTRACTOR, batch)


def _extract_batch(ex: _Extractor, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs_in = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        langs, titles, texts, blocks_json = [], [], [], []
        for html, lang_in in zip(htmls, langs_in):
            try:
                lang, title, blocks = ex.run(html)
            except Exception:
                # poison-pill rows must not fail the batch (SURVEY §4 retries)
                lang, title, blocks = "", "", []
            langs.append(lang or (lang_in or ""))
            titles.append(title)
            texts.append(page_text(blocks))
            blocks_json.append(json.dumps(blocks, ensure_ascii=False))
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "lang": pa.array(langs, pa.string()),
                "title": pa.array(titles, pa.string()),
                "text": pa.array(texts, pa.large_string()),
                "blocks": pa.array(blocks_json, pa.large_string()),
            }
        )
