"""Stage S7 — WordReader intermediate formats, pure python (reference
``wordreader.py:23-218``).

The reference reads .docx by unzipping ``word/document.xml`` and .doc
by shelling out to antiword for DocBook. A .docx needs NO external
tool — it is a zip whose document member is WordprocessingML — so the
whole reference .docx read path is real here; only the legacy
.doc→DocBook *converter* stays external (pre-converted DocBook bytes
are parsed by :func:`parse_docbook`).

* :func:`docx_extract_ooxml` — unzip ``word/document.xml``
  (reference ``word_to_ooxml``, ``wordreader.py:113-125``).
* :func:`parse_ooxml` — WordprocessingML → paragraph stream with
  per-run bold/italic and the paragraph style. Adjacent runs with
  identical formatting are MERGED (reference ``_simplify_ooxml`` +
  ``_merge_ooxml``, ``wordreader.py:126-179`` — done there with an
  XSLT + BeautifulSoup pass, here as one ElementTree walk).
* :func:`parse_docbook` — pre-converted antiword DocBook XML → the
  same paragraph stream; multi-paragraph text nodes split on newlines
  exactly like the reference's re-fill loop (``word_to_docbook``,
  ``wordreader.py:71-111``, which re-flows each ``\\n``-separated
  piece into its own paragraph).
* :func:`word_block_rows` — the Ray surface: ``map_batches`` over
  (doc_id, fmt, data) rows → block rows (seq, kind, level, text)
  shaped exactly like the HTML extractor's, so the FSM structure
  tier consumes Word documents unchanged.

Stateless batch fns (no per-doc state survives a batch), zero-copy in:
the binary column is only touched per row inside the task.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

from ferenda_ray.util import normalize_space

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _w(tag: str) -> str:
    return f"{{{W_NS}}}{tag}"


_HEADING_STYLE = re.compile(r"^(?:Heading|Rubrik)(\d)$")


def docx_extract_ooxml(data: bytes) -> bytes:
    """.docx bytes → the raw ``word/document.xml`` member (reference
    ``word_to_ooxml``; same assert on the member's presence)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    name = "word/document.xml"
    if name not in zf.namelist():
        raise ValueError(f"no {name} in docx archive")
    return zf.read(name)


def _run_format(r) -> tuple[bool, bool]:
    rpr = r.find(_w("rPr"))
    if rpr is None:
        return (False, False)
    return (rpr.find(_w("b")) is not None, rpr.find(_w("i")) is not None)


def _run_text(r) -> str:
    parts = []
    for el in r:
        if el.tag == _w("t"):
            parts.append(el.text or "")
        elif el.tag == _w("tab"):
            parts.append("\t")
        elif el.tag == _w("br"):
            parts.append("\n")
    return "".join(parts)


def parse_ooxml(data: bytes) -> list[dict]:
    """``word/document.xml`` bytes → paragraphs
    ``{"style": str, "runs": [{"text", "bold", "italic"}]}``.

    Word splits visually continuous text into many ``w:r`` runs (spell-
    check artifacts etc.); adjacent runs whose formatting is identical
    are merged, mirroring the reference's ``_merge_ooxml`` w:rPr
    comparison. The x81→Å control-char workaround from
    ``_simplify_ooxml`` is preserved."""
    if b"\xc2\x81" in data:
        data = data.replace(b"\xc2\x81", b"\xc3\x85")
    root = ET.fromstring(data)
    paras: list[dict] = []
    for p in root.iter(_w("p")):
        style = ""
        ppr = p.find(_w("pPr"))
        if ppr is not None:
            ps = ppr.find(_w("pStyle"))
            if ps is not None:
                style = ps.get(_w("val"), "")
        runs: list[dict] = []
        for r in p.iter(_w("r")):
            bold, italic = _run_format(r)
            text = _run_text(r)
            if not text:
                continue
            if runs and runs[-1]["bold"] == bold and runs[-1]["italic"] == italic:
                runs[-1]["text"] += text          # merge same-format runs
            else:
                runs.append({"text": text, "bold": bold, "italic": italic})
        paras.append({"style": style, "runs": runs})
    return paras


def parse_docbook(data: bytes) -> list[dict]:
    """Pre-converted antiword DocBook XML → the same paragraph stream.
    ``title`` elements become Heading-styled paragraphs; each
    ``\\n``-separated piece of a ``para`` text node becomes its own
    paragraph (the reference's re-fill loop splits exactly there)."""
    root = ET.fromstring(data)
    paras: list[dict] = []
    for el in root.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag not in ("title", "para") or not (el.text or "").strip():
            continue
        style = "Heading1" if tag == "title" else ""
        for piece in (el.text or "").split("\n"):
            piece = piece.strip()
            if piece:
                paras.append({"style": style,
                              "runs": [{"text": piece, "bold": False,
                                        "italic": False}]})
    return paras


def paragraphs_to_blocks(paras: list[dict]) -> list[dict]:
    """Paragraph stream → the HTML extractor's block vocabulary
    (kind/level/text), so ``stages/structure.parse_blocks`` re-nests
    Word documents identically to HTML pages. ListParagraph maps to a
    depth-1 unordered listitem (OOXML numbering-id nesting is not
    modelled — documented gap)."""
    blocks: list[dict] = []
    for p in paras:
        text = normalize_space("".join(r["text"] for r in p["runs"]))
        if not text:
            continue
        m = _HEADING_STYLE.match(p["style"])
        if m:
            blocks.append({"kind": "heading", "level": int(m.group(1)),
                           "text": text})
        elif p["style"] == "ListParagraph":
            blocks.append({"kind": "listitem", "level": 0, "text": text,
                           "depth": 1, "ordered": False})
        else:
            blocks.append({"kind": "paragraph", "level": 0, "text": text})
    return blocks


def word_blocks(data: bytes, fmt: str) -> list[dict]:
    if fmt == "docx":
        paras = parse_ooxml(docx_extract_ooxml(data))
    elif fmt == "ooxml":
        paras = parse_ooxml(data)
    elif fmt == "docbook":
        paras = parse_docbook(data)
    else:
        raise ValueError(f"unknown word intermediate format: {fmt!r}")
    return paragraphs_to_blocks(paras)


def word_block_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, fmt, data) rows → flat block rows. Bold/italic survive
    as a compact span string ("" when plain) for the render tier."""
    doc_ids, seqs, kinds, levels, texts = [], [], [], [], []
    for doc_id, fmt, data in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("fmt").to_pylist(),
                                 batch.column("data").to_pylist()):
        for seq, blk in enumerate(word_blocks(data, fmt)):
            doc_ids.append(doc_id)
            seqs.append(seq)
            kinds.append(blk["kind"])
            levels.append(blk["level"])
            texts.append(blk["text"])
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "seq": pa.array(seqs, pa.int32()),
        "kind": pa.array(kinds, pa.string()),
        "level": pa.array(levels, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


# -- deterministic fixture builder -----------------------------------------

_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    b'content-types"><Default Extension="xml" ContentType="application/xml"/>'
    b"</Types>"
)


def _p(style: str, *runs: str) -> str:
    ppr = (f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else "")
    body = "".join(runs)
    return f"<w:p>{ppr}{body}</w:p>"


def _r(text: str, bold: bool = False) -> str:
    rpr = "<w:rPr><w:b/></w:rPr>" if bold else ""
    return f'<w:r>{rpr}<w:t xml:space="preserve">{text}</w:t></w:r>'


def synthetic_docx(doc_id: int) -> bytes:
    """Deterministic .docx: a Heading1 title, a numbered-section
    heading, split same-format runs (exercises the merge), a bold run
    and a list item — pure function of doc_id."""
    title = f"Spec {doc_id}"
    body = "".join([
        _p("Heading1", _r(title)),
        _p("Heading2", _r(f"{(doc_id % 3) + 1}. Scope")),
        # split runs with identical (absent) formatting — must merge
        _p("", _r("This document "), _r("covers item "),
           _r(f"{doc_id * 7 % 100}.")),
        _p("", _r("Key term: ", False), _r("binding", True),
           _r(" requirement.", False)),
        _p("ListParagraph", _r(f"point {doc_id % 5}")),
    ])
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{W_NS}"><w:body>{body}</w:body>'
           f"</w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("word/document.xml", doc.encode())
    return buf.getvalue()
