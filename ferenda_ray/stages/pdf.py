"""Stage S6 — the PDF intermediate-format data model + parsers, pure
python (reference ``pdfreader.py:32-1180``).

The external converters (``pdftohtml -xml`` from poppler, tesseract's
hOCR) do NOT ship in this environment, so the binary→intermediate step
stays stubbed (``stages/multimodal.py``); everything AFTER that point —
the Page/Textbox/Textelement/fontspec data model and the parsers for
the two intermediate formats — is real and golden-tested here:

* :func:`parse_pdf2xml` — poppler ``pdftohtml -xml`` output
  (``<pdf2xml><page><fontspec/><text …>``; reference
  ``pdfreader.py:505-905``): per-document fontspec registry, inline
  b/i/a tag composition, whitespace normalization, empty-box dropping.
* :func:`parse_hocr` — tesseract hOCR (``ocr_page``/``ocr_line``/
  ``ocrx_word`` spans with bbox titles; reference
  ``pdfreader.py:398-504``): pixel→point scaling from the page bbox,
  superscript-footnote detection, synthesized fontspecs from average
  line height.
* :func:`parse_fontinfo` — ``pdffonts`` table output (reference
  ``pdfreader.py:505-540`` fonttype space-collapsing).
* :func:`glue_textboxes` / :func:`default_glue` — paragraph
  reassembly (reference ``textboxes(gluefunc)`` + ``_default_glue``,
  ``pdfreader.py:944-1054``): same base font family + size, left
  aligned, vertically adjacent within 1.5 linespacing.
* :func:`median_box_width` — layout analysis helper
  (``pdfreader.py:1009-1020``).

Elements are plain dicts (the repo's element-tree style): Page
``{number, width, height, fontspecs, boxes}``; Textbox ``{top, left,
width, height, fontid, parts}``; Textelement ``{text, tag}`` with tag
∈ {"", "b", "i", "bi", "ib", "a", "sup"} (+ ``link`` for "a").

Ray surface: :func:`pdf_textbox_rows` flattens parsed documents to
narrow columnar rows inside ``map_batches`` — the downstream FSM /
triple stages consume those rows exactly like HTML blocks.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa

_WS = re.compile(r"[\s\xa0\xc2]+")

_FONTTYPE_MAP = {"Type 1": "Type1", "Type 1C": "Type1C",
                 "Type 1C (OT)": "Type1C(OT)", "Type 3": "Type3",
                 "TrueType (OT)": "TrueType(OT)", "CID Type 0": "CIDType0",
                 "CID Type 0C": "CIDType0C",
                 "CID Type 0C (OT)": "CIDType0C(OT)",
                 "CID TrueType": "CIDTrueType",
                 "CID TrueType (OT)": "CIDTrueType(OT)"}


def _txt(s: str | None) -> str:
    return _WS.sub(" ", s) if s else ""


def parse_fontinfo(text: str) -> dict[str, dict]:
    """``pdffonts`` tabular output → {font name: row dict}. Multi-word
    type names are collapsed first so the row splits on whitespace."""
    fontinfo: dict[str, dict] = {}
    fields: list[str] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        if not fields:
            fields = line.split()
        elif not line.startswith("-----"):
            for k, v in _FONTTYPE_MAP.items():
                if k in line:
                    line = line.replace(k, v)
            cols = line.split()
            if cols and cols[0] not in fontinfo:
                fontinfo[cols[0]] = dict(zip(fields, cols))
    return fontinfo


# -- pdftohtml -xml ---------------------------------------------------------

def _text_parts(element) -> list[dict]:
    """<text> element → Textelement parts with composed inline tags
    (nested <b><i> → "bi"; <a> → tag "a" + link)."""
    parts: list[dict] = []

    def emit(text: str | None, tag: str, link: str | None) -> None:
        t = _txt(text)
        if not t.strip():
            return
        p = {"text": t, "tag": tag}
        if link is not None:
            p["link"] = link
        parts.append(p)

    def walk(el, tag: str, link: str | None) -> None:
        emit(el.text, tag, link)
        for ch in el:
            sub = tag
            sublink = link
            if ch.tag in ("b", "i"):
                sub = tag + ch.tag
            elif ch.tag == "a":
                sub = tag + "a" if tag else "a"
                sublink = ch.get("href", "")
            walk(ch, sub, sublink)
            emit(ch.tail, tag, link)

    walk(element, "", None)
    return parts


def parse_pdf2xml(data: bytes, fontinfo: dict | None = None) -> list[dict]:
    """poppler ``pdftohtml -xml`` bytes → list of Page dicts. The
    fontspec registry is document-global (specs accumulate across
    pages, reference ``self.fontspec``); empty boxes (whitespace-only
    after normalization, no children) are dropped."""
    root = ET.fromstring(data.decode("utf-8", errors="replace"))
    if root.tag != "pdf2xml":
        raise ValueError(f"expected <pdf2xml> root, got <{root.tag}>")
    fontspecs: dict[str, dict] = {}
    pages: list[dict] = []
    for pageelement in root:
        if pageelement.tag != "page":
            continue  # <outline> and comments are skipped
        page = {"number": int(pageelement.get("number")),
                "width": int(pageelement.get("width")),
                "height": int(pageelement.get("height")),
                "fontspecs": fontspecs, "boxes": []}
        for element in pageelement:
            if element.tag == "fontspec":
                fid = element.get("id")
                spec = {"id": fid, "size": int(element.get("size")),
                        "family": element.get("family"),
                        "color": element.get("color")}
                if fontinfo and element.get("family") in fontinfo:
                    spec["encoding"] = fontinfo[element.get("family")].get(
                        "encoding")
                fontspecs[fid] = spec
                continue
            if element.tag != "text":
                continue  # <image>, comments
            if ((element.text is None or not _txt(element.text).strip())
                    and not len(element)):
                continue  # empty box
            parts = _text_parts(element)
            if not parts:
                continue
            page["boxes"].append({
                "top": int(element.get("top")),
                "left": int(element.get("left")),
                "width": int(element.get("width")),
                "height": int(element.get("height")),
                "fontid": element.get("font"),
                "parts": parts,
            })
        pages.append(page)
    return pages


# -- tesseract hOCR ---------------------------------------------------------

_BBOX = re.compile(r"bbox (?P<left>\d+) (?P<top>\d+) (?P<right>\d+) "
                   r"(?P<bottom>\d+)")
_XHTML = "{http://www.w3.org/1999/xhtml}"


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def parse_hocr(data: bytes) -> list[dict]:
    """tesseract hOCR bytes → list of Page dicts. Pixel bboxes scale to
    points via the page bbox against an A4 page height (reference
    ``pdfreader.py:401-414``); a leading digit word at ≤ half the
    average line height becomes a superscript footnote marker; one
    synthesized fontspec per distinct average line height."""
    root = ET.fromstring(data.decode("utf-8", errors="replace"))
    ns = _XHTML if root.tag.startswith("{") else ""
    fontspecs: dict[str, dict] = {}
    pages: list[dict] = []
    for pageelement in root.iter(f"{ns}div"):
        if pageelement.get("class") != "ocr_page":
            continue
        m = _BBOX.search(pageelement.get("title", ""))
        pageheight_in_points = 11.69 * 72  # A4
        px_per_point = ((int(m.group("bottom")) - int(m.group("top")))
                        / pageheight_in_points)

        def dim(title: str) -> dict:
            mm = _BBOX.search(title)
            return {k: round(int(v) / px_per_point)
                    for k, v in mm.groupdict().items()}

        d = dim(pageelement.get("title"))
        page = {"number": int(pageelement.get("id")[5:]),
                "width": d["right"] - d["left"],
                "height": d["bottom"] - d["top"],
                "fontspecs": fontspecs, "boxes": []}
        for line in pageelement.iter(f"{ns}span"):
            if line.get("class") != "ocr_line":
                continue
            boxdim = dim(line.get("title"))
            parts = []
            for word in line.iter(f"{ns}span"):
                if word.get("class") != "ocrx_word":
                    continue
                wd = dim(word.get("title"))
                t = "".join(word.itertext()) + (word.tail or "")
                if not t.strip():
                    continue
                tag = ""
                kids = list(word)
                if kids:
                    tag = {"em": "i", "strong": "b"}.get(
                        _strip_ns(kids[0].tag), "")
                parts.append({"text": t.replace("\n", " "), "tag": tag,
                              "top": wd["top"], "left": wd["left"],
                              "width": wd["right"] - wd["left"],
                              "height": wd["bottom"] - wd["top"]})
            if not parts:
                continue
            avgheight = sum(p["height"] for p in parts) // len(parts)
            if (parts[0]["text"].strip().isdigit()
                    and parts[0]["height"] <= avgheight / 2):
                parts[0]["tag"] = "sup"
            # synthesized fontspec keyed by (family, size)
            fid = None
            for sid, spec in fontspecs.items():
                if spec["size"] == avgheight and spec["family"] == "unknown":
                    fid = sid
                    break
            if fid is None:
                fid = str(len(fontspecs))
                fontspecs[fid] = {"id": fid, "family": "unknown",
                                  "size": avgheight}
            page["boxes"].append({
                "top": boxdim["top"], "left": boxdim["left"],
                "width": boxdim["right"] - boxdim["left"],
                "height": boxdim["bottom"] - boxdim["top"],
                "fontid": fid,
                "parts": [{"text": p["text"], "tag": p["tag"]}
                          for p in parts],
            })
        pages.append(page)
    return pages


# -- layout analysis --------------------------------------------------------

def box_text(box: dict) -> str:
    return "".join(p["text"] for p in box["parts"])


def _basefamily(family: str) -> str:
    return family.replace("-", "").replace("Bold", "").replace("Italic", "")


def default_glue(box: dict, nextbox: dict, prevbox: dict,
                 fontspecs: dict) -> bool:
    """Reference ``_default_glue`` (pdfreader.py:1022-1053): glue when
    the base font family and size match, the boxes are left-aligned,
    and the next box starts within 1.5 linespacing of the previous."""
    f, nf = fontspecs.get(box["fontid"]), fontspecs.get(nextbox["fontid"])
    if not f or not nf:
        return False
    linespacing = 1.5
    bottom = box["top"] + box["height"]
    return (_basefamily(f["family"]) == _basefamily(nf["family"])
            and f["size"] == nf["size"]
            and box["left"] == nextbox["left"]
            and box["top"] < nextbox["top"]
            and bottom + (prevbox["height"] * linespacing)
            - prevbox["height"] >= nextbox["top"])


def glue_textboxes(page: dict, gluefunc=None) -> list[dict]:
    """Merge consecutive boxes of a page per the glue function
    (reference ``textboxes()``, pdfreader.py:944-1007). Merged boxes
    take the union bounding box and concatenated parts."""
    glue = gluefunc or default_glue
    out: list[dict] = []
    prev = None
    for box in page["boxes"]:
        if out and glue(out[-1], box, prev if prev is not None else out[-1],
                        page["fontspecs"]):
            cur = out[-1]
            right = max(cur["left"] + cur["width"],
                        box["left"] + box["width"])
            bottom = max(cur["top"] + cur["height"],
                         box["top"] + box["height"])
            top = min(cur["top"], box["top"])
            left = min(cur["left"], box["left"])
            merged_parts = cur["parts"] + box["parts"]
            out[-1] = {"top": top, "left": left, "width": right - left,
                       "height": bottom - top, "fontid": cur["fontid"],
                       "parts": merged_parts}
        else:
            out.append(dict(box))
        prev = box
    return out


def median_box_width(pages: list[dict], threshold: int = 0) -> int:
    """Median textbox width across pages (pdfreader.py:1009-1020)."""
    widths = sorted(
        b["width"] for p in pages for b in p["boxes"]
        if b["width"] >= threshold)
    if not widths:
        return 0
    return widths[len(widths) // 2]


# -- Ray stage ---------------------------------------------------------------

def pdf_textbox_rows(batch: pa.Table, glue: bool = True) -> pa.Table:
    """(doc_id, fmt['pdf2xml'|'hocr'], data binary) → one narrow row per
    (glued) textbox: the columnar bridge from PDF intermediates into the
    same downstream block/FSM stages the HTML path uses."""
    rows: list[dict] = []
    for doc_id, fmt, data in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("fmt").to_pylist(),
                                 batch.column("data").to_pylist()):
        try:
            pages = (parse_pdf2xml(data) if fmt == "pdf2xml"
                     else parse_hocr(data))
        except Exception:
            continue  # poison-pill rows must not fail the batch
        for page in pages:
            boxes = glue_textboxes(page) if glue else page["boxes"]
            for box in boxes:
                spec = page["fontspecs"].get(box["fontid"], {})
                rows.append({
                    "doc_id": doc_id, "page": page["number"],
                    "top": box["top"], "left": box["left"],
                    "width": box["width"], "height": box["height"],
                    "page_width": page["width"],
                    "page_height": page["height"],
                    "fontid": str(box["fontid"]),
                    "family": spec.get("family", ""),
                    "size": int(spec.get("size", 0)),
                    "text": box_text(box),
                    "tags": ",".join(sorted({p["tag"] for p in box["parts"]
                                             if p["tag"]})),
                })
    cols = {
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "page": pa.array([r["page"] for r in rows], pa.int32()),
        "top": pa.array([r["top"] for r in rows], pa.int32()),
        "left": pa.array([r["left"] for r in rows], pa.int32()),
        "width": pa.array([r["width"] for r in rows], pa.int32()),
        "height": pa.array([r["height"] for r in rows], pa.int32()),
        "page_width": pa.array([r["page_width"] for r in rows], pa.int32()),
        "page_height": pa.array([r["page_height"] for r in rows],
                                pa.int32()),
        "fontid": pa.array([r["fontid"] for r in rows], pa.string()),
        "family": pa.array([r["family"] for r in rows], pa.string()),
        "size": pa.array([r["size"] for r in rows], pa.int32()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "tags": pa.array([r["tags"] for r in rows], pa.string()),
    }
    return pa.table(cols)


# -- layout analysis (margins / header / footer / default style) ------------

HEADER_THRESHOLD = 0.002   # pdfanalyze.header_significance_threshold
FOOTER_THRESHOLD = 0.002   # pdfanalyze.footer_significance_threshold
_RIGHT_BINSIZE = 10        # pdfanalyze.findmargin binsize
_RIGHT_CAND = 0.8          # candidates within 20% of the top bin count


def _doc_layout(d: "pd.DataFrame") -> dict:
    """Spatial metrics of ONE document's textbox rows — the
    ``pdfanalyze.PDFAnalyzer.metrics`` semantics (reference
    ``pdfanalyze.py:237-447``), restated as a deterministic spec:

    * pagewidth/pageheight: max page dims (``analyze_*_margins``).
    * leftmargin: modal ``left`` among boxes left of midpage (midpage
      = modal page width / 2, ``pdfanalyze.py:430-434``); ties break
      to the SMALLER position (the reference's Counter ties are
      insertion-ordered — here pinned for oracle determinism).
    * rightmargin: the reference's quantized right-edge vote
      (``findmargin`` with quantize=True, ``pdfanalyze.py:457-494``):
      right edges right of midpage binned to ceil(right/10)*10; answer
      = MAX bin whose count is ≥ 0.8× the top bin's.
    * topmargin/bottommargin: cumulative char-mass scan
      (``analyze_vertical_margins``, ``pdfanalyze.py:400-425``): first
      position (from the page edge) where cumulative stripped-text
      length exceeds threshold × total, minus/plus one.
    * default style: the (family, size) carrying the most chars
      (``analyze_styles``, ``pdfanalyze.py:516-524``); ties pinned to
      (size DESC, family ASC).

    twopage=False variant (the even/odd margin split is a trivial
    restriction of the same counters)."""
    import numpy as np

    pages = d.drop_duplicates("page")
    pagewidth = int(pages["page_width"].max())
    pageheight = int(pages["page_height"].max())
    wc = pages.groupby("page_width").size()
    midpage = int(wc[wc == wc.max()].index.min()) / 2
    lm = d.loc[d["left"] < midpage, "left"]
    if len(lm):
        c = lm.value_counts()
        leftmargin = int(c[c == c.max()].index.min())
    else:
        leftmargin = 0
    rm = d.loc[d["right"] > midpage, "right"]
    if len(rm):
        bins = np.ceil(rm.to_numpy() / _RIGHT_BINSIZE).astype(np.int64) \
            * _RIGHT_BINSIZE
        bc = pd.Series(bins).value_counts()
        rightmargin = int(bc[bc >= _RIGHT_CAND * bc.max()].index.max())
    else:
        rightmargin = pagewidth
    total = int(d["text_len"].sum())
    cum = d.groupby("top")["text_len"].sum().sort_index().cumsum()
    over = cum[cum > HEADER_THRESHOLD * total]
    topmargin = int(over.index[0]) - 1 if len(over) else 0
    cumb = (d.groupby("bottom")["text_len"].sum()
            .sort_index(ascending=False).cumsum())
    overb = cumb[cumb > FOOTER_THRESHOLD * total]
    bottommargin = int(overb.index[0]) + 1 if len(overb) else pageheight
    st = d.groupby(["family", "size"])["text_len"].sum()
    fam, size = sorted((k for k, v in st.items() if v == st.max()),
                       key=lambda k: (-k[1], k[0]))[0]
    return {"doc_id": int(d["doc_id"].iloc[0]), "pagewidth": pagewidth,
            "pageheight": pageheight, "leftmargin": leftmargin,
            "rightmargin": rightmargin, "topmargin": topmargin,
            "bottommargin": bottommargin, "default_family": fam,
            "default_size": int(size)}


def pdf_layout(tb_ds, num_buckets: int = 16):
    """Textbox-row Dataset → one (doc_id, pagewidth, pageheight,
    leftmargin, rightmargin, topmargin, bottommargin, default_family,
    default_size) row per document — distributed PDF layout analysis
    (margin / header / footer / default-style detection; semantics in
    :func:`_doc_layout`).

    Shape: one hash(doc_id)-bucket exchange of the narrow geometry
    columns (text reduced to its length BEFORE the shuffle), per-doc
    metrics inside each bucket task; a doc's boxes fit one heap by
    construction (a PDF has bounded pages)."""
    from ferenda_ray.util import bucket_ints

    def geom(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        left = b.column("left").to_numpy(zero_copy_only=False)
        top = b.column("top").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "page": b.column("page"),
            "page_width": b.column("page_width"),
            "page_height": b.column("page_height"),
            "top": b.column("top"),
            "left": b.column("left"),
            "right": pa.array(left + b.column("width")
                              .to_numpy(zero_copy_only=False)),
            "bottom": pa.array(top + b.column("height")
                               .to_numpy(zero_copy_only=False)),
            "family": b.column("family"),
            "size": b.column("size"),
            "text_len": pc.cast(pc.utf8_length(
                pc.utf8_trim_whitespace(b.column("text"))), pa.int64()),
            "bucket": pa.array(bucket_ints(d, num_buckets), pa.int32()),
        })

    def layout(g: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame([_doc_layout(d) for _, d in
                            g.groupby("doc_id", sort=True)])
        if not len(out):
            out = pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "pagewidth": pd.Series([], dtype="int64"),
                "pageheight": pd.Series([], dtype="int64"),
                "leftmargin": pd.Series([], dtype="int64"),
                "rightmargin": pd.Series([], dtype="int64"),
                "topmargin": pd.Series([], dtype="int64"),
                "bottommargin": pd.Series([], dtype="int64"),
                "default_family": pd.Series([], dtype="str"),
                "default_size": pd.Series([], dtype="int64"),
            })
        return out

    return (tb_ds.map_batches(geom, batch_format="pyarrow")
            .groupby("bucket").map_groups(layout, batch_format="pandas"))


def pdf_layout_sql(parquet_path: str) -> str:
    """DuckDB recompute of :func:`pdf_layout` over the textbox-row
    parquet — same deterministic spec, including the tie-breaks and
    the quantized right-margin vote."""
    return f"""
WITH tb AS (
    SELECT doc_id, page, page_width, page_height, top, "left",
           "left" + width AS r, top + height AS bottom, family, size,
           len(trim(text)) AS w
    FROM read_parquet('{parquet_path}/*.parquet')
), pages AS (
    SELECT DISTINCT doc_id, page, page_width, page_height FROM tb
), pw AS (
    SELECT doc_id, CAST(max(page_width) AS BIGINT) AS pagewidth,
           CAST(max(page_height) AS BIGINT) AS pageheight
    FROM pages GROUP BY doc_id
), mw AS (
    SELECT doc_id, page_width / 2.0 AS midpage FROM (
        SELECT doc_id, page_width,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY count(*) DESC, page_width ASC) AS rn
        FROM pages GROUP BY doc_id, page_width) WHERE rn = 1
), lm AS (
    SELECT doc_id, CAST("left" AS BIGINT) AS leftmargin FROM (
        SELECT tb.doc_id, tb."left",
               row_number() OVER (PARTITION BY tb.doc_id
                   ORDER BY count(*) DESC, tb."left" ASC) AS rn
        FROM tb JOIN mw USING (doc_id) WHERE tb."left" < midpage
        GROUP BY tb.doc_id, tb."left") WHERE rn = 1
), rbins AS (
    SELECT tb.doc_id, CAST(ceil(r / {_RIGHT_BINSIZE}.0) AS BIGINT)
               * {_RIGHT_BINSIZE} AS bin, count(*) AS c
    FROM tb JOIN mw USING (doc_id) WHERE r > midpage
    GROUP BY 1, 2
), rm AS (
    SELECT doc_id, max(bin) AS rightmargin FROM (
        SELECT doc_id, bin, c, max(c) OVER (PARTITION BY doc_id) AS mx
        FROM rbins) WHERE c >= {_RIGHT_CAND} * mx GROUP BY doc_id
), tot AS (
    SELECT doc_id, sum(w) AS total FROM tb GROUP BY doc_id
), hm AS (
    SELECT t.doc_id, CAST(min(t.top) - 1 AS BIGINT) AS topmargin
    FROM (SELECT doc_id, top,
                 sum(sw) OVER (PARTITION BY doc_id ORDER BY top) AS cum
          FROM (SELECT doc_id, top, sum(w) AS sw FROM tb
                GROUP BY doc_id, top)) t
    JOIN tot USING (doc_id)
    WHERE t.cum > {HEADER_THRESHOLD} * tot.total GROUP BY t.doc_id
), bm AS (
    SELECT t.doc_id, CAST(max(t.bottom) + 1 AS BIGINT) AS bottommargin
    FROM (SELECT doc_id, bottom,
                 sum(sw) OVER (PARTITION BY doc_id
                               ORDER BY bottom DESC) AS cum
          FROM (SELECT doc_id, bottom, sum(w) AS sw FROM tb
                GROUP BY doc_id, bottom)) t
    JOIN tot USING (doc_id)
    WHERE t.cum > {FOOTER_THRESHOLD} * tot.total GROUP BY t.doc_id
), styles AS (
    SELECT doc_id, family AS default_family,
           CAST(size AS BIGINT) AS default_size FROM (
        SELECT doc_id, family, size,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY sum(w) DESC, size DESC, family ASC) AS rn
        FROM tb GROUP BY doc_id, family, size) WHERE rn = 1
)
SELECT pw.doc_id, pagewidth, pageheight,
       coalesce(leftmargin, 0) AS leftmargin,
       coalesce(rightmargin, pagewidth) AS rightmargin,
       coalesce(topmargin, 0) AS topmargin,
       coalesce(bottommargin, pageheight) AS bottommargin,
       default_family, default_size
FROM pw
LEFT JOIN lm USING (doc_id) LEFT JOIN rm USING (doc_id)
LEFT JOIN hm USING (doc_id) LEFT JOIN bm USING (doc_id)
JOIN styles USING (doc_id)
"""


# -- deterministic synthetic intermediates (fixtures + queries) -------------

def synthetic_pdf2xml(doc_id: int) -> bytes:
    """Deterministic pdf2xml intermediate for tests/queries (the format
    the stubbed pdftohtml WOULD produce). Carries the spatial features
    the layout analyzer (:func:`pdf_layout`) detects: a running header
    (top 30), a footer page number (top 1220), a per-doc left margin
    (85 + 5·(doc_id % 4)), an indented quote line, and ragged right
    edges around a common right margin."""
    n_pages = 1 + doc_id % 2
    lm = 85 + 5 * (doc_id % 4)
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<pdf2xml producer="poppler" version="0.24.3">']
    for p in range(1, n_pages + 1):
        out.append(f'<page number="{p}" position="absolute" top="0" '
                   'left="0" height="1263" width="892">')
        if p == 1:
            out.append('\t<fontspec id="0" size="21" '
                       'family="SYNTH+Serif-Bold" color="#000000"/>')
            out.append('\t<fontspec id="1" size="12" family="SYNTH+Serif" '
                       'color="#000000"/>')
            out.append('\t<fontspec id="2" size="9" family="SYNTH+Serif" '
                       'color="#000000"/>')
        out.append(f'<text top="30" left="{lm}" width="220" height="11" '
                   f'font="2">Synthetic corpus · doc {doc_id}</text>')
        out.append(f'<text top="100" left="{lm}" width="300" height="28" '
                   f'font="0"><b>Synthetic doc {doc_id} page {p}</b></text>')
        base = 160
        for i in range(6):
            w = 600 - 3 * ((doc_id + i) % 4)  # ragged right edge
            out.append(
                f'<text top="{base + 16 * i}" left="{lm}" width="{w}" '
                f'height="14" font="1">Body line {i} of page {p} in doc '
                f'{doc_id}, see RFC {700 + doc_id}.</text>')
        out.append(f'<text top="280" left="{lm + 40}" width="480" '
                   f'height="14" font="1">Indented quotation line of doc '
                   f'{doc_id}, page {p}.</text>')
        out.append(f'<text top="320" left="{lm}" width="60" height="14" '
                   'font="1"><i>fin</i></text>')
        out.append(f'<text top="1220" left="440" width="16" height="11" '
                   f'font="2">{p}</text>')
        out.append("</page>")
    out.append("</pdf2xml>")
    return "\n".join(out).encode()
