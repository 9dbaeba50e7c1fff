"""PDF intermediate-format data model goldens (reference
``test/files/pdfreader/intermediate`` semantics, own fixtures):
pdf2xml + hOCR parsing, fontinfo table parsing, paragraph gluing,
median width, and the columnar Ray stage."""

import json
import os
import pathlib

from ferenda_ray.stages import pdf

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens" / "pdf"


def _golden(name: str, got: dict | list):
    expected = GOLDEN_DIR / f"{name}.expected.json"
    if os.environ.get("GOLDEN_REGEN") == "1" or not expected.exists():
        expected.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
    assert got == json.loads(expected.read_text()), name


def test_pdf2xml_golden():
    pages = pdf.parse_pdf2xml((GOLDEN_DIR / "sample.pdf2xml.xml").read_bytes())
    _golden("sample.pdf2xml", pages)
    # structural assertions independent of the golden file
    assert [p["number"] for p in pages] == [1, 2]
    p1 = pages[0]
    assert set(p1["fontspecs"]) == {"0", "1", "2"}
    # the whitespace-only box is dropped
    texts = [pdf.box_text(b) for b in p1["boxes"]]
    assert texts[0] == "Report heading "
    assert not any(t.strip() == "" for t in texts)
    # inline tag composition: <i><b> → "ib"
    tags = [p["tag"] for p in p1["boxes"][1]["parts"]]
    assert "i" in tags and "ib" in tags
    # links carried through
    link_parts = [p for b in p1["boxes"] for p in b["parts"]
                  if p["tag"] == "a"]
    assert link_parts and link_parts[0]["link"] == "https://example.org/ref"
    # fontspec registry is document-global: page 2 sees page 1's specs
    assert pages[1]["fontspecs"] is p1["fontspecs"]


def test_hocr_golden():
    pages = pdf.parse_hocr((GOLDEN_DIR / "sample.hocr.html").read_bytes())
    _golden("sample.hocr", pages)
    p1 = pages[0]
    assert p1["number"] == 1
    # 2480x3508 px on A4 → ~595x842 pt page
    assert abs(p1["height"] - 842) <= 2 and abs(p1["width"] - 595) <= 2
    # leading small digit word → superscript footnote marker
    line2 = p1["boxes"][1]
    assert line2["parts"][0]["text"].strip() == "3"
    assert line2["parts"][0]["tag"] == "sup"
    # <em> word → italic
    assert line2["parts"][2]["tag"] == "i"
    # synthesized fontspecs exist
    assert all(s["family"] == "unknown" for s in p1["fontspecs"].values())


def test_fontinfo_parse():
    table = (
        "name                                 type              encoding\n"
        "------------------------------------ ----------------- --------\n"
        "ABCDEF+Serif-Bold                    Type 1C           WinAnsi\n"
        "GHIJKL+Serif                         CID TrueType (OT) Custom\n")
    fi = pdf.parse_fontinfo(table)
    assert fi["ABCDEF+Serif-Bold"]["type"] == "Type1C"
    assert fi["GHIJKL+Serif"]["type"] == "CIDTrueType(OT)"
    assert fi["GHIJKL+Serif"]["encoding"] == "Custom"


def test_glue_paragraph_lines():
    pages = pdf.parse_pdf2xml((GOLDEN_DIR / "sample.pdf2xml.xml").read_bytes())
    raw = pages[0]["boxes"]
    glued = pdf.glue_textboxes(pages[0])
    # the two 14pt left-aligned adjacent lines merge into one paragraph
    assert len(glued) == len(raw) - 1
    merged = [b for b in glued
              if "Second line continues" in pdf.box_text(b)][0]
    assert "First line of the" in pdf.box_text(merged)
    # heading (different font size) does NOT merge
    assert pdf.box_text(glued[0]) == "Report heading "


def test_median_box_width():
    pages = pdf.parse_pdf2xml((GOLDEN_DIR / "sample.pdf2xml.xml").read_bytes())
    assert pdf.median_box_width(pages) == 200
    assert pdf.median_box_width(pages, threshold=250) == 320


def test_pdf_textbox_rows_stage(ray_session):
    import pyarrow as pa

    import ray.data as rd

    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "fmt": pa.array(["pdf2xml", "pdf2xml", "hocr"], pa.string()),
        "data": pa.array([pdf.synthetic_pdf2xml(0), b"not xml at all",
                          (GOLDEN_DIR / "sample.hocr.html").read_bytes()],
                         pa.binary()),
    })
    out = (rd.from_arrow(tab)
           .map_batches(pdf.pdf_textbox_rows, batch_format="pyarrow")
           .to_pandas())
    # poison-pill doc 1 skipped, docs 0 and 2 parsed
    assert set(out.doc_id) == {0, 2}
    assert (out[out.doc_id == 0].family.str.contains("SYNTH")).any()
    texts2 = (out[out.doc_id == 2].text
              .str.replace(r"\s+", " ", regex=True).str.strip())
    assert "Scanned 3 footnote marker" not in set(texts2)  # sup kept
    assert any(t.startswith("Scanned heading") for t in texts2)


def test_cluster_semantics():
    from ferenda_ray.util import cluster

    # gap clustering: default maxgap = range/10
    got = cluster([1, 2, 3, 100, 101, 102])
    assert got == [[1, 2, 3], [100, 101, 102]]
    # explicit maxgap
    assert cluster([1, 5, 6], maxgap=1) == [[1], [5, 6]]
    assert cluster([]) == []
    # outlier removal: coarse clustering (few groups for much data)
    # drops groups under 4 members
    data = list(range(20)) + [500]  # 2 groups over 21 points
    got = cluster(data, maxgap=5)
    assert got == [list(range(20))]
    # fine-grained clustering (many groups) keeps small groups
    assert cluster([1, 10, 20], maxgap=2, remove_outliers=True) == \
        [[1], [10], [20]]


def test_pdf_layout_metrics(ray_session):
    import pyarrow as pa

    import ray.data as rd

    tab = pa.table({
        "doc_id": pa.array([0, 5], pa.int64()),
        "fmt": pa.array(["pdf2xml"] * 2, pa.string()),
        "data": pa.array([pdf.synthetic_pdf2xml(0),
                          pdf.synthetic_pdf2xml(5)], pa.binary()),
    })
    tb = rd.from_arrow(tab).map_batches(pdf.pdf_textbox_rows,
                                        batch_format="pyarrow")
    out = pdf.pdf_layout(tb).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [0, 5]
    # page dims from the generator
    assert (out.pagewidth == 892).all() and (out.pageheight == 1263).all()
    # left margin: the generator's per-doc margin (85 + 5*(doc_id%4))
    assert out.loc[0, "leftmargin"] == 85
    assert out.loc[5, "leftmargin"] == 90
    # header zone boundary sits just above the first text mass (top 30)
    assert (out.topmargin == 29).all()
    # footer: the pagenumber box at top 1220 (bottom 1231) defines the
    # zone boundary (bottom + 1 per the cumulative-scan spec)
    assert (out.bottommargin == 1232).all()
    # body font dominates by char mass
    assert (out.default_family == "SYNTH+Serif").all()
    assert (out.default_size == 12).all()
    # right margin: quantized vote over ragged right edges near lm+600
    assert (out.rightmargin - (out.leftmargin + 600)).abs().max() <= 10
