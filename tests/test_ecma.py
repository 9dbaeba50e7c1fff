"""ECMA clause rule pack: FSM re-nesting of numbered clauses / annexes
/ NOTE elements over the PDF textbox stream (reference
``sources/tech/ecma.py`` corpus conventions)."""

import json
import os
import pathlib

from ferenda_ray.stages import ecma

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens" / "ecma"


def _golden(name: str, got):
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    expected = GOLDEN_DIR / f"{name}.expected.json"
    if os.environ.get("GOLDEN_REGEN") == "1" or not expected.exists():
        expected.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
    assert got == json.loads(expected.read_text()), name


def test_ecma_tree_golden():
    from ferenda_ray.stages.pdf import (box_text, glue_textboxes,
                                        parse_pdf2xml)

    pages = parse_pdf2xml(ecma.synthetic_ecma_pdf2xml(2))
    texts = [box_text(b).strip() for p in pages
             for b in glue_textboxes(p)]
    tree = ecma.parse_boxes(texts)
    _golden("synthetic2", tree)
    kinds = [c["kind"] for c in tree["children"]]
    # title paragraph, clauses 1/2/3, annex — 2.1/2.1.1 NEST inside 2
    assert kinds == ["Paragraph", "Clause", "Clause", "Clause", "Annex"]
    c2 = tree["children"][2]
    assert c2["ordinal"] == "2"
    sub = [c for c in c2["children"] if c["kind"] == "Clause"]
    assert [s["ordinal"] for s in sub] == ["2.1"]
    assert [s["ordinal"] for s in sub[0]["children"]
            if s["kind"] == "Clause"] == ["2.1.1"]
    # NOTE is a typed element, not a paragraph
    assert any(c["kind"] == "Note" for c in c2["children"])
    annex = tree["children"][4]
    assert annex["ordinal"] == "A" and annex["normative"] is True
    assert annex["title"] == "Grammar"


def test_ecma_clause_rows():
    from ferenda_ray.stages.pdf import (box_text, glue_textboxes,
                                        parse_pdf2xml)

    pages = parse_pdf2xml(ecma.synthetic_ecma_pdf2xml(0))
    texts = [box_text(b).strip() for p in pages
             for b in glue_textboxes(p)]
    rows = {r["ordinal"]: r
            for r in ecma.clause_rows(0, ecma.parse_boxes(texts))}
    assert set(rows) == {"1", "2", "2.1", "2.1.1", "3", "A"}
    assert rows["2"]["n_paragraphs"] == 1   # its own para, not 2.1's
    assert rows["2"]["n_notes"] == 1
    assert rows["3"]["n_notes"] == 1        # "NOTE 2 ..." variant
    assert rows["A"]["kind"] == "Annex" and rows["A"]["depth"] == 1
    assert rows["2.1.1"]["depth"] == 3


def test_ecma_unwind_to_annex_hosting():
    """Clauses after an annex heading nest under the annex; a new
    top-level clause cannot appear (real standards end with annexes),
    but a deeper unwind inside the annex must work."""
    texts = ["1 Scope", "Intro text.",
             "Annex A (informative) Examples",
             "1 Sample", "Example body.",
             "NOTE annex note."]
    tree = ecma.parse_boxes(texts)
    annex = [c for c in tree["children"] if c["kind"] == "Annex"][0]
    assert annex["normative"] is False
    inner = [c for c in annex["children"] if c["kind"] == "Clause"]
    assert inner and inner[0]["ordinal"] == "1"
    assert any(c["kind"] == "Note" for c in inner[0]["children"])
