"""WordReader stage (S7): docx unzip → OOXML parse → block rows
(reference wordreader.py semantics; see stages/word.py docstring)."""

import pyarrow as pa
import pytest

from ferenda_ray.stages.word import (docx_extract_ooxml, parse_docbook,
                                     parse_ooxml, paragraphs_to_blocks,
                                     synthetic_docx, word_block_rows,
                                     word_blocks)


def test_docx_roundtrip_blocks():
    data = synthetic_docx(3)
    blocks = word_blocks(data, "docx")
    assert [(b["kind"], b["level"], b["text"]) for b in blocks] == [
        ("heading", 1, "Spec 3"),
        ("heading", 2, "1. Scope"),
        ("paragraph", 0, "This document covers item 21."),
        ("paragraph", 0, "Key term: binding requirement."),
        ("listitem", 0, "point 3"),
    ]


def test_same_format_runs_merge():
    """Adjacent w:r runs with identical formatting merge into one run
    (reference _merge_ooxml); different formatting stays split."""
    xml = docx_extract_ooxml(synthetic_docx(0))
    paras = parse_ooxml(xml)
    plain = paras[2]["runs"]
    assert len(plain) == 1  # three split plain runs merged
    assert plain[0]["text"] == "This document covers item 0."
    styled = paras[3]["runs"]
    assert [(r["text"], r["bold"]) for r in styled] == [
        ("Key term: ", False), ("binding", True), (" requirement.", False)]


def test_control_char_workaround():
    """\\xc2\\x81 control char is rewritten to Å (reference
    _simplify_ooxml workaround)."""
    from ferenda_ray.stages.word import W_NS

    doc = (f'<w:document xmlns:w="{W_NS}"><w:body><w:p><w:r>'
           f"<w:t>[X]ngstr[X]m</w:t></w:r></w:p></w:body></w:document>"
           ).encode().replace(b"[X]", b"\xc2\x81")
    paras = parse_ooxml(doc)
    assert paras[0]["runs"][0]["text"] == "\xc5ngstr\xc5m"


def test_docbook_branch_splits_paragraphs():
    db = (b"<article><title>Old Doc</title>"
          b"<para>first piece\nsecond piece</para></article>")
    blocks = paragraphs_to_blocks(parse_docbook(db))
    assert [(b["kind"], b["text"]) for b in blocks] == [
        ("heading", "Old Doc"),
        ("paragraph", "first piece"),
        ("paragraph", "second piece"),
    ]


def test_missing_document_xml_raises():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", b"x")
    with pytest.raises(ValueError, match="word/document.xml"):
        docx_extract_ooxml(buf.getvalue())


def test_word_block_rows_batch_fn():
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "fmt": pa.array(["docx", "docx"], pa.string()),
        "data": pa.array([synthetic_docx(0), synthetic_docx(1)],
                         pa.binary()),
    })
    out = word_block_rows(batch)
    assert out.column("doc_id").to_pylist().count(0) == 5
    assert out.column("seq").to_pylist()[:5] == [0, 1, 2, 3, 4]
    assert set(out.column("kind").to_pylist()) == {
        "heading", "paragraph", "listitem"}


def test_word_blocks_feed_fsm_structure(ray_session):
    """End-to-end: docx rows → map_batches(word_block_rows) → the FSM
    structure tier nests the numbered section exactly like HTML blocks."""
    import ray.data as rd

    from ferenda_ray.stages.structure import parse_blocks

    n = 6
    tab = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "fmt": pa.array(["docx"] * n, pa.string()),
        "data": pa.array([synthetic_docx(i) for i in range(n)], pa.binary()),
    })
    rows = (rd.from_arrow(tab)
            .map_batches(word_block_rows, batch_format="pyarrow")
            .to_pandas())
    assert len(rows) == 5 * n
    blocks = [dict(kind=r.kind, level=int(r.level), text=r.text)
              for r in rows[rows.doc_id == 2].sort_values("seq").itertuples()]
    for b in blocks:
        if b["kind"] == "listitem":
            b.update(depth=1, ordered=False)
    tree = parse_blocks(blocks)
    kinds = [c["kind"] for c in tree["children"]]
    assert "Section" in kinds or "Heading" in kinds
