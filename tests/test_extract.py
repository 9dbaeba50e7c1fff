"""Extraction spec tests: hand-written HTML goldens + the generated-corpus
byte-identical invariant (BASELINE.json per-row invariant)."""

from ferenda_ray.sources import pages
from ferenda_ray.stages.extract import extract_page


def test_drops_script_style_head():
    html = (b"<html><head><title>T</title><script>x</script>"
            b"<style>y</style></head><body><script>var a=1;</script>"
            b"<p>hello</p><noscript>no</noscript></body></html>")
    lang, title, text, blocks = extract_page(html)
    assert title == "T"
    assert text == "hello"


def test_blocks_and_normalization():
    html = (b"<html lang=\"en\"><body><h1> A   Title </h1>"
            b"<p>\n  spaced   out\n</p><ul><li>one</li><li>two</li></ul>"
            b"<pre>\nline 1\n  line 2\n</pre></body></html>")
    lang, title, text, blocks = extract_page(html)
    assert lang == "en"
    assert title == "A Title"
    assert text == "A Title\n\nspaced out\n\none\n\ntwo\n\nline 1\n  line 2"
    kinds = [b["kind"] for b in blocks]
    assert kinds == ["heading", "paragraph", "listitem", "listitem",
                     "preformatted"]


def test_entity_decoding():
    html = b"<html><body><p>a &amp; b &lt; c</p></body></html>"
    _, _, text, _ = extract_page(html)
    assert text == "a & b < c"


def test_br_is_space_in_paragraph():
    html = b"<html><body><p>a<br>b</p></body></html>"
    _, _, text, _ = extract_page(html)
    assert text == "a b"


def test_loose_text_becomes_paragraph():
    html = b"<html><body>floating <b>text</b><p>para</p></body></html>"
    _, _, text, _ = extract_page(html)
    assert text == "floating text\n\npara"


def test_nested_block_flushes_outer():
    html = b"<html><body><li>item<ul><li>sub</li></ul></li></body></html>"
    _, _, text, _ = extract_page(html)
    assert text == "item\n\nsub"


def test_empty_and_malformed_html():
    assert extract_page(b"")[2] == ""
    assert extract_page(b"<p>unclosed")[2] == "unclosed"
    assert extract_page(b"\xff\xfenot utf8 <p>x</p>")[2].endswith("x")


def test_generated_corpus_byte_identical():
    """THE invariant: extractor(html) == golden text column, byte for
    byte, on every generated row (incl. snapshot revisions)."""
    for i in range(120):
        for row in pages.gen_rows(i):
            lang, title, text, _ = extract_page(row["html"])
            assert text == row["text"], row["url"]
            assert lang == row["lang"]


def test_generator_determinism():
    a = pages.gen_rows(7)
    b = pages.gen_rows(7)
    assert a == b
    assert pages.corpus_table(10).equals(pages.corpus_table(10))


def test_raw_prefilter_sparser_style(ray_session):
    """Filter-before-parse: only pages whose raw bytes contain a needle
    survive; no false negatives for substring predicates."""
    import pyarrow as pa

    from ferenda_ray.sources import pages as pgen
    from ferenda_ray.stages.extract import raw_prefilter

    tab = pgen.corpus_table(60)
    out = raw_prefilter(tab, ["RFC "])
    assert 0 < out.num_rows < tab.num_rows
    # every surviving page really contains the needle...
    assert all(b"RFC " in h for h in out.column("html").to_pylist())
    # ...and every dropped page really does not (no false negatives)
    kept = set(out.column("url").to_pylist())
    for u, h in zip(tab.column("url").to_pylist(),
                    tab.column("html").to_pylist()):
        if u not in kept:
            assert b"RFC " not in h
    assert raw_prefilter(tab, []).num_rows == tab.num_rows
