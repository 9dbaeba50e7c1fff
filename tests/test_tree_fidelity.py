"""Element-tree fidelity: nested list extraction + FSM re-nesting, and
in-tree LinkSubject citation annotation surfacing as anchors in
generated HTML (reference elements.py:632-660, citationparser.py:120-145)."""

import json

from ferenda_ray.ops.render import generate_html
from ferenda_ray.stages.extract import extract_page
from ferenda_ray.stages.link import scan_citation_spans, scan_citations
from ferenda_ray.stages.structure import annotate_citations, parse_blocks

NESTED_HTML = b"""<!DOCTYPE html><html lang="en"><head><title>T</title></head>
<body><h1>T</h1><h2>1. Lists</h2>
<ul><li>alpha</li><li>beta
<ol><li>beta-one</li><li>beta-two</li></ol>
</li><li>gamma</li></ul>
</body></html>"""


def test_extractor_list_depth_metadata():
    lang, title, text, blocks = extract_page(NESTED_HTML)
    items = [b for b in blocks if b["kind"] == "listitem"]
    assert [(b["text"], b["depth"], b["ordered"]) for b in items] == [
        ("alpha", 1, False), ("beta", 1, False),
        ("beta-one", 2, True), ("beta-two", 2, True),
        ("gamma", 1, False)]
    # the frozen text spec is unchanged: blocks in document order
    assert "beta\n\nbeta-one\n\nbeta-two\n\ngamma" in text


def test_fsm_nests_lists_from_metadata():
    _, _, _, blocks = extract_page(NESTED_HTML)
    tree = parse_blocks(blocks)
    sec = tree["children"][1]
    ul = sec["children"][0]
    assert ul["kind"] == "UnorderedList"
    assert [c["text"] for c in ul["children"]] == ["alpha", "beta", "gamma"]
    sub = ul["children"][1]["children"][0]
    assert sub["kind"] == "OrderedList"
    assert [c["text"] for c in sub["children"]] == ["beta-one", "beta-two"]


def test_scan_citation_spans_match_scan_citations():
    text = ("as defined in section 4.2 of RFC 793 this applies; "
            "see RFC 1234 and https://example.org/x.")
    uris = scan_citations(text)
    spans = scan_citation_spans(text)
    assert sorted(uris) == sorted(u for _, _, u in spans)
    # spans are non-overlapping, positioned, and slice the right text
    for s, e, uri in spans:
        assert 0 <= s < e <= len(text)
    assert text[spans[0][0]:spans[0][1]] == "section 4.2 of RFC 793"


def test_annotate_citations_parts_preserve_text():
    tree = {"kind": "Body", "children": [
        {"kind": "Paragraph",
         "text": "see RFC 793 for details at https://example.org/a."}]}
    annotate_citations(tree)
    p = tree["children"][0]
    assert "".join(part["text"] for part in p["parts"]) == p["text"]
    kinds = [part["kind"] for part in p["parts"]]
    assert "LinkSubject" in kinds
    uris = [part["uri"] for part in p["parts"]
            if part["kind"] == "LinkSubject"]
    assert "https://example.org/rfc/793" in uris
    assert "https://example.org/a" in uris


def test_generate_html_links_citations_and_nests_lists():
    _, title, _, blocks = extract_page(NESTED_HTML)
    tree = annotate_citations(parse_blocks(
        blocks + [{"kind": "paragraph", "level": 0,
                   "text": "covered by section 2 of RFC 793 here."}]))
    html = generate_html("https://example.org/d", title, tree)
    assert '<a href="https://example.org/rfc/793#S2" rel="dct:references">' \
        in html
    assert "<ol><li>beta-one</li><li>beta-two</li></ol>" in html.replace(
        "\n", "")


def test_kg_generate_emits_anchor_elements(ray_session, tmp_path):
    """End-to-end: the generate stage over the synthetic corpus emits
    anchor elements for scanned citations (VERDICT round-1 item 5)."""
    import pyarrow.parquet as pq

    from ferenda_ray.ops.render import generate_batch
    from ferenda_ray.pipelines.kg import build_docs_ds
    from ferenda_ray.sources.pages import corpus_table

    p = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(40), p)
    htmls = (build_docs_ds(p)
             .map_batches(generate_batch, batch_format="pyarrow")
             .to_pandas())
    joined = "\n".join(htmls.html)
    assert 'rel="dct:references"' in joined
    assert '<a href="https://example.org/rfc/' in joined


def test_fuzzy_link_first_word_misspelled():
    """Reference parity (lookup_resource fuzzy-matches the WHOLE
    commondata): a mention misspelled in its FIRST word must still
    link via the unblocked fallback."""
    from ferenda_ray.stages.link import EntityLinker

    linker = EntityLinker({"Acme Systems": "https://example.org/entity/acme",
                           "Orbit Labs": "https://example.org/entity/orbit"})
    # first word misspelled → blocked index misses, fallback recalls
    assert linker.link("Acme Systems") == "https://example.org/entity/acme"
    assert linker.link("Acne Systems") == "https://example.org/entity/acme"
    assert linker.link("Orbyt Labs") == "https://example.org/entity/orbit"
    assert linker.link("Zzz Qqq") is None


def test_template_override_extension_point():
    """Per-kind template overrides drive the generate transform (the
    reference's per-repo-XSLT user-extension point, transformer.py)."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "Intro", "children": [
            {"kind": "Paragraph", "text": "Hello <world>."}]}]}
    default = generate_html("https://example.org/d", "T", tree)
    assert "<p>Hello &lt;world&gt;.</p>" in default
    custom = generate_html(
        "https://example.org/d", "T", tree,
        templates={
            "Paragraph": '<div class="para">{inline}</div>',
            "Section": '<article data-ord="{ordinal_esc}">{children}</article>',
        })
    assert '<div class="para">Hello &lt;world&gt;.</div>' in custom
    assert '<article data-ord="1">' in custom
    assert "<section" not in custom


TABLE_HTML = b"""<!DOCTYPE html><html><head><title>T</title></head>
<body><h1>T</h1><h2>1. Data</h2>
<table><tr><th>Name</th><th>Qty</th></tr>
<tr><td>alpha</td><td>3</td></tr>
<tr><td>beta</td><td>5</td></tr></table>
<p>After table.</p></body></html>"""


def test_table_elements_extract_parse_render():
    """Tables re-nest into Table/TableRow/TableCell (reference
    elements.py table model) and render back to <table> HTML."""
    from ferenda_ray.ops.render import generate_html

    _, title, text, blocks = extract_page(TABLE_HTML)
    cells = [b for b in blocks if b["kind"] == "cell"]
    assert [(c["text"], c["row"], c["header"]) for c in cells] == [
        ("Name", 0, True), ("Qty", 0, True),
        ("alpha", 1, False), ("3", 1, False),
        ("beta", 2, False), ("5", 2, False)]
    # cell text still contributes to the frozen page-text spec
    assert "Name\n\nQty\n\nalpha\n\n3\n\nbeta\n\n5" in text

    tree = parse_blocks(blocks)
    sec = tree["children"][1]
    table = sec["children"][0]
    assert table["kind"] == "Table"
    assert [len(r["children"]) for r in table["children"]] == [2, 2, 2]
    assert table["children"][0]["children"][0]["header"] is True
    # paragraph after the table is a sibling, not swallowed
    assert sec["children"][1]["kind"] == "Paragraph"

    html = generate_html("https://example.org/t", title, tree)
    flat = html.replace("\n", "")
    assert "<table><tr><th>Name</th><th>Qty</th></tr>" in flat
    assert "<tr><td>beta</td><td>5</td></tr></table>" in flat


ADJACENT_TABLES_HTML = b"""<!DOCTYPE html><html lang="en"><head>
<title>T</title></head><body><h1>T</h1>
<table><tr><td>A1</td><td>A2</td></tr></table>
<table><tr><td>B1</td><td>B2</td></tr></table>
</body></html>"""


def test_adjacent_single_row_tables_stay_separate():
    # ADVICE r2: a row-index decrease never fires between two adjacent
    # single-row tables (both row 0); the per-doc table id must split them
    _, _, _, blocks = extract_page(ADJACENT_TABLES_HTML)
    cells = [b for b in blocks if b["kind"] == "cell"]
    assert [c["tid"] for c in cells] == [1, 1, 2, 2]
    tree = parse_blocks(blocks)
    tables = [c for c in tree["children"] if c["kind"] == "Table"]
    assert len(tables) == 2
    assert [[cell["text"] for cell in row["children"]]
            for row in tables[0]["children"]] == [["A1", "A2"]]
    assert [[cell["text"] for cell in row["children"]]
            for row in tables[1]["children"]] == [["B1", "B2"]]


SIBLING_SUBLISTS_HTML = b"""<!DOCTYPE html><html lang="en"><head>
<title>T</title></head><body><h1>T</h1>
<ul><li>host
<ol><li>o1</li></ol>
<ul><li>u1</li></ul>
</li><li>tail</li></ul>
</body></html>"""


def test_nested_sibling_sublist_kind_change():
    # ADVICE r2: ul directly following ol at the same inner depth must
    # open a SIBLING sublist of the matching kind, not append into the ol
    _, _, _, blocks = extract_page(SIBLING_SUBLISTS_HTML)
    tree = parse_blocks(blocks)
    ul = tree["children"][1]
    assert ul["kind"] == "UnorderedList"
    host = ul["children"][0]
    subs = host.get("children", [])
    assert [s["kind"] for s in subs] == ["OrderedList", "UnorderedList"]
    assert [c["text"] for c in subs[0]["children"]] == ["o1"]
    assert [c["text"] for c in subs[1]["children"]] == ["u1"]
    assert ul["children"][1]["text"] == "tail"


def test_template_pattern_rules():
    """The XSLT-style pattern subset: parent steps, attribute
    predicates, wildcard fallback, and specificity ordering."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "Intro", "children": [
            {"kind": "Paragraph", "text": "inside section"},
            {"kind": "Heading", "level": 3, "text": "Deep"},
            {"kind": "Heading", "level": 2, "text": "Shallow"}]},
        {"kind": "Paragraph", "text": "top level"}]}
    html = generate_html(
        "https://example.org/d", "T", tree,
        templates={
            # parent step: only paragraphs directly inside a Section
            "Section/Paragraph": '<p class="sec">{inline}</p>',
            # value predicate beats the plain-kind rule
            "Heading": "<h9>{text_esc}</h9>",
            "Heading[level=3]": '<h3 class="deep">{text_esc}</h3>',
        })
    assert '<p class="sec">inside section</p>' in html
    assert "<p>top level</p>" in html          # builtin rule still applies
    assert '<h3 class="deep">Deep</h3>' in html
    assert "<h9>Shallow</h9>" in html


def test_template_wildcard_and_presence_predicate():
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Paragraph", "text": "a"},
        {"kind": "Preformatted", "text": "b"}]}
    html = generate_html(
        "https://example.org/d", "T", tree,
        # wildcard must apply-templates ({children}) or it swallows the
        # subtree — the XSLT-rule contract
        templates={"*": "<x>{inline}{children}</x>",
                   "Paragraph[text=a]": "<only>{inline}</only>"})
    assert "<only>a</only>" in html
    assert "<x>b</x>" in html
    import pytest
    with pytest.raises(ValueError):
        generate_html("u", "T", tree, templates={"bad pattern!": "x"})


def test_template_default_output_unchanged_with_patterns_available():
    """Adding the pattern engine must not change default rendering."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "2", "title": "T2", "children": [
            {"kind": "Paragraph", "text": "x"},
            {"kind": "UnorderedList", "children": [
                {"kind": "ListItem", "text": "i1", "children": [
                    {"kind": "OrderedList", "children": [
                        {"kind": "ListItem", "text": "n1"}]}]}]}]}]}
    out = generate_html("https://example.org/d", "T", tree)
    assert "<section id=\"S2\"" in out
    assert "<ul>" in out and "<ol>" in out and "<li>i1" in out


def test_template_descendant_pattern_and_avt():
    """Round-4 template increment: ``Ancestor//Kind`` descent patterns
    (any-ancestor test, less specific than ``Parent/Kind``) and
    attribute value templates (``{field_attr}`` quoted+escaped
    variants)."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": 'He said "hi"',
         "children": [
             {"kind": "UnorderedList", "children": [
                 {"kind": "ListItem", "text": "li", "children": [
                     {"kind": "OrderedList", "children": [
                         {"kind": "ListItem", "text": "deep item"}]}]}]},
             {"kind": "Paragraph", "text": "direct child"}]},
        {"kind": "Paragraph", "text": "outside"}]}
    html = generate_html(
        "https://example.org/d", "T", tree,
        templates={
            # descendant: ANY listitem under a Section, however deep
            # ({children} keeps nested sublists — the XSLT
            # apply-templates contract)
            "Section//ListItem": '<li class="insec">{inline}{children}</li>',
            # immediate parent beats descendant for the direct child
            "Section//Paragraph": '<p class="desc">{inline}</p>',
            "Section/Paragraph": '<p class="direct">{inline}</p>',
            # AVT: attribute-safe interpolation of a field with quotes
            "Section": '<section data-t={title_attr}>{children}</section>',
        })
    assert '<li class="insec">deep item</li>' in html
    assert '<li class="insec">li' in html  # outer item matches too
    assert '<p class="direct">direct child</p>' in html   # / beats //
    assert "<p>outside</p>" in html  # descendant doesn't leak outside
    assert '<section data-t=\'He said "hi"\'>' in html


def test_template_descendant_specificity_order():
    """field predicate > Parent/Kind > Ancestor//Kind > Kind > *."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "t", "children": [
            {"kind": "Paragraph", "text": "x"}]}]}

    def render(tpls):
        return generate_html("u", "T", tree, templates=tpls)

    # // loses to /
    h = render({"Section//Paragraph": "<a>{inline}</a>",
                "Section/Paragraph": "<b>{inline}</b>"})
    assert "<b>x</b>" in h
    # // beats plain Kind
    h = render({"Paragraph": "<a>{inline}</a>",
                "Section//Paragraph": "<b>{inline}</b>"})
    assert "<b>x</b>" in h
    # predicate beats //
    h = render({"Section//Paragraph": "<a>{inline}</a>",
                "Paragraph[text=x]": "<b>{inline}</b>"})
    assert "<b>x</b>" in h


def test_template_ancestor_step_predicate():
    """Predicates on the ancestor step: Section[ordinal=1]/Paragraph
    matches only paragraphs whose parent section has that ordinal, and
    the descendant form Section[title=T]//ListItem reaches deep."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "Intro",
         "children": [{"kind": "Paragraph", "text": "p-one"}]},
        {"kind": "Section", "ordinal": "2", "title": "Deep",
         "children": [
             {"kind": "Paragraph", "text": "p-two"},
             {"kind": "UnorderedList", "children": [
                 {"kind": "ListItem", "text": "li-deep"}]}]}]}
    html = generate_html(
        "u", "T", tree,
        templates={
            "Section[ordinal=1]/Paragraph": '<p class="s1">{inline}</p>',
            "Section[title=Deep]//ListItem":
                '<li class="deep">{inline}</li>',
            # ancestor predicate beats the plain immediate-parent rule
            "Section/Paragraph": '<p class="any">{inline}</p>',
        })
    assert '<p class="s1">p-one</p>' in html
    assert '<p class="any">p-two</p>' in html
    assert '<li class="deep">li-deep</li>' in html


def test_template_positional_predicates():
    """Round-5 increment: XSLT positional predicates — ``Kind[1]``,
    ``Kind[position()=n]``, ``Kind[last()]`` (position among siblings
    of the SAME kind), and on the immediate-parent step."""
    import pytest

    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "A", "children": [
            {"kind": "Paragraph", "text": "a1"},
            {"kind": "Paragraph", "text": "a2"},
            {"kind": "Paragraph", "text": "a3"}]},
        {"kind": "Section", "ordinal": "2", "title": "B", "children": [
            {"kind": "Paragraph", "text": "b1"}]}]}

    html = generate_html(
        "u", "T", tree,
        templates={
            "Paragraph[1]": '<p class="lead">{inline}</p>',
            "Paragraph[last()]": '<p class="tail">{inline}</p>',
            "Paragraph[position()=2]": '<p class="mid">{inline}</p>',
        })
    assert '<p class="lead">a1</p>' in html
    assert '<p class="mid">a2</p>' in html
    assert '<p class="tail">a3</p>' in html
    # b1 is both first and last among its siblings; positional rules
    # tie on priority, later-defined wins (XSLT document order)
    assert '<p class="tail">b1</p>' in html

    # positional predicate on the parent step: only the FIRST section's
    # paragraphs
    html = generate_html(
        "u", "T", tree,
        templates={"Section[1]/Paragraph": '<p class="s1">{inline}</p>'})
    assert '<p class="s1">a1</p>' in html
    assert '<p class="s1">a2</p>' in html
    assert "b1" in html and '<p class="s1">b1</p>' not in html

    # position among SAME-KIND siblings: a heading between paragraphs
    # does not shift paragraph positions
    mixed = {"kind": "Body", "children": [
        {"kind": "Paragraph", "text": "p1"},
        {"kind": "Heading", "text": "H", "level": 3},
        {"kind": "Paragraph", "text": "p2"}]}
    html = generate_html(
        "u", "T", mixed,
        templates={"Paragraph[2]": '<p class="second">{inline}</p>'})
    assert '<p class="second">p2</p>' in html
    assert '<p class="second">p1</p>' not in html

    # positional predicates need sibling context: rejected on //
    with pytest.raises(ValueError):
        generate_html("u", "T", tree,
                      templates={"Section[1]//Paragraph": "x"})


def test_template_xpath_string_functions():
    """Round-5 template increment: the XPath-1.0 string-function set
    the reference stylesheets actually use (substring-after ×32,
    substring ×13, concat ×11, substring-before ×7, string-length ×7,
    normalize-space ×4, translate ×1 across res/xsl/*.xsl), nested,
    with XSLT-style escaped-text output and |attr AVT mode."""
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "2", "title": "RFC-7230: <Msg>",
         "ident": "doc-7230-old", "children": [
             {"kind": "Paragraph", "text": "  padded   text "}]}]}
    html = generate_html(
        "https://example.org/d", "T", tree,
        templates={
            "Section": (
                '<section id={concat(\'s\', ordinal)|attr} '
                'data-num={substring-after(title, \'-\')|attr} '
                'data-pre="{substring-before(ident, \'-\')}" '
                'data-len="{string-length(title)}">'
                "{substring(title, 1, 3)}{children}</section>"),
            "Paragraph": (
                "<p>{normalize-space(text)}|"
                "{translate(substring-after(ident, 'doc-'), '-od', '.')}"
                "</p>"),
        })
    # concat + attr mode quotes; substring-after escapes the payload
    assert '<section id="s2" data-num="7230: &lt;Msg&gt;"' in html
    assert 'data-pre="doc" data-len="15">RFC' in html
    # nested call + translate deletion semantics ('o','d' deleted,
    # '-'→'.'); ident comes from the enclosing element context only
    # when present — Paragraph has no ident, so it resolves empty
    assert "<p>padded text|</p>" in html


def test_template_fn_errors_and_cache_isolation():
    from ferenda_ray.ops.render import generate_html

    tree = {"kind": "Body", "children": [
        {"kind": "Paragraph", "text": "x"}]}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown template function"):
        generate_html("u", "T", tree,
                      templates={"Paragraph": "{bogus(text)}"})
    with _pytest.raises(ValueError, match="bad token"):
        generate_html("u", "T", tree,
                      templates={"Paragraph": "{concat(text,)}"})
    # an UNCLOSED paren never matches the fn-placeholder shape, so it
    # degrades to a plain (unknown → empty) placeholder, not an error
    h = generate_html("u", "T", tree,
                      templates={"Paragraph": "<p>{concat(text}</p>"})
    assert "<p></p>" in h
    # plain placeholders and *_esc/_attr variants are untouched
    h = generate_html("u", "T", tree,
                      templates={"Paragraph": "<p>{text_esc}</p>"})
    assert "<p>x</p>" in h
