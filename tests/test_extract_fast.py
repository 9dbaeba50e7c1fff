"""Equivalence of the fast regex tokenizer (_FastExtractor, the
production path) with the stdlib-html.parser reference implementation
(_Extractor) — corpus, structured hypothesis HTML, and garbage."""

import html as html_mod

from hypothesis import given, settings, strategies as st

from ferenda_ray.sources import pages as pgen
from ferenda_ray.stages.extract import _Extractor, _FastExtractor


def both(doc: bytes):
    return _Extractor().run(doc), _FastExtractor().run(doc)


def test_corpus_equivalence():
    for i in range(300):
        doc = pgen.render_html(pgen.gen_spec(i))
        ref, fast = both(doc)
        assert ref == fast, i


TEXT = st.text(alphabet="ab<>&;'\"= \n\tés", min_size=0, max_size=20)
TAGS = st.sampled_from(
    ["p", "h1", "h2", "li", "pre", "div", "span", "ul", "blockquote",
     "script", "style", "center", "td", "em"])


@st.composite
def html_doc(draw):
    parts = ["<html lang=\"en\"><head><title>t&amp;1</title>"
             "<script>var a = '<p>x</p>';</script></head><body>"]
    for _ in range(draw(st.integers(0, 8))):
        tag = draw(TAGS)
        inner = html_mod.escape(draw(TEXT))
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(f"<{tag}>{inner}</{tag}>")
        elif kind == 1:
            parts.append(f"<{tag} class=\"x&gt;y\" id='z'>{inner}</{tag}>")
        elif kind == 2:
            parts.append(f"<{tag}>{inner}<br>{inner}</{tag}>")
        elif kind == 3:
            parts.append(f"<!-- comment <p>no</p> -->{inner}")
        elif kind == 4:
            parts.append(f"<{tag}/>{inner}")
        else:
            parts.append(inner)
    parts.append("</body></html>")
    return "".join(parts).encode()


@settings(max_examples=300, deadline=None)
@given(html_doc())
def test_structured_equivalence(doc):
    ref, fast = both(doc)
    assert ref == fast


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>ab/&;!-=\"' ptitle", max_size=120))
def test_fuzz_no_crash_and_blocks_sane(s):
    """On arbitrary tag soup the fast path must not crash and must
    produce the same blocks as the reference for inputs where the
    reference itself is well-defined (no unterminated constructs)."""
    doc = s.encode()
    lang, title, blocks = _FastExtractor().run(doc)
    assert isinstance(blocks, list)
    if "<" not in s:  # plain text: strict equivalence must hold
        assert _Extractor().run(doc) == (lang, title, blocks)
