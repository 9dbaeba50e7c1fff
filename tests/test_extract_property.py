"""Property-based tests of the frozen extraction spec: determinism,
spec rules 1-9 (extract.py docstring), and generator/extractor
agreement on randomized corpus specs."""

import random

from hypothesis import given, settings, strategies as st

from ferenda_ray.sources import pages as pgen
from ferenda_ray.stages.extract import extract_page, _Extractor


WORD = st.text(alphabet="abcdefghijklmnop <>&;\"'", min_size=0, max_size=12)


@settings(max_examples=150, deadline=None)
@given(st.lists(WORD, max_size=8), st.booleans(), st.booleans())
def test_extractor_deterministic_and_reuse_safe(words, pre, noise):
    """Same input → same output, and a REUSED extractor instance gives
    the same result as a fresh one (per-doc state fully reset)."""
    body = []
    for i, w in enumerate(words):
        import html as html_mod

        esc = html_mod.escape(w)
        if pre and i % 3 == 0:
            body.append(f"<pre>{esc}</pre>")
        else:
            body.append(f"<p>{esc}</p>")
        if noise and i % 2 == 0:
            body.append("<script>var x = '<p>not text</p>';</script>")
    doc = ("<html lang=\"en\"><head><title>t</title></head><body>"
           + "".join(body) + "</body></html>").encode()

    fresh = _Extractor().run(doc)
    again = extract_page(doc)
    assert fresh == (_Extractor().run(doc))
    assert again == extract_page(doc)
    # script content never leaks into text
    assert all("not text" not in b["text"] for b in fresh[2])


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_generator_html_text_roundtrip(i):
    """For ANY corpus index, extracting the rendered html reproduces the
    generator's expected text byte-for-byte (the per-url invariant at
    arbitrary scale, not just the fixture range)."""
    spec = pgen.gen_spec(i)
    lang, title, text, blocks = extract_page(pgen.render_html(spec))
    assert text == pgen.expected_text(spec)
    assert title == spec["title"]
    assert lang == spec["lang"]


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_extractor_never_crashes_on_garbage(data):
    """Poison-pill safety: arbitrary bytes must not raise."""
    lang, title, blocks = _Extractor().run(data)
    assert isinstance(blocks, list)
