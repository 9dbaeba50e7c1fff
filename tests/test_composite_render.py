"""Composite fallback-chain parse, unified-diff patching, and the
render tail (generate HTML / transformlinks / Atom feeds)."""

import json

import pyarrow as pa
import pytest

from ferenda_ray.stages.composite import (apply_unified_patch,
                                          composite_parse_batch, patch_batch)
from ferenda_ray.ops.render import (atom_feed, generate_html,
                                    transformlinks_html)


def _docs_batch(block_lists):
    return pa.table({
        "url": pa.array([f"https://x.org/{i}" for i in range(len(block_lists))]),
        "blocks": pa.array([json.dumps(b) for b in block_lists],
                           pa.large_string()),
    })


SECTIONED = [
    {"kind": "heading", "level": 2, "text": "1. Intro"},
    {"kind": "paragraph", "text": "hello world"},
]
FLAT = [
    {"kind": "paragraph", "text": "just prose"},
    {"kind": "paragraph", "text": "more prose"},
]


def test_composite_chain_picks_strict_then_falls_back():
    out = composite_parse_batch(_docs_batch([SECTIONED, FLAT]))
    used = out.column("parser_used").to_pylist()
    assert used == ["strict", "plain"]
    trees = [json.loads(t) for t in out.column("tree").to_pylist()]
    assert trees[0]["children"][0]["kind"] == "Section"
    assert all(c["kind"] == "Paragraph" for c in trees[1]["children"])


def test_apply_unified_patch_roundtrip():
    text = "alpha\nbravo\ncharlie\ndelta"
    patch = "@@ -2,2 +2,2 @@\n alpha\n-bravo\n+BRAVO\n charlie"
    # hunk header line numbers: -2 means starting at line 2... our applier
    # treats the header start as the first hunk line; build accordingly
    patch = "@@ -1,3 +1,3 @@\n alpha\n-bravo\n+BRAVO\n charlie"
    assert apply_unified_patch(text, patch) == "alpha\nBRAVO\ncharlie\ndelta"
    with pytest.raises(ValueError):
        apply_unified_patch("different\ncontent", patch)


def test_patch_batch_lineage():
    batch = pa.table({
        "url": pa.array(["u1", "u2"]),
        "text": pa.array(["a\nb", "a\nb"], pa.large_string()),
    })
    patches = {"u1": "@@ -1,2 +1,2 @@\n a\n-b\n+B"}
    out = patch_batch(batch, patches_ref=patches)
    assert out.column("text").to_pylist() == ["a\nB", "a\nb"]
    assert out.column("patched").to_pylist() == ["ok", ""]


def test_generate_and_transformlinks():
    tree = {"kind": "Body", "children": [
        {"kind": "Section", "ordinal": "1", "title": "Intro", "children": [
            {"kind": "Paragraph", "text": "x < y & z"}]},
    ]}
    html = generate_html("https://c.org/d", "T&itle", tree)
    assert "x &lt; y &amp; z" in html
    assert 'about="https://c.org/d#S1"' in html
    out = transformlinks_html(html, lambda u: u.replace("c.org", "local"))
    assert "https://local/d#S1" in out and "c.org" not in out


def test_atom_feed_pagination():
    import pandas as pd

    entries = pd.DataFrame({
        "uri": [f"u{i}" for i in range(7)],
        "updated": [f"2024-01-{i+1:02d}" for i in range(7)],
    })
    pages = atom_feed(entries, "feed:x", "X", archive_size=3)
    assert [p["n_entries"] for p in pages] == [3, 3, 1]
    assert "<feed" in pages[0]["xml"] and "u6" in pages[0]["xml"]
    # newest first: page 0 starts with the latest updated
    assert pages[0]["xml"].index("u6") < pages[0]["xml"].index("u5")
