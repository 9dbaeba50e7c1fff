"""reST parser stage (M21 analog)."""

import json

import pyarrow as pa

from ferenda_ray.stages.rst import rst_batch, rst_parse

SRC = """Title
=====

Intro paragraph.

Sub One
-------

* item a
* item b
"""


def test_rst_parse_structure():
    tree = rst_parse(SRC)
    kinds = [c["kind"] for c in tree["children"]]
    assert "Paragraph" in kinds
    secs = [c for c in tree["children"] if c["kind"] == "Section"]
    assert secs and secs[0]["title"] == "Sub One"
    ul = [c for c in secs[0]["children"] if c["kind"] == "UnorderedList"][0]
    assert [li["text"] for li in ul["children"]] == ["item a", "item b"]


def test_rst_batch_and_garbage():
    b = pa.table({"id": pa.array([1, 2]),
                  "rst": pa.array([SRC, ".. bogus::\n  ["], pa.large_string())})
    out = rst_batch(b)
    assert out.column_names == ["id", "tree"]
    trees = [json.loads(t) for t in out.column("tree").to_pylist()]
    assert all(t["kind"] == "Body" for t in trees)
