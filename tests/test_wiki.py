"""Wiki-markup parser (M20 analog)."""

import json

import pyarrow as pa

from ferenda_ray.stages.wiki import wiki_batch, wiki_parse


MARKUP = """== Intro ==
Some '''bold''' text linking [[Target Page]] inline.

* first [[Other|aliased]] item
* second item
# ordered one

Closing ''paragraph'' here.
"""


def test_wiki_parse_structure_and_links():
    tree, links = wiki_parse(MARKUP)
    kinds = [c["kind"] for c in tree["children"]]
    assert kinds == ["Heading", "Paragraph", "UnorderedList", "OrderedList",
                     "Paragraph"]
    assert tree["children"][0] == {"kind": "Heading", "level": 2,
                                   "text": "Intro"}
    assert tree["children"][1]["text"] == \
        "Some bold text linking Target Page inline."
    ul = tree["children"][2]
    assert [li["text"] for li in ul["children"]] == ["first aliased item",
                                                     "second item"]
    assert links == ["Target Page", "Other"]


def test_wiki_batch_columns():
    b = pa.table({"page": pa.array(["p1"]),
                  "markup": pa.array([MARKUP], pa.large_string())})
    out = wiki_batch(b)
    assert out.column_names == ["page", "tree", "links"]
    tree = json.loads(out.column("tree").to_pylist()[0])
    assert tree["kind"] == "Body"
    assert out.column("links").to_pylist() == ["Target Page;Other"]


def test_wiki_parse_empty_and_garbage():
    for s in ("", "====", "***", "[[", "'''"):
        tree, links = wiki_parse(s)
        assert tree["kind"] == "Body"
