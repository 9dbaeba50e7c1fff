"""FSM engine + webtext rule pack goldens (the reference's
test/files/fsmparser golden pattern, testutil.py:929-948)."""

import json

from ferenda_ray.stages.structure import parse_blocks, serialize_tree


def H(level, text):
    return {"kind": "heading", "level": level, "text": text}


def P(text):
    return {"kind": "paragraph", "level": 0, "text": text}


def L(text):
    return {"kind": "listitem", "level": 0, "text": text}


def PRE(text):
    return {"kind": "preformatted", "level": 0, "text": text}


def test_flat_paragraphs():
    tree = parse_blocks([P("a"), P("b")])
    assert tree == {
        "kind": "Body",
        "children": [
            {"kind": "Paragraph", "text": "a"},
            {"kind": "Paragraph", "text": "b"},
        ],
    }


def test_nested_sections_renest():
    """Flat h2/h3 stream re-nests by ordinal depth (w3c.py:179-207
    analog) with multi-level unwind."""
    tree = parse_blocks(
        [
            H(1, "Title"),
            H(2, "1. intro"),
            P("p1"),
            H(3, "1.1 detail"),
            P("p2"),
            H(3, "1.2 more"),
            P("p3"),
            H(2, "2. next"),
            P("p4"),
        ]
    )
    body = tree["children"]
    assert body[0] == {"kind": "Heading", "level": 1, "text": "Title"}
    s1 = body[1]
    assert (s1["kind"], s1["ordinal"], s1["title"]) == ("Section", "1", "intro")
    assert s1["children"][0] == {"kind": "Paragraph", "text": "p1"}
    s11, s12 = s1["children"][1], s1["children"][2]
    assert (s11["ordinal"], s12["ordinal"]) == ("1.1", "1.2")
    s2 = body[2]
    assert s2["ordinal"] == "2"
    assert s2["children"] == [{"kind": "Paragraph", "text": "p4"}]


def test_deep_unwind():
    """1.1.1 → 2 unwinds two levels at once."""
    tree = parse_blocks(
        [H(2, "1. a"), H(3, "1.1 b"), H(4, "1.1.1 c"), P("deep"), H(2, "2. d")]
    )
    body = tree["children"]
    assert [s["ordinal"] for s in body] == ["1", "2"]
    assert body[0]["children"][0]["children"][0]["children"] == [
        {"kind": "Paragraph", "text": "deep"}
    ]


def test_list_grouping():
    tree = parse_blocks([L("a"), L("b"), P("after"), L("c")])
    kinds = [c["kind"] for c in tree["children"]]
    assert kinds == ["UnorderedList", "Paragraph", "UnorderedList"]
    assert [li["text"] for li in tree["children"][0]["children"]] == ["a", "b"]


def test_pre_and_unnumbered_heading():
    tree = parse_blocks([H(2, "Background"), PRE("x = 1"), P("p")])
    assert tree["children"][0] == {
        "kind": "Heading", "level": 2, "text": "Background"
    }
    assert tree["children"][1] == {"kind": "Preformatted", "text": "x = 1"}


def test_sections_absorb_lists_and_pre():
    tree = parse_blocks([H(2, "1. s"), L("a"), PRE("code")])
    s = tree["children"][0]
    assert [c["kind"] for c in s["children"]] == ["UnorderedList", "Preformatted"]


def test_serialize_roundtrip():
    tree = parse_blocks([H(2, "1. s"), P("x")])
    assert json.loads(serialize_tree(tree)) == tree
