"""File-based FSM goldens (reference pattern: test/files/fsmparser/
*.txt -> *.xml via file_parametrize + FERENDA_SET_TESTFILE regeneration,
testutil.py:812-851, 929-948). Regenerate with GOLDEN_REGEN=1."""

import json
import re
import os
import pathlib

import pytest

from ferenda_ray.stages.structure import parse_blocks, serialize_tree

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens" / "fsm"
KIND = {"H1": ("heading", 1), "H2": ("heading", 2), "H3": ("heading", 3),
        "H4": ("heading", 4), "P": ("paragraph", 0), "L": ("listitem", 0),
        "PRE": ("preformatted", 0)}

_LIST_TAG = re.compile(r"^L(\d*)(O?)$")  # L, L2, LO, L2O … (depth, ordered)


def load_blocks(path: pathlib.Path) -> list[dict]:
    blocks = []
    for line in path.read_text().splitlines():
        tag, _, text = line.partition("|")
        m = _LIST_TAG.match(tag)
        if m and tag != "L":
            blk = {"kind": "listitem", "level": 0,
                   "text": text.replace("\\n", "\n"),
                   "depth": int(m.group(1) or 1),
                   "ordered": bool(m.group(2))}
            blocks.append(blk)
            continue
        kind, level = KIND[tag]
        blocks.append({"kind": kind, "level": level,
                       "text": text.replace("\\n", "\n")})
    return blocks


@pytest.mark.parametrize(
    "case", sorted(p.stem for p in GOLDEN_DIR.glob("*.txt")))
def test_fsm_golden(case):
    src = GOLDEN_DIR / f"{case}.txt"
    expected = GOLDEN_DIR / f"{case}.expected.json"
    got = json.loads(serialize_tree(parse_blocks(load_blocks(src))))
    if os.environ.get("GOLDEN_REGEN") == "1" or not expected.exists():
        expected.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
    assert got == json.loads(expected.read_text()), case
