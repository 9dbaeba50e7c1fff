"""PEP rule pack: header fold, reST body composition, citation scan,
registry-path assembly (reference ``sources/tech/pep.py`` conventions).
"""

import json
import os
import pathlib

from ferenda_ray.stages import pep

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens" / "pep"


def _golden(name: str, got):
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    expected = GOLDEN_DIR / f"{name}.expected.json"
    if os.environ.get("GOLDEN_REGEN") == "1" or not expected.exists():
        expected.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
    assert got == json.loads(expected.read_text()), name


def test_pep_parse_golden():
    meta, tree, refs = pep.pep_parse(pep.synthetic_pep(3))
    _golden("synthetic3", {"meta": meta, "tree": tree, "refs": refs})
    assert meta["PEP"] == "1003"
    assert meta["Status"] == "Deferred"
    # continuation line folded into Author
    assert "B. Builder" in meta["Author"]
    secs = [c["title"] for c in tree["children"]
            if c["kind"] == "Section"]
    assert secs == ["Abstract", "Specification", "References"]
    assert refs == sorted({"1010", "1023"}) == refs


def test_pep_header_edge_cases():
    meta, tree, refs = pep.pep_parse(
        "PEP: 7\nTitle: X\n\nBody mentions PEP 7 and PEP 8.\n")
    assert meta == {"PEP": "7", "Title": "X"}
    assert refs == ["7", "8"]
    # headerless text parses as all-body
    meta2, tree2, refs2 = pep.pep_parse("just a paragraph\n")
    assert meta2 == {} or "just" not in meta2
    assert tree2["kind"] == "Body"
    # header block terminated by end-of-input: every line folds into
    # meta and the body is EMPTY (the last header line must not
    # reappear as a phantom body paragraph)
    meta3, tree3, _ = pep.pep_parse("PEP: 7\nTitle: X")
    assert meta3 == {"PEP": "7", "Title": "X"}
    assert tree3["children"] == []
    # ... including when the final line is a continuation fold
    meta4, tree4, _ = pep.pep_parse("PEP: 7\nAuthor: A. Lovelace,\n   B. Babbage")
    assert meta4["Author"] == "A. Lovelace, B. Babbage"
    assert tree4["children"] == []
    # empty input
    meta5, tree5, _ = pep.pep_parse("")
    assert meta5 == {} and tree5["children"] == []


def test_pep_registry_path(ray_session, tmp_path):
    """The pack runs as a USER step through registry.assemble with a
    custom reader — the extension-surface contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray import registry

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([pep.synthetic_pep(0), pep.synthetic_pep(1)],
                         pa.string()),
    }), str(src / "part.parquet"))
    ini = tmp_path / "pep.ini"
    ini.write_text(
        "[pipeline]\n"
        "steps = pep\n"
        "reader = ferenda_ray.stages.pep:read_pep_src\n\n"
        "[pep]\n"
        "fn = ferenda_ray.stages.pep:pep_rows_batch\n")
    out = (registry.assemble(str(src), str(ini))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.pep) == [1000, 1001]
    assert (out.n_sections == 3).all()
    assert out.loc[0, "status"] == "Final"
