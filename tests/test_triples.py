"""Triple emission + validation + linking unit tests (distill-golden
philosophy of the reference: order-insensitive set comparison,
testutil.py:648-668, minus bnodes — SURVEY §7.6.3)."""

import datetime

import numpy as np

from ferenda_ray import schemas as S
from ferenda_ray.sources import entities as ent
from ferenda_ray.stages.canon import UriMinter, build_canonical_map
from ferenda_ray.stages.link import EntityLinker, format_rfc_uri, scan_citations
from ferenda_ray.stages.structure import parse_blocks
from ferenda_ray.stages.triples import doc_triples, validate_doc

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _tree():
    return parse_blocks(
        [
            {"kind": "heading", "level": 2, "text": "1. intro"},
            {"kind": "paragraph", "level": 0, "text": "p"},
            {"kind": "heading", "level": 3, "text": "1.1 detail"},
        ]
    )


def test_doc_triples_set():
    url = "https://x.example.org/doc/1.html"
    got = {
        (t["subj"], t["pred"], t["obj"], t["lang"], t["datatype"])
        for t in doc_triples(url, TS, "en", "Doc One", _tree())
    }
    expected = {
        (url, S.RDF_TYPE, S.BIBO_DOCUMENT, "", ""),
        (url, S.DCT_IDENTIFIER, "1.html", "", ""),
        (url, S.PROV_WASGENERATEDBY, S.ENGINE_URI, "", ""),
        (url, S.DCT_TITLE, "Doc One", "en", ""),
        (url, S.DCT_LANGUAGE, "en", "", ""),
        (url, S.DCT_ISSUED, "2024-03-01", "", S.XSD_DATE),
        (f"{url}#S1", S.RDF_TYPE, S.BIBO_DOCUMENTPART, "", ""),
        (f"{url}#S1", S.BIBO_CHAPTER, "1", "", ""),
        (f"{url}#S1", S.DCT_TITLE, "intro", "en", ""),
        (f"{url}#S1", S.DCT_ISPARTOF, url, "", ""),
        (url, S.DCT_HASPART, f"{url}#S1", "", ""),
        (f"{url}#S1.1", S.RDF_TYPE, S.BIBO_DOCUMENTPART, "", ""),
        (f"{url}#S1.1", S.BIBO_CHAPTER, "1.1", "", ""),
        (f"{url}#S1.1", S.DCT_TITLE, "detail", "en", ""),
        (f"{url}#S1.1", S.DCT_ISPARTOF, f"{url}#S1", "", ""),
        (f"{url}#S1", S.DCT_HASPART, f"{url}#S1.1", "", ""),
    }
    assert got == expected


def test_validation():
    url = "https://x.example.org/doc/1.html"
    ok, reason = validate_doc(url, doc_triples(url, TS, "en", "T", _tree()))
    assert ok, reason
    # no title → missing required predicate
    ok, reason = validate_doc(url, doc_triples(url, TS, "en", "", _tree()))
    assert not ok and "dc/terms/title" in reason


def test_scan_citations():
    text = ("see RFC 2616 for details. as defined in section 4.2 of RFC 822 "
            "this applies. more at https://www.site001.example.org/doc/3.html "
            "as published.")
    assert scan_citations(text) == [
        format_rfc_uri("822", "4.2"),
        format_rfc_uri("2616"),
        "https://www.site001.example.org/doc/3.html",
    ]
    # section-of-RFC suppresses the inner bare "RFC n" match
    assert scan_citations("section 1 of RFC 9000.") == [
        format_rfc_uri("9000", "1")
    ]
    assert scan_citations("trailing https://a.example.org/x.") == [
        "https://a.example.org/x"
    ]


def test_entity_linker_exact_fuzzy_miss():
    linker = EntityLinker(ent.alias_dict(50))
    assert linker.link(ent.entity_label(3)) == ent.entity_uri(3)
    # fuzzy: noisy variant (one char dropped in word 2) resolves
    assert linker.link(ent.noisy_label(7)) == ent.entity_uri(7)
    assert linker.link("Completely Unrelated Phrase") is None


def test_entity_linker_embedding_disambiguation():
    etab = ent.entities_table(100)
    uris = etab.column("entity_uri").to_pylist()
    matrix = np.array(etab.column("embedding").to_pylist(), dtype=np.float32)
    linker = EntityLinker(ent.alias_dict(100), uris, matrix)
    for i in (5, 17, 42, 99):
        assert linker.link(ent.noisy_label(i)) == ent.entity_uri(i), i


def test_uri_minter_priority():
    m = UriMinter(
        [
            {"priority": 1, "requires": ["slug"],
             "template": "https://e.org/x/{slug}"},
            {"priority": 2, "requires": ["id"],
             "template": "https://e.org/id/{id}"},
        ]
    )
    assert m.mint({"label": "Acme Corp"}) == "https://e.org/x/acme-corp"
    assert m.mint({"id": "42"}) == "https://e.org/id/42"
    assert m.mint({}) is None


def test_canonical_map_sameas_then_mint():
    rows = [
        {"entity_uri": ent.entity_uri(4), "label": ent.entity_label(4)},
        {"entity_uri": ent.entity_uri(7), "label": ent.entity_label(7)},
    ]
    cmap = build_canonical_map(rows, {ent.entity_uri(7): ent.entity_uri(4)})
    minted4 = "https://example.org/entity/" + ent.entity_label(4).lower().replace(" ", "-")
    assert cmap[ent.entity_uri(4)] == minted4
    # the sameAs duplicate collapses onto entity 4's minted URI
    assert cmap[ent.entity_uri(7)] == minted4


def test_nt_escaping_edge_cases():
    import pyarrow as pa

    from ferenda_ray.stages.materialize import _nt_escape

    assert _nt_escape('say "hi"\nnew\tline\\end') == \
        'say \\"hi\\"\\nnew\\tline\\\\end'
