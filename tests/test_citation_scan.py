"""Citation scanner: the merged sec|rfc alternation must be
behavior-identical to the reference-shaped three-pass scan with an
explicit covered-span check (differential fuzz)."""

import random
import re

from ferenda_ray.stages.link import (_TRAIL_PUNCT, _citation_matches,
                                     format_rfc_uri)

_SECTION_OF_RFC = re.compile(r"section (\d+(?:\.\d+)*) of RFC (\d+)", re.I)
_RFC = re.compile(r"\bRFC (\d+)\b")
_URL = re.compile(r"https?://[^\s<>\"')\]]+")


_EU_DIR = re.compile(r"Directive (\d{4})/(\d+)/(?:EC|EEC|EU)")
_EU_REG = re.compile(r"Regulation \((?:EC|EEC|EU)\) No (\d+)/(\d{2,4})")
_EU_ART = re.compile(
    r"\bArticle (\d+)(?:\((\d+)\))? of "
    r"(?:Directive (\d{4})/(\d+)/(?:EC|EEC|EU)"
    r"|Regulation \((?:EC|EEC|EU)\) No (\d+)/(\d{2,4}))\b")


def _three_pass(text):
    from ferenda_ray.stages.link import format_eulaw_uri

    sec, rfc, urls = [], [], []
    covered = []
    for m in _SECTION_OF_RFC.finditer(text):
        sec.append((m.start(), m.end(),
                    format_rfc_uri(m.group(2), m.group(1))))
        covered.append(m.span())
    for m in _RFC.finditer(text):
        if any(a <= m.start() < b for a, b in covered):
            continue
        rfc.append((m.start(), m.end(), format_rfc_uri(m.group(1))))
    eu_art, eu_act, eu_cov = [], [], []
    for m in _EU_ART.finditer(text):
        art, sub, dy, dn, rn, ry = m.groups()
        uri = (format_eulaw_uri("dir", dy, dn, art, sub) if dy
               else format_eulaw_uri("reg", ry, rn, art, sub))
        eu_art.append((m.start(), m.end(), uri))
        eu_cov.append(m.span())
    for pat, act in ((_EU_DIR, "dir"), (_EU_REG, "reg")):
        for m in pat.finditer(text):
            if any(a <= m.start() < b for a, b in eu_cov):
                continue
            g1, g2 = m.groups()
            uri = (format_eulaw_uri("dir", g1, g2) if act == "dir"
                   else format_eulaw_uri("reg", g2, g1))
            eu_act.append((m.start(), m.end(), uri))
    eu_act.sort()
    for m in _URL.finditer(text):
        u = m.group(0).rstrip(_TRAIL_PUNCT)
        urls.append((m.start(), m.start() + len(u), u))
    return sec, rfc, eu_art, eu_act, urls


VOCAB = ["RFC 21", "rfc 9", "section 3 of RFC 21", "SECTION 4.1 OF RFC 99",
         "subsection 2 of RFC 5", "https://x.org/a;b.", "see", "RFC", "21",
         "section 3 of rfc 7", "http://a.b/c)", "word", "RFC 123456",
         "Section 9.9.9 of RFC 1", "of RFC 3", "https://y.z/RFC", ".",
         "section of RFC 2", "RFC 21 section 3 of RFC 21",
         "Directive 2000/31/EC", "Regulation (EC) No 1049/2001",
         "Article 6(1) of Directive 2000/31/EC", "Article 9 of",
         "Article 7 of Regulation (EU) No 45/01", "Directive 31/EC",
         "directive 2000/31/EC", "Regulation (EC) No 1049",
         "Article of Directive 2000/31/EC"]


def test_differential_fuzz_vs_three_pass():
    rng = random.Random(42)
    for _ in range(5000):
        t = " ".join(rng.choice(VOCAB)
                     for _ in range(rng.randint(1, 12)))
        assert _citation_matches(t) == _three_pass(t), t


def test_priority_and_case_rules():
    sec, rfc, _ea, _eb, urls = _citation_matches(
        "See Section 3.1 of RFC 21, RFC 9, rfc 10 and https://e.x/RFC 5")
    assert [u for _, _, u in sec] == ["https://example.org/rfc/21#S3.1"]
    # bare-RFC is case-SENSITIVE ("rfc 10" no match); url tail overlap
    # keeps the bare "RFC 5"
    assert [u for _, _, u in rfc] == ["https://example.org/rfc/9",
                                      "https://example.org/rfc/5"]
    assert [u for _, _, u in urls] == ["https://e.x/RFC"]


def test_eulaw_grammar_rules():
    """EU grammar pack (reference citationpatterns.eulaw analog):
    article-of-act consumes the act (priority), bare acts match both
    forms, case-sensitive keywords."""
    from ferenda_ray.stages.link import _citation_matches

    sec, rfc, eu_art, eu_act, urls = _citation_matches(
        "under Article 6(1) of Directive 2000/31/EC and pursuant to "
        "Regulation (EC) No 1049/2001; directive 9/EC is not one")
    assert [u for _, _, u in eu_art] == [
        "https://example.org/eulaw/dir/2000/31#A6.1"]
    assert [u for _, _, u in eu_act] == [
        "https://example.org/eulaw/reg/2001/1049"]
    assert not sec and not rfc and not urls
