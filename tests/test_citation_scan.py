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


def _three_pass(text):
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
    for m in _URL.finditer(text):
        u = m.group(0).rstrip(_TRAIL_PUNCT)
        urls.append((m.start(), m.start() + len(u), u))
    return sec, rfc, urls


VOCAB = ["RFC 21", "rfc 9", "section 3 of RFC 21", "SECTION 4.1 OF RFC 99",
         "subsection 2 of RFC 5", "https://x.org/a;b.", "see", "RFC", "21",
         "section 3 of rfc 7", "http://a.b/c)", "word", "RFC 123456",
         "Section 9.9.9 of RFC 1", "of RFC 3", "https://y.z/RFC", ".",
         "section of RFC 2", "RFC 21 section 3 of RFC 21"]


def test_differential_fuzz_vs_three_pass():
    rng = random.Random(42)
    for _ in range(5000):
        t = " ".join(rng.choice(VOCAB)
                     for _ in range(rng.randint(1, 12)))
        assert _citation_matches(t) == _three_pass(t), t


def test_priority_and_case_rules():
    sec, rfc, urls = _citation_matches(
        "See Section 3.1 of RFC 21, RFC 9, rfc 10 and https://e.x/RFC 5")
    assert [u for _, _, u in sec] == ["https://example.org/rfc/21#S3.1"]
    # bare-RFC is case-SENSITIVE ("rfc 10" no match); url tail overlap
    # keeps the bare "RFC 5"
    assert [u for _, _, u in rfc] == ["https://example.org/rfc/9",
                                      "https://example.org/rfc/5"]
    assert [u for _, _, u in urls] == ["https://e.x/RFC"]
