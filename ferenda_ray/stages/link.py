"""Stage S3 — mention detection + citation parsing + entity linking.

Reference semantics rebuilt:

* citation scanning over document text spans with compiled grammars →
  reference-URI triples (``citationparser.py:65-165`` recursive scan,
  grammar packs ``citationpatterns.py:16-70``, RFC formatter
  ``rfc.py:430-452``: "section X of RFC Y" / "RFC Y" / bare URL).
* alias → canonical-entity linking: exact dictionary hit, else fuzzy
  ``difflib.get_close_matches(cutoff=0.8)`` with first-match tie-break
  (``documentrepository.py:478-525`` ``lookup_resource``), disambiguated
  by an embedding cosine scorer when the fuzzy match is ambiguous (the
  BASELINE's embedding-ANN component).

This is the canonical STATEFUL ACTOR POOL stage (SURVEY §2.3 ST1/ST3):
the alias dictionary, blocking index, and entity-embedding matrix are
broadcast once via ``ray.put`` and loaded in ``__init__`` (once per
actor); per-batch work is regex scans + numpy dot products. Run it as
``ds.map_batches(LinkStage, fn_constructor_kwargs={...},
concurrency=N, batch_size=B)``.

Scale notes: the alias side is the SMALL side of a join — broadcast, not
shuffled (ray guide "Joins and lookups"). Fuzzy matching is blocked by
the mention's first word, so each miss compares against a handful of
candidate labels, not the whole dictionary.
"""

from __future__ import annotations

import difflib
import re

import numpy as np
import pyarrow as pa

from ferenda_ray import schemas as S
from ferenda_ray.sources.entities import embed_text

RFC_NS = "https://example.org/rfc/"

# grammar pack (compiled once per actor)
_SECTION_OF_RFC = re.compile(r"section (\d+(?:\.\d+)*) of RFC (\d+)", re.I)
_RFC = re.compile(r"\bRFC (\d+)\b")
_URL = re.compile(r"https?://[^\s<>\"')\]]+")
_MENTION = re.compile(r"\b([A-Z][a-z]+(?: [A-Z][a-z]+)+(?: \d+)?)\b")
_TRAIL_PUNCT = ".,;:!?"


def format_rfc_uri(num: str, section: str | None = None) -> str:
    """Canonical RFC URI with #S fragments (reference rfc.py:430-452)."""
    uri = f"{RFC_NS}{int(num)}"
    return f"{uri}#S{section}" if section else uri


# sec|rfc in one alternation: a left-to-right scan consumes a
# "section X of RFC Y" whole, so the bare-RFC branch can never fire
# inside it — exactly the reference's grammar-priority overlap rule
# (citationparser.py:97-131) without the explicit covered-span check
# (two finditer passes merged; profiled at ~8% of the fused stage).
# URLs stay a SEPARATE pass: url spans may legitimately overlap a bare
# RFC match ("…/RFC 21" → both), differential-fuzz-pinned in
# tests/test_citation_scan.py.
_CITE = re.compile(
    r"(?i:section (?P<s_sec>\d+(?:\.\d+)*) of RFC (?P<s_rfc>\d+))"
    r"|\bRFC (?P<rfc>\d+)\b",
    re.ASCII,  # pin \b/\d to the RE2 semantics of the SQL oracles
)

# EU-legislation grammar pack (reference ``citationpatterns.py:34-70``
# ``eulaw``: Institution + LegalactType + (Directive | Regulation) and
# ``artikel N.M i <act>`` — anglicized to the EUR-LEX English surface
# forms). Same single-alternation priority trick: the
# article-of-legalact branch consumes the whole phrase, so the bare
# act branch never fires inside it.
EULAW_NS = "https://example.org/eulaw/"

_EU_DIRECTIVE = r"Directive (?P<{p}dy>\d{{4}})/(?P<{p}dn>\d+)/(?:EC|EEC|EU)"
_EU_REGULATION = (r"Regulation \((?:EC|EEC|EU)\) "
                  r"No (?P<{p}rn>\d+)/(?P<{p}ry>\d{{2,4}})")


def _eu_act(prefix: str) -> str:
    return (f"(?:{_EU_DIRECTIVE.format(p=prefix)}"
            f"|{_EU_REGULATION.format(p=prefix)})")


_EU_CITE = re.compile(
    r"\bArticle (?P<art>\d+)(?:\((?P<sub>\d+)\))? of "
    + _eu_act("a") + r"\b"
    + r"|\b" + _eu_act("") + r"\b",
    re.ASCII)  # Unicode \b/\d diverge from the RE2 oracle on
               # non-ASCII neighbours/digits ('…/ECé', '١٢')


def format_eulaw_uri(act: str, year: str, num: str,
                     article: str | None = None,
                     sub: str | None = None) -> str:
    """Canonical EU-legislation URI (reference URIFormatter slot for
    the eulaw grammar): ``eulaw/dir/{year}/{num}`` /
    ``eulaw/reg/{year}/{num}`` with ``#A{article}[.{sub}]``
    fragments."""
    uri = f"{EULAW_NS}{act}/{int(year)}/{int(num)}"
    if article:
        frag = f"#A{int(article)}"
        if sub:
            frag += f".{int(sub)}"
        return uri + frag
    return uri


def _eu_uri_from_match(m: re.Match, prefix: str,
                       article: str | None, sub: str | None) -> str:
    dy, dn = m.group(f"{prefix}dy"), m.group(f"{prefix}dn")
    if dy is not None:
        return format_eulaw_uri("dir", dy, dn, article, sub)
    rn, ry = m.group(f"{prefix}rn"), m.group(f"{prefix}ry")
    return format_eulaw_uri("reg", ry, rn, article, sub)


def _citation_matches(text: str):
    """Grammar-priority citation matching → span groups
    ((start, end, uri) each): section-of-RFC, bare RFC not covered by
    the former, article-of-EU-act, bare EU act, URLs."""
    sec, rfc, urls = [], [], []
    for m in _CITE.finditer(text):
        if m.lastgroup == "s_rfc":
            sec.append((m.start(), m.end(),
                        format_rfc_uri(m.group("s_rfc"),
                                       m.group("s_sec"))))
        else:
            rfc.append((m.start(), m.end(),
                        format_rfc_uri(m.group("rfc"))))
    eu_art, eu_act = [], []
    for m in _EU_CITE.finditer(text):
        if m.group("art") is not None:
            eu_art.append((m.start(), m.end(),
                           _eu_uri_from_match(m, "a", m.group("art"),
                                              m.group("sub"))))
        else:
            eu_act.append((m.start(), m.end(),
                           _eu_uri_from_match(m, "", None, None)))
    for m in _URL.finditer(text):
        u = m.group(0).rstrip(_TRAIL_PUNCT)
        urls.append((m.start(), m.start() + len(u), u))
    return sec, rfc, eu_art, eu_act, urls


def scan_citations(text: str) -> list[str]:
    """All citation target URIs in a text span, in grammar-priority
    match order."""
    groups = _citation_matches(text)
    return [uri for group in groups for _, _, uri in group]


def scan_citation_spans(text: str) -> list[tuple[int, int, str]]:
    """Non-overlapping citation spans sorted by position — the input to
    in-tree ``LinkSubject`` annotation (reference
    ``citationparser.py:120-145`` inserts LinkSubject nodes in place of
    matched text)."""
    spans: list[tuple[int, int, str]] = []
    for group in _citation_matches(text):
        for s, e, uri in group:
            if not any(a < e and s < b for a, b, _ in spans):
                spans.append((s, e, uri))
    return sorted(spans)


class EntityLinker:
    """Alias → entity-URI resolver: exact, then blocked fuzzy (cutoff 0.8,
    first-match tie-break), then embedding-cosine disambiguation."""

    FUZZY_CUTOFF = 0.8

    def __init__(self, alias_to_uri: dict[str, str],
                 emb_uris: list[str] | None = None,
                 emb_matrix: np.ndarray | None = None):
        self.alias_to_uri = alias_to_uri
        # blocking index: first word -> candidate labels (keeps each fuzzy
        # probe O(candidates), not O(dictionary))
        self.block: dict[str, list[str]] = {}
        for label in alias_to_uri:
            self.block.setdefault(label.split(" ", 1)[0], []).append(label)
        self.emb_index: dict[str, np.ndarray] = {}
        if emb_uris is not None and emb_matrix is not None:
            self.emb_index = {u: emb_matrix[i] for i, u in enumerate(emb_uris)}
        self._all_labels = list(alias_to_uri)
        self._fuzzy_cache: dict[str, list[str]] = {}
        # full-resolution memo: mentions repeat heavily across documents
        # (web text follows a Zipf law over entity surface forms), and
        # link() is a pure function of the broadcast state — so each
        # worker resolves a distinct surface form ONCE. Bounded so a
        # pathological corpus can't grow worker heap unboundedly.
        self._link_cache: dict[str, str | None] = {}

    def _fuzzy_all(self, mention: str) -> list[str]:
        got = self._fuzzy_cache.get(mention)
        if got is None:
            got = difflib.get_close_matches(
                mention, self._all_labels, n=3, cutoff=self.FUZZY_CUTOFF)
            if len(self._fuzzy_cache) < 100_000:  # bound worker memory
                self._fuzzy_cache[mention] = got
        return got

    def link(self, mention: str) -> str | None:
        uri = self.alias_to_uri.get(mention)
        if uri is not None:
            return uri
        try:
            return self._link_cache[mention]
        except KeyError:
            pass
        uri = self._link_slow(mention)
        if len(self._link_cache) < 200_000:
            self._link_cache[mention] = uri
        return uri

    def _link_slow(self, mention: str) -> str | None:
        cands = self.block.get(mention.split(" ", 1)[0])
        close = (difflib.get_close_matches(mention, cands, n=3,
                                           cutoff=self.FUZZY_CUTOFF)
                 if cands else [])
        if not close:
            # reference parity: ``lookup_resource`` fuzzy-matches the
            # WHOLE commondata (documentrepository.py:478-525); the
            # first-word blocking above cannot recall a mention
            # misspelled in its first word, so a blocked miss falls
            # back to the full label list (rare path, memoized per
            # worker).
            close = self._fuzzy_all(mention)
        if not close:
            return None
        if len(close) == 1 or not self.emb_index:
            return self.alias_to_uri[close[0]]
        # ambiguous: embedding cosine argmax; ties keep difflib order
        mv = embed_text(mention)
        best_uri, best_score = None, -2.0
        for label in close:
            u = self.alias_to_uri[label]
            e = self.emb_index.get(u)
            score = float(mv @ e) if e is not None else -1.0
            if score > best_score:
                best_uri, best_score = u, score
        return best_uri


def _maybe_get(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class LinkStage:
    """sections batch → reference/subject triples batch.

    ``alias_ref``: ObjectRef (or plain dict) of label→entity_uri.
    ``emb_ref``: ObjectRef (or plain tuple) of (uris, float32 matrix).
    """

    def __init__(self, alias_ref, emb_ref=None):
        alias = _maybe_get(alias_ref)
        uris, matrix = (None, None)
        if emb_ref is not None:
            uris, matrix = _maybe_get(emb_ref)
        self.linker = EntityLinker(alias, uris, matrix)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs, preds, objs, urls = [], [], [], []
        for url, about, text in zip(
            batch.column("url").to_pylist(),
            batch.column("about").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for target in scan_citations(text):
                subjs.append(about)
                preds.append(S.DCT_REFERENCES)
                objs.append(target)
                urls.append(url)
            for m in _MENTION.finditer(text):
                uri = self.linker.link(m.group(1))
                if uri is not None:
                    subjs.append(about)
                    preds.append(S.DCT_SUBJECT)
                    objs.append(uri)
                    urls.append(url)
        n = len(subjs)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "obj_is_uri": pa.array([True] * n, pa.bool_()),
                "lang": pa.array([""] * n, pa.string()),
                "datatype": pa.array([""] * n, pa.string()),
                "url": pa.array(urls, pa.string()),
            }
        )
