"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Generates the BASELINE.json input_hint table
``(url, warc_ts, html, text, lang)`` as a pure function of (seed, row
index) per FIXTURES.md: Zipf-ish host skew, repeated urls with multiple
``warc_ts`` snapshots (exercising latest-per-url dedup, reference
``download_is_different`` ``documentrepository.py:1028-1034``), template
HTML with numbered h1/h2/h3 headings (the FSM section grammar shape of
reference ``rfc.py:356`` / ``w3c.py:170``), paragraphs, lists, ``pre``
blocks, inline citations ("RFC 2616", "section 4.2 of RFC 822", bare
URLs — reference grammars ``rfc.py:438-448``,
``citationpatterns.py:16-36``), entity mentions from the alias table
(including fuzzy variants), and script/style noise that extraction must
strip (reference ``documentrepository.py:312-315``).

The ``text`` column is the golden byte-exact expected extraction, computed
from the structured spec INDEPENDENTLY of the extractor (the extractor
must reproduce it from ``html`` alone).
"""

from __future__ import annotations

import datetime
import html as html_mod
import random

import pyarrow as pa

from ferenda_ray.sources import entities as ent

SEED = 42
N_HOSTS = 100

_WORDS = (
    "protocol header field value server client request response message "
    "stream section token encoding transfer payload origin cache agent "
    "resource method status content format schema record index batch "
    "partition cluster worker shard replica queue buffer channel socket "
    "timeout retry policy quota limit window offset segment"
).split()

_PRE_LINES = (
    "GET /index.html HTTP/1.1",
    "Host: example.org",
    "  Accept: text/html",
    "HTTP/1.1 200 OK",
    "  Content-Type: text/html",
    "Cache-Control: no-store",
)


def _sentence(rng: random.Random, nmin: int = 6, nmax: int = 14) -> str:
    n = rng.randint(nmin, nmax)
    return " ".join(rng.choice(_WORDS) for _ in range(n)) + "."


def host_id(rng: random.Random) -> int:
    """Zipf-ish skew: most pages land on a few head hosts."""
    return int(N_HOSTS * (rng.random() ** 4))


def page_url(i: int, seed: int = SEED) -> str:
    rng = random.Random(f"{seed}:url:{i}")
    return f"https://www.site{host_id(rng):03d}.example.org/doc/{i}.html"


def gen_spec(i: int, seed: int = SEED) -> dict:
    """Structured document spec — the single source of truth for html,
    expected text, and inserted citation/mention goldens."""
    rng = random.Random(f"{seed}:{i}")
    url = page_url(i, seed)
    r = rng.random()
    lang = "en" if r < 0.90 else ("sv" if r < 0.98 else "")
    title = f"Document {i} overview"
    citations: list[dict] = []
    mentions: list[dict] = []
    sections = []
    n_top = rng.randint(2, 4)
    for s in range(1, n_top + 1):
        sections.append(_gen_section(rng, str(s), 2, i, citations, mentions, seed))
        if rng.random() < 0.5:
            for ss in range(1, rng.randint(1, 2) + 1):
                sections.append(
                    _gen_section(rng, f"{s}.{ss}", 3, i, citations, mentions, seed)
                )
    return {
        "i": i,
        "url": url,
        "lang": lang,
        "title": title,
        "sections": sections,
        "citations": citations,
        "mentions": mentions,
    }


def _gen_section(rng, ordinal, hlevel, i, citations, mentions, seed) -> dict:
    frag = f"S{ordinal}"
    heading = f"{ordinal}. {' '.join(rng.choice(_WORDS) for _ in range(3))}"
    blocks: list[dict] = []
    for _ in range(rng.randint(1, 3)):
        parts = [_sentence(rng)]
        r = rng.random()
        if r < 0.25:
            num = rng.randint(700, 9999)
            parts.append(f"see RFC {num} for details.")
            citations.append(
                {"frag": frag, "kind": "rfc", "rfc": num, "section": None}
            )
        elif r < 0.40:
            num = rng.randint(700, 9999)
            a, b = rng.randint(1, 9), rng.randint(1, 9)
            parts.append(f"as defined in section {a}.{b} of RFC {num} this applies.")
            citations.append(
                {"frag": frag, "kind": "rfc", "rfc": num, "section": f"{a}.{b}"}
            )
        elif r < 0.52:
            tgt = page_url(rng.randint(0, max(0, i - 1)) if i else 0, seed)
            parts.append(f"more at {tgt} as published.")
            citations.append({"frag": frag, "kind": "url", "target": tgt})
        elif r < 0.62:
            # EU-legislation citations (reference citationpatterns
            # ``eulaw`` grammar, anglicized EUR-LEX surface forms)
            form = rng.randint(0, 2)
            year = rng.randint(1990, 2024)
            num = rng.randint(1, 2000)
            if form == 0:
                parts.append(f"in accordance with Directive {year}/{num}"
                             "/EC as amended.")
                citations.append({"frag": frag, "kind": "eu",
                                  "act": "dir", "year": year, "num": num,
                                  "article": None, "sub": None})
            elif form == 1:
                parts.append(f"pursuant to Regulation (EC) No {num}"
                             f"/{year} it follows.")
                citations.append({"frag": frag, "kind": "eu",
                                  "act": "reg", "year": year, "num": num,
                                  "article": None, "sub": None})
            else:
                art, sub = rng.randint(1, 30), rng.randint(1, 9)
                parts.append(f"under Article {art}({sub}) of Directive "
                             f"{year}/{num}/EU this holds.")
                citations.append({"frag": frag, "kind": "eu",
                                  "act": "dir", "year": year, "num": num,
                                  "article": art, "sub": sub})
        if rng.random() < 0.35:
            eidx = rng.randint(0, ent.N_ENTITIES - 1)
            noisy = rng.random() < 0.3
            label = ent.noisy_label(eidx) if noisy else ent.entity_label(eidx)
            parts.append(f"the organization {label} announced support.")
            mentions.append(
                {"frag": frag, "entity": eidx, "label": label, "noisy": noisy}
            )
        blocks.append({"kind": "paragraph", "text": " ".join(parts)})
    if rng.random() < 0.30:
        items = [
            f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} option"
            for _ in range(rng.randint(2, 4))
        ]
        blocks.append({"kind": "list", "ordered": rng.random() < 0.4, "items": items})
    if rng.random() < 0.20:
        k = rng.randint(2, 4)
        start = rng.randint(0, len(_PRE_LINES) - 2)
        lines = [_PRE_LINES[(start + j) % len(_PRE_LINES)] for j in range(k)]
        blocks.append({"kind": "pre", "text": "\n".join(lines)})
    return {"ordinal": ordinal, "hlevel": hlevel, "heading": heading, "blocks": blocks}


# ---------------------------------------------------------------------------
# HTML rendering + expected-text computation (two independent walks of the
# same spec; the extractor must map html → expected_text byte-exactly)
# ---------------------------------------------------------------------------

_NOISE_SCRIPT = "<script>var x = 1 < 2 && 'skip me';</script>"
_NOISE_STYLE = "<style>body { margin: 0; }</style>"


def render_html(spec: dict) -> bytes:
    esc = html_mod.escape
    out = ["<!DOCTYPE html>"]
    lang_attr = f' lang="{spec["lang"]}"' if spec["lang"] else ""
    out.append(f"<html{lang_attr}>")
    out.append(
        f"<head><meta charset=\"utf-8\"><title>{esc(spec['title'])}</title>"
        f"{_NOISE_SCRIPT}{_NOISE_STYLE}</head>"
    )
    out.append("<body>")
    out.append("<!-- generated synthetic page -->")
    out.append(f"<h1>{esc(spec['title'])}</h1>")
    for si, sec in enumerate(spec["sections"]):
        out.append(f"<h{sec['hlevel']}>{esc(sec['heading'])}</h{sec['hlevel']}>")
        for blk in sec["blocks"]:
            if blk["kind"] == "paragraph":
                out.append(f"<p>\n  {esc(blk['text'])}\n</p>")
            elif blk["kind"] == "list":
                tag = "ol" if blk["ordered"] else "ul"
                items = "".join(f"<li>{esc(it)}</li>" for it in blk["items"])
                out.append(f"<{tag}>{items}</{tag}>")
            elif blk["kind"] == "pre":
                out.append(f"<pre>\n{esc(blk['text'])}\n</pre>")
        if si == 0:
            out.append(_NOISE_SCRIPT)  # mid-body noise extraction must drop
    out.append("</body></html>")
    return "\n".join(out).encode("utf-8")


def expected_text(spec: dict) -> str:
    blocks = [spec["title"]]
    for sec in spec["sections"]:
        blocks.append(sec["heading"])
        for blk in sec["blocks"]:
            if blk["kind"] == "paragraph":
                blocks.append(blk["text"])
            elif blk["kind"] == "list":
                blocks.extend(blk["items"])
            elif blk["kind"] == "pre":
                blocks.append(blk["text"])
    return "\n\n".join(blocks)


# ---------------------------------------------------------------------------
# Row emission (snapshots included) and Ray/parquet materialization
# ---------------------------------------------------------------------------

_EPOCH = datetime.datetime(2024, 1, 1)


def gen_rows(i: int, seed: int = SEED) -> list[dict]:
    """All pages-table rows for logical document i (1 current + 0-2 older
    snapshots of the same url with earlier warc_ts and different content)."""
    spec = gen_spec(i, seed)
    ts = _EPOCH + datetime.timedelta(seconds=i * 17 % (86400 * 365))
    rows = [_row(spec, ts)]
    if i % 11 == 0:
        rng = random.Random(f"{seed}:snap:{i}")
        for back in range(1, rng.randint(1, 2) + 1):
            old = dict(spec)
            old["sections"] = spec["sections"][: max(1, len(spec["sections"]) - back)]
            old["title"] = spec["title"] + " (draft)"
            rows.append(_row(old, ts - datetime.timedelta(days=30 * back)))
    return rows


def _row(spec: dict, ts: datetime.datetime) -> dict:
    return {
        "url": spec["url"],
        "warc_ts": ts,
        "html": render_html(spec),
        "text": expected_text(spec),
        "lang": spec["lang"],
    }


def pages_batch(indices) -> pa.Table:
    """Vector entry point for map_batches over ray.data.range(n)."""
    rows: list[dict] = []
    for i in indices:
        rows.extend(gen_rows(int(i)))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def generate_corpus_ds(n_pages: int):
    """Distributed corpus generation: range(n) → map_batches(pages_batch).

    Used by bench.py to materialize the bench input once under /tmp.
    """
    import ray.data as rd

    # one output block (= one parquet file) per ~256 pages: read-side
    # parallelism of the downstream pipeline is capped by file count,
    # so the corpus must be written in many small files (real crawls
    # are: one file per WARC segment)
    blocks = max(1, -(-n_pages // 256))
    return rd.range(n_pages, override_num_blocks=blocks).map_batches(
        lambda b: pages_batch(b["id"]),
        batch_format="numpy",
        batch_size=256,
    )


def write_corpus(path: str, n_pages: int) -> None:
    generate_corpus_ds(n_pages).write_parquet(path)


def corpus_table(n_pages: int, seed: int = SEED) -> pa.Table:
    """Small in-memory corpus for tests."""
    tabs = [pages_batch(range(n_pages))]
    return pa.concat_tables(tabs)
