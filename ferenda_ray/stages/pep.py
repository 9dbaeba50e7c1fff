"""PEP corpus rule pack (reference ``sources/tech/pep.py`` — a
plaintext ``DocumentRepository`` over hg-cloned PEP files; the download
side is n/a here, the PARSE conventions are what the pack provides):

* an RFC-822 header block (``PEP:``, ``Title:``, ``Author:``,
  ``Status:``, ``Type:``, ``Created:``) terminated by the first blank
  line, with indented continuation lines folding into the previous
  field (the email.parser semantics PEP 1 specifies);
* a reStructuredText body — parsed by the existing reST pack
  (:func:`ferenda_ray.stages.rst.rst_parse`), proving the packs
  compose;
* ``PEP <n>`` citation scanning (the RFC-scan analog for this corpus),
  ASCII-pinned so the SQL oracle's RE2 matches exactly.

Batch stage :func:`pep_rows_batch`: ``(doc_id, text)`` → one metadata
row per document. Every output column is recomputable by DuckDB regex
over the raw text (``PEP_DOCS_SQL`` via ``pep_docs_sql``), so the
driver oracle checks extraction SEMANTICS, not self-consistency.
"""

from __future__ import annotations

import re

import pyarrow as pa

_HDR = re.compile(r"^(?P<k>[A-Za-z][A-Za-z0-9-]*):\s*(?P<v>.*)$",
                  re.ASCII)
_PEP_REF = re.compile(r"\bPEP (\d+)\b", re.ASCII)


def pep_parse(text: str) -> tuple[dict, dict, list[str]]:
    """PEP plaintext → (header dict, body element tree, sorted distinct
    referenced PEP numbers as strings)."""
    from ferenda_ray.stages.rst import rst_parse

    lines = text.splitlines()
    meta: dict[str, str] = {}
    last_key = None
    i = 0
    for i, line in enumerate(lines):
        if not line.strip():
            break
        if line[:1].isspace() and last_key:
            meta[last_key] += " " + line.strip()  # continuation fold
            continue
        m = _HDR.match(line)
        if not m:
            break
        last_key = m.group("k")
        meta[last_key] = m.group("v").strip()
    else:
        # header block ran to end-of-input (no blank/body line): every
        # line was folded into meta; without this, lines[i:] would
        # re-include the LAST header line as a phantom body paragraph
        i = len(lines)
    body = "\n".join(lines[i:])
    tree = rst_parse(body)
    refs = sorted({m.group(1) for m in _PEP_REF.finditer(text)})
    return meta, tree, refs


def _count_sections(tree: dict) -> int:
    n = 0
    stack = [tree]
    while stack:
        e = stack.pop()
        if e.get("kind") == "Section":
            n += 1
        stack.extend(e.get("children", []))
    return n


def pep_rows_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → one (doc_id, pep, title, status, type,
    n_sections, refs) row per document."""
    out = {"doc_id": [], "pep": [], "title": [], "status": [],
           "type": [], "n_sections": [], "refs": []}
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        meta, tree, refs = pep_parse(text)
        out["doc_id"].append(doc_id)
        out["pep"].append(int(meta.get("PEP", "0") or 0))
        out["title"].append(meta.get("Title", ""))
        out["status"].append(meta.get("Status", ""))
        out["type"].append(meta.get("Type", ""))
        out["n_sections"].append(_count_sections(tree))
        out["refs"].append(";".join(refs))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "pep": pa.array(out["pep"], pa.int64()),
        "title": pa.array(out["title"], pa.string()),
        "status": pa.array(out["status"], pa.string()),
        "type": pa.array(out["type"], pa.string()),
        "n_sections": pa.array(out["n_sections"], pa.int64()),
        "refs": pa.array(out["refs"], pa.string()),
    })


def pep_docs_sql(parquet_path: str) -> str:
    """DuckDB recompute of :func:`pep_rows_batch` over the raw
    (doc_id, text) parquet: header fields by anchored regex; section
    count = title+underline pairs (the synthetic corpus uses
    single-level ``=`` underlines, docutils' Section per adornment);
    refs = sorted distinct ``PEP n`` targets over the whole text (the
    header spells ``PEP:`` so it can never match)."""
    return f"""
WITH src AS (
    SELECT doc_id, text FROM read_parquet('{parquet_path}/*.parquet')
), lines AS (
    SELECT doc_id, ls[i] AS l, i FROM (
        SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM src))
), sec AS (
    SELECT a.doc_id, count(*) AS n_sections
    FROM lines a JOIN lines b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    WHERE regexp_matches(b.l, '^=+$') AND len(b.l) >= len(a.l)
      AND len(trim(a.l)) > 0
    GROUP BY a.doc_id
), refs AS (
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
               regexp_extract_all(text, '\\bPEP ([0-9]+)\\b', 1))), ';')
               AS refs
    FROM src
)
SELECT s.doc_id,
       CAST(coalesce(nullif(regexp_extract(
           s.text, '(^|\\n)PEP: *([^\\n]*)', 2), ''), '0') AS BIGINT)
           AS pep,
       trim(regexp_extract(s.text, '(^|\\n)Title: *([^\\n]*)', 2))
           AS title,
       trim(regexp_extract(s.text, '(^|\\n)Status: *([^\\n]*)', 2))
           AS status,
       trim(regexp_extract(s.text, '(^|\\n)Type: *([^\\n]*)', 2))
           AS type,
       coalesce(sec.n_sections, 0) AS n_sections,
       coalesce(refs.refs, '') AS refs
FROM src s
LEFT JOIN sec USING (doc_id) LEFT JOIN refs USING (doc_id)
"""


def read_pep_src(path: str):
    """Registry ``reader`` hook: (doc_id, text) parquet → Dataset."""
    import ray.data as rd

    return rd.read_parquet(path, columns=["doc_id", "text"])


_STATUSES = ("Final", "Accepted", "Draft", "Deferred")
_TYPES = ("Standards Track", "Informational", "Process")


def synthetic_pep(doc_id: int) -> str:
    """Deterministic PEP-convention plaintext for fixtures/queries."""
    num = 1000 + doc_id
    ref_a = 1000 + (doc_id * 3 + 1) % 60
    ref_b = 1000 + (doc_id * 7 + 2) % 60
    title = f"Synthetic proposal {num}"
    parts = [
        f"PEP: {num}",
        f"Title: {title}",
        "Author: A. Hacker <a.hacker@example.org>,",
        "        B. Builder <b.builder@example.org>",
        f"Status: {_STATUSES[doc_id % len(_STATUSES)]}",
        f"Type: {_TYPES[doc_id % len(_TYPES)]}",
        "Created: 01-Jan-2020",
        "",
        "Abstract",
        "========",
        "",
        f"This proposal refines the mechanism of PEP {ref_a} with a",
        "deterministic extension suitable for testing.",
        "",
        "Specification",
        "=============",
        "",
        f"The behaviour follows PEP {ref_b} except where noted; see",
        f"also PEP {ref_a} for the original rationale.",
        "",
        "References",
        "==========",
        "",
        "None beyond the cited proposals.",
        "",
    ]
    return "\n".join(parts)
