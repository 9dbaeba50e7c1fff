"""CompositeRepository semantics (reference §2.10,
``ferenda/compositerepository.py:51-303``): try a preference-ordered
chain of parsers per document until one succeeds, record which one won.

The reference copies the winning subrepo's outputs up and unions
basefile listings across subrepos; here the whole cascade runs inside
ONE ``map_batches`` pass per row (try/except chain), and the winner is
a ``parser_used`` lineage column — no duplicated work, no file copies.

Also the per-doc patch hook (reference M14 ``patch_if_needed``,
``documentrepository.py:1284-1333``): a broadcast dict of unified diffs
keyed by url, applied to the extracted text before parsing, with the
patch description carried as lineage.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ferenda_ray.stages.structure import parse_blocks, serialize_tree


class ParseFailed(Exception):
    pass


def strict_parse(blocks: list[dict]) -> dict:
    """Primary parser: the FSM rule pack, REQUIRING structure (≥1
    numbered section) — the 'specialist subrepo' of the cascade."""
    tree = parse_blocks(blocks)
    if not any(ch.get("kind") == "Section" for ch in tree.get("children", [])):
        raise ParseFailed("no numbered sections")
    return tree


def plain_parse(blocks: list[dict]) -> dict:
    """Fallback parser: flat Body of paragraphs (never fails) — the
    'generic subrepo' at the end of the preference order."""
    children = [
        {"kind": "Paragraph", "text": b.get("text", "")}
        for b in blocks
        if b.get("text")
    ]
    return {"kind": "Body", "children": children}


DEFAULT_CHAIN = (("strict", strict_parse), ("plain", plain_parse))


def composite_parse_batch(batch: pa.Table, chain=DEFAULT_CHAIN) -> pa.Table:
    """docs batch (with ``blocks``) → + ``tree`` + ``parser_used``.

    Per row: first parser in the chain that does not raise wins
    (reference preference order ``compositerepository.py:183-228``);
    a row where every parser fails gets parser_used='' and an empty
    tree (poison-pill rows never fail the batch)."""
    trees, used = [], []
    for bj in batch.column("blocks").to_pylist():
        blocks = json.loads(bj)
        tree, winner = None, ""
        for name, fn in chain:
            try:
                tree = fn(blocks)
                winner = name
                break
            except Exception:
                continue
        if tree is None:
            tree = {"kind": "Body", "children": []}
        trees.append(serialize_tree(tree))
        used.append(winner)
    out = batch.drop_columns(["blocks"])
    out = out.append_column("tree", pa.array(trees, pa.large_string()))
    return out.append_column("parser_used", pa.array(used, pa.string()))


# -- per-doc patches (M14) ------------------------------------------------

def apply_unified_patch(text: str, patch: str) -> str:
    """Minimal unified-diff applier (stdlib only): supports one or more
    @@ -l,n +l,n @@ hunks over the text's lines. Raises ValueError on a
    context mismatch (reference behavior: a failing patch is an error,
    ``documentrepository.py:1311-1325``)."""
    lines = text.splitlines()
    out: list[str] = []
    pos = 0  # 0-based index into `lines`
    plines = patch.splitlines()
    i = 0
    while i < len(plines):
        line = plines[i]
        if line.startswith("@@"):
            try:
                old_start = int(line.split()[1].lstrip("-").split(",")[0])
            except (IndexError, ValueError) as e:
                raise ValueError(f"bad hunk header: {line}") from e
            hunk_pos = old_start - 1
            if hunk_pos < pos:
                raise ValueError("overlapping hunks")
            out.extend(lines[pos:hunk_pos])
            pos = hunk_pos
            i += 1
            while i < len(plines) and not plines[i].startswith("@@"):
                pl = plines[i]
                if pl.startswith(" "):
                    if pos >= len(lines) or lines[pos] != pl[1:]:
                        raise ValueError(f"context mismatch at line {pos + 1}")
                    out.append(lines[pos])
                    pos += 1
                elif pl.startswith("-"):
                    if pos >= len(lines) or lines[pos] != pl[1:]:
                        raise ValueError(f"delete mismatch at line {pos + 1}")
                    pos += 1
                elif pl.startswith("+"):
                    out.append(pl[1:])
                elif pl.startswith("\\"):
                    pass  # "\ No newline at end of file"
                else:
                    break
                i += 1
        else:
            i += 1
    out.extend(lines[pos:])
    return "\n".join(out)


def patch_batch(batch: pa.Table, patches_ref=None) -> pa.Table:
    """docs batch → text column patched where the broadcast patch dict
    (url → unified diff) has an entry; ``patched`` lineage column says
    what happened ('' none, 'ok', 'failed: <why>')."""
    from ferenda_ray.state import fetch

    patches: dict[str, str] = fetch(patches_ref) if patches_ref is not None else {}
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    status = []
    out_texts = []
    for u, t in zip(urls, texts):
        p = patches.get(u)
        if p is None:
            out_texts.append(t)
            status.append("")
            continue
        try:
            out_texts.append(apply_unified_patch(t, p))
            status.append("ok")
        except ValueError as e:
            out_texts.append(t)
            status.append(f"failed: {e}")
    out = batch.drop_columns(["text"])
    out = out.append_column("text", pa.array(out_texts, pa.large_string()))
    return out.append_column("patched", pa.array(status, pa.string()))
