"""Rendering tail stages — the reference's ``generate`` / ``toc`` /
``news`` HTML+Atom output surface rebuilt as stateless batch maps:

* :func:`generate_batch` — parsed element tree → browser HTML (reference
  M17/S14: XSLT transform, ``documentrepository.py:2358-2453`` +
  ``transformer.py:25-372``). No XSLT engine ships in this environment
  (no lxml/libxslt — stdlib only), so the transform is a deterministic
  pure-Python renderer with the same shape: compiled "template" state
  built once per worker, per-doc tree walk, annotations merged in.
  User templates are matched by an XSLT-pattern subset
  (:class:`_TemplateSet`: ``Kind``, ``Parent/Kind``,
  ``Kind[field=value]``, ``*`` with XSLT priority/document-order
  rules), so generate/TOC styling is template-rule-driven — the same
  extension model as the reference's per-repo XSLT, minus the hosted
  engine.
* :func:`transformlinks_batch` — rewrite every href in generated HTML
  through a broadcast url-transform map (reference M16
  ``documentrepository.py:2673-2717``: canonical→local forms).
* :func:`atom_feed` — entries → paginated Atom XML per feed (reference
  S13 ``news_write_atom`` ``documentrepository.py:3445-3580``),
  rendered per group in ``map_groups``.
"""

from __future__ import annotations

import json
import os
import re
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
import pyarrow as pa


# -- generate (tree → html) ----------------------------------------------

def _render_inline(elem: dict) -> str:
    """Text span → HTML, emitting <a rel="dct:references"> anchors for
    in-tree LinkSubject citation parts (reference
    ``citationparser.py:120-145`` node insertion + RDFa rendering)."""
    parts = elem.get("parts")
    if not parts:
        return escape(elem.get("text", ""))
    out = []
    for p in parts:
        if p.get("kind") == "LinkSubject":
            out.append(f'<a href={quoteattr(p["uri"])} '
                       f'rel="dct:references">{escape(p["text"])}</a>')
        else:
            out.append(escape(p.get("text", "")))
    return "".join(out)


class _Ctx(dict):
    def __missing__(self, key):  # unknown placeholder renders empty
        return ""


# -- XPath-1.0 string functions in value templates ---------------------------
#
# The reference's stylesheets lean on a small set of XPath string
# functions (counted across res/xsl/*.xsl: substring-after ×32,
# substring ×13, concat ×11, substring-before ×7, string-length ×7,
# normalize-space ×4, translate ×1 — reference ``transformer.py:25-372``
# hands them to libxslt). Value templates support exactly that set,
# nested arbitrarily: ``{substring-after(identifier, '-')}``,
# ``{concat(url, '#', fragment)|attr}``. Arguments are field names,
# 'single-quoted' literals or integers; results render XSLT-style as
# escaped text (``|attr`` → quoted attribute value, ``|raw`` →
# unescaped). Unknown fields resolve to "" like plain placeholders.

_FN_TOKEN = re.compile(
    r"\s*(?:(?P<lit>'[^']*')|(?P<num>-?\d+)"
    r"|(?P<name>[A-Za-z_][\w-]*)|(?P<punc>[(),]))")

_XPATH_FNS = {"concat", "substring", "substring-after",
              "substring-before", "string-length", "normalize-space",
              "translate"}


def _parse_fn_expr(src: str):
    """Recursive-descent parse of one function expression into a
    nested tuple AST: ('fn', name, [args]) / ('lit', s) / ('num', n) /
    ('field', name). Raises ValueError on malformed input (template
    authoring error — fail loudly at compile, not per element)."""
    toks = []
    pos = 0
    while pos < len(src):
        m = _FN_TOKEN.match(src, pos)
        if not m:
            raise ValueError(f"bad template expression: {src!r}")
        toks.append(m)
        pos = m.end()

    idx = 0

    def peek_punc(p):
        return (idx < len(toks) and toks[idx].group("punc") == p)

    def expr():
        nonlocal idx
        if idx >= len(toks):
            raise ValueError(f"truncated template expression: {src!r}")
        t = toks[idx]
        idx += 1
        if t.group("lit") is not None:
            return ("lit", t.group("lit")[1:-1])
        if t.group("num") is not None:
            return ("num", int(t.group("num")))
        if t.group("name") is not None:
            name = t.group("name")
            if peek_punc("("):
                if name not in _XPATH_FNS:
                    raise ValueError(
                        f"unknown template function {name!r} in {src!r}")
                idx += 1
                args = []
                if not peek_punc(")"):
                    args.append(expr())
                    while peek_punc(","):
                        idx += 1
                        args.append(expr())
                if not peek_punc(")"):
                    raise ValueError(f"expected ')' in {src!r}")
                idx += 1
                return ("fn", name, args)
            return ("field", name)
        raise ValueError(f"bad token in template expression: {src!r}")

    ast = expr()
    if idx != len(toks):
        raise ValueError(f"trailing junk in template expression: {src!r}")
    return ast


def _eval_fn_expr(ast, elem: dict, url: str) -> str:
    kind = ast[0]
    if kind == "lit":
        return ast[1]
    if kind == "num":
        return str(ast[1])
    if kind == "field":
        if ast[1] == "url":
            return url
        v = elem.get(ast[1], "")
        return str(v) if isinstance(v, (str, int, float)) else ""
    name, args = ast[1], [_eval_fn_expr(a, elem, url) for a in ast[2]]
    if name == "concat":
        return "".join(args)
    if name == "substring-after":
        _, sep, rest = args[0].partition(args[1])
        return rest if sep else ""
    if name == "substring-before":
        head, sep, _ = args[0].partition(args[1])
        return head if sep else ""
    if name == "substring":
        s = args[0]
        start = int(args[1]) - 1  # XPath positions are 1-based
        end = start + int(args[2]) if len(args) > 2 else len(s)
        return s[max(start, 0):max(end, 0)]
    if name == "string-length":
        return str(len(args[0]))
    if name == "normalize-space":
        return " ".join(args[0].split())
    # translate(s, from, to): map from[i]→to[i], delete the overhang
    table = {ord(f): (args[2][i] if i < len(args[2]) else None)
             for i, f in enumerate(args[1])}
    return args[0].translate(table)


_FN_PLACEHOLDER = re.compile(r"\{([a-z-]+\([^{}]*\))(\|attr|\|raw)?\}")

_FN_TPL_CACHE: dict[str, tuple] = {}


def _compile_fn_template(tpl: str):
    """Rewrite ``{func(...)}`` placeholders to synthetic context keys,
    returning (rewritten template, [(key, ast, mode), ...]); cached by
    template content (templates are tiny user strings)."""
    got = _FN_TPL_CACHE.get(tpl)
    if got is not None:
        return got
    slots = []

    def sub(m):
        key = f"_fn{len(slots)}"
        slots.append((key, _parse_fn_expr(m.group(1)),
                      (m.group(2) or "|esc")[1:]))
        return "{%s}" % key

    rewritten = _FN_PLACEHOLDER.sub(sub, tpl)
    _FN_TPL_CACHE[tpl] = (rewritten, slots)
    return rewritten, slots


def _apply_template(tpl: str, elem: dict, url: str, children: str,
                    inline: str) -> str:
    """Render one element through a user template string — the
    transformer extension point (reference ``transformer.py:25-372``
    applies per-repo XSLT with params; here a per-kind format template
    with the same substitution surface: element fields, ``*_esc``
    escaped variants, ``children``/``inline`` pre-rendered HTML,
    ``url``)."""
    tpl, fn_slots = _compile_fn_template(tpl)
    ctx = _Ctx()
    for k, v in elem.items():
        if isinstance(v, (str, int, float)):
            ctx[k] = v
            ctx[f"{k}_esc"] = escape(str(v))
            # attribute value template: quoted + attr-escaped variant,
            # safe to interpolate as  href={field_attr}  (the XSLT AVT
            # slot of the reference's generic.xsl)
            ctx[f"{k}_attr"] = quoteattr(str(v))
    for key, ast, mode in fn_slots:
        val = _eval_fn_expr(ast, elem, url)
        ctx[key] = (escape(val) if mode == "esc"
                    else quoteattr(val) if mode == "attr" else val)
    ctx["children"] = children
    ctx["inline"] = inline
    ctx["url"] = url
    ctx["url_attr"] = quoteattr(url)
    return tpl.format_map(ctx)


class _TemplateSet:
    """Compiled template rules — the XSLT processing model
    (match pattern → body, most-specific rule wins, apply-templates
    recursion) as a pure-Python interpreter (reference
    ``transformer.py:25-372`` drives libxslt; same extension surface).

    Pattern grammar (a practical XSLT-pattern subset):

    * ``*`` — any element (priority 0, like the XSLT built-in rules)
    * ``Kind`` — match by element kind
    * ``Ancestor//Kind`` — kind with an ANY-ancestor test (the
      ``descendant`` axis of the reference's generic.xsl patterns)
    * ``Parent/Kind`` — kind with immediate-parent test (more specific
      than ``//``)
    * ``Kind[field]`` / ``Kind[field=value]`` — attribute-presence /
      attribute-value predicate (most specific; combines with either
      parent step)
    * ``Parent[field=value]/Kind`` / ``Anc[field=value]//Kind`` —
      predicate on the ANCESTOR step (matched against that ancestor's
      own fields)
    * ``Kind[1]`` / ``Kind[position()=n]`` / ``Kind[last()]`` —
      positional predicate (XSLT semantics: the element's 1-based
      position among its parent's children OF THE SAME KIND); also
      allowed on the immediate-parent step (``Parent[1]/Kind``).
      Positions need sibling context, so they apply to the child step
      and the ``/`` parent step, not to the ``//`` ancestor step.

    Specificity order: field/positional predicate > ancestor-step
    predicate > immediate parent > descendant ancestor > kind > ``*``
    (numeric priorities 4/3/2/1/1/0, summed per component). The
    highest-priority matching rule renders the element; ties break
    toward the later-defined rule (document order, as in XSLT). A
    plain ``Kind`` key behaves exactly as the pre-round-3 per-kind
    template dict, so existing templates are unaffected.
    """

    _POS = r"\d+|position\(\)=\d+|last\(\)"
    _PAT = re.compile(
        r"^(?:(?P<parent>\*|\w+)"
        r"(?:\[(?:(?P<ppos>" + _POS + r")"
        r"|(?P<pfield>\w+)(?:=(?P<pvalue>[^\]]*))?)\])?"
        r"(?P<sep>//|/))?(?P<kind>\*|\w+)"
        r"(?:\[(?:(?P<pos>" + _POS + r")"
        r"|(?P<field>\w+)(?:=(?P<value>[^\]]*))?)\])?$")

    @staticmethod
    def _parse_pos(spec):
        if spec is None:
            return None
        if spec == "last()":
            return "last"
        return int(spec.split("=")[-1])

    def __init__(self, templates: dict):
        self.rules = []
        for i, (pat, tpl) in enumerate(templates.items()):
            m = self._PAT.match(pat)
            if not m:
                raise ValueError(f"bad template pattern: {pat!r}")
            parent, ppos, pfield, pvalue, sep, kind, pos, field, value \
                = m.group("parent", "ppos", "pfield", "pvalue", "sep",
                          "kind", "pos", "field", "value")
            if ppos and sep == "//":
                raise ValueError(
                    f"positional predicate needs sibling context — not "
                    f"available on the // ancestor step: {pat!r}")
            prio = ((1 if kind != "*" else 0)
                    + (2 if parent and sep == "/" else 1 if parent else 0)
                    + (3 if pfield or ppos else 0)
                    + (4 if field or pos else 0))
            self.rules.append((prio, i, parent, self._parse_pos(ppos),
                               pfield, pvalue, sep, kind,
                               self._parse_pos(pos), field, value, tpl))
        # highest priority first, later definition wins ties
        self.rules.sort(key=lambda r: (-r[0], -r[1]))

    @staticmethod
    def _step_ok(anc: dict, name: str, pfield, pvalue) -> bool:
        if name != "*" and anc.get("kind") != name:
            return False
        if pfield is not None:
            if pfield not in anc:
                return False
            if pvalue is not None and str(anc[pfield]) != pvalue:
                return False
        return True

    @staticmethod
    def _pos_ok(elem: dict, parent: dict | None, spec) -> bool:
        """1-based position of ``elem`` among its parent's children of
        the same kind (XSLT ``Kind[n]`` match semantics); a root
        element counts as position 1 (and last)."""
        if parent is None:
            sibs = [elem]
        else:
            sibs = [c for c in parent.get("children", [])
                    if c.get("kind") == elem.get("kind")]
        idx = next((i for i, c in enumerate(sibs) if c is elem), None)
        if idx is None:
            return False
        return (idx == len(sibs) - 1 if spec == "last"
                else idx + 1 == spec)

    def lookup(self, elem: dict, ancestors: tuple) -> str | None:
        """``ancestors``: tuple of ancestor ELEMENT dicts, root first
        (the immediate parent last)."""
        kind = elem["kind"]
        for (_p, _i, parent, ppos, pfield, pvalue, sep, k, pos, field,
             value, tpl) in self.rules:
            if k != "*" and k != kind:
                continue
            if parent and not (parent == "*" and pfield is None
                               and ppos is None):
                if sep == "/":
                    if not (ancestors and self._step_ok(
                            ancestors[-1], parent, pfield, pvalue)):
                        continue
                    if ppos is not None and not self._pos_ok(
                            ancestors[-1],
                            ancestors[-2] if len(ancestors) > 1 else None,
                            ppos):
                        continue
                else:  # "//": any ancestor
                    if not any(self._step_ok(a, parent, pfield, pvalue)
                               for a in ancestors):
                        continue
            if pos is not None and not self._pos_ok(
                    elem, ancestors[-1] if ancestors else None, pos):
                continue
            if field is not None:
                if field not in elem:
                    continue
                if value is not None and str(elem[field]) != value:
                    continue
            return tpl
        return None


_TPL_CACHE: dict[tuple, _TemplateSet] = {}


def _template_set(templates: dict) -> _TemplateSet:
    key = tuple(templates.items())  # small str→str dict; content-keyed
    ts = _TPL_CACHE.get(key)
    if ts is None:
        ts = _TPL_CACHE[key] = _TemplateSet(templates)
    return ts


def _render_elem(elem: dict, out: list[str], url: str,
                 templates: dict | None = None,
                 ancestors: tuple = ()) -> None:
    kind = elem["kind"]
    if templates:
        tpl = _template_set(templates).lookup(elem, ancestors)
        if tpl is not None:
            kids: list[str] = []
            for ch in elem.get("children", []):
                _render_elem(ch, kids, url, templates,
                             ancestors + (elem,))
            out.append(_apply_template(tpl, elem, url,
                                       "\n".join(kids),
                                       _render_inline(elem)))
            return
    if kind == "Body":
        for ch in elem.get("children", []):
            _render_elem(ch, out, url, templates, ancestors + (elem,))
    elif kind == "Section":
        frag = f"S{elem['ordinal']}"
        out.append(f'<section id={quoteattr(frag)} about='
                   f'{quoteattr(url + "#" + frag)}>')
        out.append(f"<h2>{escape(elem['ordinal'])}. {escape(elem['title'])}</h2>")
        for ch in elem.get("children", []):
            _render_elem(ch, out, url, templates, ancestors + (elem,))
        out.append("</section>")
    elif kind == "Heading":
        lvl = int(elem.get("level", 2))
        out.append(f"<h{lvl}>{escape(elem['text'])}</h{lvl}>")
    elif kind == "Paragraph":
        out.append(f"<p>{_render_inline(elem)}</p>")
    elif kind == "Preformatted":
        out.append(f"<pre>{escape(elem['text'])}</pre>")
    elif kind == "Table":
        out.append("<table>")
        for row in elem.get("children", []):
            cells = "".join(
                f"<{'th' if c.get('header') else 'td'}>{_render_inline(c)}"
                f"</{'th' if c.get('header') else 'td'}>"
                for c in row.get("children", []))
            out.append(f"<tr>{cells}</tr>")
        out.append("</table>")
    elif kind in ("UnorderedList", "OrderedList"):
        tag = "ol" if kind == "OrderedList" else "ul"
        out.append(f"<{tag}>")
        for ch in elem.get("children", []):
            # ListItems are template-addressable (e.g. Section//ListItem)
            # even though the default path renders them inline
            if templates:
                tpl = _template_set(templates).lookup(
                    ch, ancestors + (elem,))
                if tpl is not None:
                    kids: list[str] = []
                    for sub in ch.get("children", []):
                        _render_elem(sub, kids, url, templates,
                                     ancestors + (elem, ch))
                    out.append(_apply_template(tpl, ch, url,
                                               "\n".join(kids),
                                               _render_inline(ch)))
                    continue
            # a ListItem may host nested sublists (children)
            li = [f"<li>{_render_inline(ch)}"]
            for sub in ch.get("children", []):
                sub_out: list[str] = []
                _render_elem(sub, sub_out, url, templates,
                             ancestors + (elem, ch))
                li.extend(sub_out)
            li.append("</li>")
            out.append("".join(li) if len(li) == 2 else "\n".join(li))
        out.append(f"</{tag}>")


def generate_html(url: str, title: str, tree: dict,
                  annotations: list[str] | None = None,
                  templates: dict | None = None) -> str:
    """One parsed doc (+ optional incoming-reference annotations) →
    self-contained HTML page (deterministic). ``templates``: optional
    per-kind format-template overrides (the user-extension point the
    reference serves with per-repo XSLT; see :func:`_apply_template`)."""
    out = [
        "<!DOCTYPE html>",
        f"<html><head><title>{escape(title)}</title></head>",
        f"<body about={quoteattr(url)}>",
        f"<h1>{escape(title)}</h1>",
    ]
    _render_elem(tree, out, url, templates)
    if annotations:
        out.append('<aside class="annotations"><h2>Referenced by</h2><ul>')
        for a in annotations:
            out.append(f"<li><a href={quoteattr(a)}>{escape(a)}</a></li>")
        out.append("</ul></aside>")
    out.append("</body></html>")
    return "\n".join(out)


def generate_batch(batch: pa.Table, annotations_ref=None,
                   templates_ref=None) -> pa.Table:
    """docs batch (url, title, tree) → (url, html). ``annotations_ref``:
    broadcast dict url → list of citing urls (the J2 annotation join);
    ``templates_ref``: broadcast per-kind template overrides — both
    resolved once per worker."""
    from ferenda_ray.state import fetch

    ann = fetch(annotations_ref) if annotations_ref is not None else {}
    templates = (fetch(templates_ref) if templates_ref is not None
                 else None)
    urls = batch.column("url").to_pylist()
    htmls = [
        generate_html(u, t, json.loads(tj), ann.get(u), templates)
        for u, t, tj in zip(urls, batch.column("title").to_pylist(),
                            batch.column("tree").to_pylist())
    ]
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.large_string())})


def generate_join(docs_ds, refs_ds, num_buckets: int = 32,
                  templates_ref=None):
    """Scale-path ``generate`` (J2 annotations join): docs and incoming
    references co-partitioned by ``hash(url)`` and rendered per bucket
    — no driver-side refs dict, no broadcast (the default
    ``generate_batch`` broadcast is right while the annotation table
    fits the object store; at 10^12 urls it does not). Same output as
    the broadcast path (bit-equality tested).

    One narrow shuffle: refs rows are (url, citing) strings; the wide
    ``tree`` JSON rides the docs side of the same exchange once.
    """
    import pandas as pd

    from ferenda_ray.state import fetch
    from ferenda_ray.util import bucket_keys

    def tag_docs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "url": b.column("url"),
            "title": b.column("title"),
            "tree": b.column("tree"),
            "citing": pa.array([""] * n, pa.string()),
            "side": pa.array([0] * n, pa.int8()),
            "bucket": pa.array(bucket_keys(b.column("url"), num_buckets),
                               pa.int32()),
        })

    def tag_refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "url": b.column("dst"),
            "title": pa.array([""] * n, pa.string()),
            "tree": pa.array([""] * n, pa.large_string()),
            "citing": b.column("citing").cast(pa.string()),
            "side": pa.array([1] * n, pa.int8()),
            "bucket": pa.array(bucket_keys(b.column("dst"), num_buckets),
                               pa.int32()),
        })

    templates = templates_ref  # resolved inside the group task

    def render(g: pd.DataFrame) -> pd.DataFrame:
        tpl = fetch(templates) if templates is not None else None
        ann = {r.url: r.citing.split(";")
               for r in g[g["side"] == 1].itertuples() if r.citing}
        docs = g[g["side"] == 0].sort_values("url", kind="mergesort")
        htmls = [generate_html(r.url, r.title, json.loads(r.tree),
                               ann.get(r.url), tpl)
                 for r in docs.itertuples()]
        return pd.DataFrame({"url": docs["url"].to_numpy(),
                             "html": pd.Series(htmls, dtype="object")})

    return (docs_ds.map_batches(tag_docs, batch_format="pyarrow")
            .union(refs_ds.map_batches(tag_refs, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(render, batch_format="pandas"))


# Above this many annotation rows the refs side stops being broadcast
# and the bucketed co-partition join takes over (overridable for tests
# and for clusters with bigger object stores).
ANNOTATION_BROADCAST_LIMIT = int(os.environ.get(
    "FERENDA_RAY_ANNOTATION_BROADCAST_LIMIT", "2000000"))


def generate_with_annotations(docs_ds, refs_ds, templates_ref=None,
                              broadcast_limit: int | None = None,
                              batch_size: int = 64):
    """``generate`` with automatic broadcast-vs-join selection (the
    scale path is the DEFAULT above a size threshold, not an opt-in):
    the incoming-refs table is materialized (it is consumed either way),
    counted, and either shipped once via ``ray.put`` as a url→citing
    dict (small: one object-store hop, no shuffle of the docs side) or
    co-partitioned with the docs by ``hash(url)`` via
    :func:`generate_join` (big: the dict would outgrow the driver and
    every worker heap). Both paths render bit-identical HTML
    (``tests/test_generate_join.py``)."""
    import functools

    import ray

    limit = (ANNOTATION_BROADCAST_LIMIT if broadcast_limit is None
             else broadcast_limit)
    refs = refs_ds.materialize()
    if refs.count() > limit:
        return generate_join(docs_ds, refs, templates_ref=templates_ref)
    ann = {r.dst: r.citing.split(";")
           for r in refs.to_pandas().itertuples() if r.citing}
    ann_ref = ray.put(ann)
    return docs_ds.map_batches(
        functools.partial(generate_batch, annotations_ref=ann_ref,
                          templates_ref=templates_ref),
        batch_format="pyarrow", batch_size=batch_size)


# -- transformlinks -------------------------------------------------------

_HREF = re.compile(r'(href|src|about)=(["\'])(.*?)\2')


def transformlinks_html(html: str, transform) -> str:
    """Rewrite every href/src/about attribute through ``transform(url)``
    (reference ``transformlinks`` walks the parsed tree; a compiled
    regex over the serialized form is equivalent for our generated
    pages and stays vectorizable)."""

    def sub(m):
        return f"{m.group(1)}={m.group(2)}{transform(m.group(3))}{m.group(2)}"

    return _HREF.sub(sub, html)


def transformlinks_batch(batch: pa.Table, mapping_ref=None,
                         prefix_from: str = "", prefix_to: str = "") -> pa.Table:
    """(url, html) batch → html with urls rewritten: exact matches from
    the broadcast mapping first, then prefix rewrite (the reference's
    url-transform fn factory, ``documentrepository.py:2455-2556``)."""
    from ferenda_ray.state import fetch

    mapping = fetch(mapping_ref) if mapping_ref is not None else {}

    def transform(u: str) -> str:
        if u in mapping:
            return mapping[u]
        base, frag = (u.split("#", 1) + [""])[:2]
        if base in mapping:
            return mapping[base] + ("#" + frag if frag else "")
        if prefix_from and u.startswith(prefix_from):
            return prefix_to + u[len(prefix_from):]
        return u

    htmls = [transformlinks_html(h, transform)
             for h in batch.column("html").to_pylist()]
    return pa.table({"url": batch.column("url"),
                     "html": pa.array(htmls, pa.large_string())})


# -- atom feeds -----------------------------------------------------------

def atom_feed(entries: pd.DataFrame, feed_id: str, title: str,
              archive_size: int = 100) -> list[dict]:
    """Entries (uri, updated[, title]) → paginated Atom XML documents,
    newest first, ``archive_size`` per page (page 0 = current feed)."""
    e = entries.sort_values(["updated", "uri"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    pages = []
    for start in range(0, max(len(e), 1), archive_size):
        chunk = e.iloc[start:start + archive_size]
        page_no = start // archive_size
        xml = [
            '<?xml version="1.0" encoding="utf-8"?>',
            '<feed xmlns="http://www.w3.org/2005/Atom">',
            f"<id>{escape(feed_id)}?page={page_no}</id>",
            f"<title>{escape(title)}</title>",
        ]
        if len(chunk):
            xml.append(f"<updated>{escape(str(chunk['updated'].iloc[0]))}"
                       "</updated>")
        for _, row in chunk.iterrows():
            xml.append("<entry>")
            xml.append(f"<id>{escape(row['uri'])}</id>")
            xml.append(f"<title>{escape(str(row.get('title', row['uri'])))}"
                       "</title>")
            xml.append(f"<updated>{escape(str(row['updated']))}</updated>")
            xml.append(f"<link href={quoteattr(row['uri'])}/>")
            xml.append("</entry>")
        xml.append("</feed>")
        pages.append({"feed": feed_id, "page": page_no,
                      "n_entries": len(chunk), "xml": "\n".join(xml)})
    return pages


def atom_feeds_ds(facets_ds, feed_col: str = "dct_language",
                  date_col: str = "dct_issued", archive_size: int = 100):
    """Facet rows → one Atom page row per (feed value, archive page)."""

    def render(g: pd.DataFrame) -> pd.DataFrame:
        feed_val = str(g[feed_col].iloc[0])
        entries = pd.DataFrame({"uri": g["uri"],
                                "updated": g[date_col],
                                "title": g.get("dct_title", g["uri"])})
        return pd.DataFrame(atom_feed(entries, feed_id=f"feed:{feed_val}",
                                      title=f"Feed {feed_val}",
                                      archive_size=archive_size))

    return facets_ds.groupby(feed_col).map_groups(render,
                                                  batch_format="pandas")
