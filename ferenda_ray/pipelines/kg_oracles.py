"""DuckDB oracle SQL for the KG-product queries.

The KG pipeline runs over a *synthesized* pages corpus (the driver's
testdata has no pages table), so these oracles cannot be phrased over
the pre-registered views. Instead they read the pipeline's own
deterministic triples parquet (written once per corpus size by
``__ray_entry__._kg_triples_cached`` under ``/tmp/ferenda_ray_corpus``;
the extract→parse→link→canonicalize pipeline is bit-identical across
runs — chaos-resume tested) and recompute each DOWNSTREAM operator
independently in SQL. That makes them genuine operator-level oracles
for the facet pivot, graph aggregations, TOC/news selections and the
N-Triples serializer: same input table, independent engine, value-hash
compared — exactly like the relational-query oracles.

``kg_triples`` itself is the one self-consistency check: its oracle
reads the materialized cache while the query re-runs the LIVE
distributed pipeline, so a hash match evidences deterministic
distributed re-execution of the flagship path (the extraction
semantics themselves are covered by the frozen-spec golden tests and
``tools/pr_check.py``, which this oracle does not replace).

Scale note: the paths are fixed to the n_pages=300 corpus — the scale
the driver's correctness gate runs at (sf0.01). ``oracle_sql()``
returns static strings, so these oracles apply only at that scale;
``tools/check_correctness.py`` runs the same pairing locally.
"""

from __future__ import annotations

from ferenda_ray import schemas as S

TRIPLES_GLOB = "/tmp/ferenda_ray_corpus/triples_{n}{rev}/*.parquet"

# N-Triples literal escaping (materialize._nt_escape) in DuckDB: DuckDB
# single-quoted strings are literal (no backslash escapes), so '\' is one
# backslash and '\\' two.
_ESC = (
    "replace(replace(replace(replace(replace(obj,"
    " '\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n'),"
    " chr(13), '\\r'), chr(9), '\\t')"
)

_FACET_COLS = {
    "rdf_type": S.RDF_TYPE,
    "dct_title": S.DCT_TITLE,
    "dct_identifier": S.DCT_IDENTIFIER,
    "dct_issued": S.DCT_ISSUED,
    "dct_language": S.DCT_LANGUAGE,
}


def _facet_pivot(tri: str) -> str:
    """First-value facet pivot (facets.faceted_data semantics: min(obj)
    per (subj, pred) over the facet predicates, '' when absent)."""
    cols = ",\n       ".join(
        f"coalesce(min(obj) FILTER (pred = '{p}'), '') AS {name}"
        for name, p in _FACET_COLS.items())
    preds = ", ".join(f"'{p}'" for p in _FACET_COLS.values())
    return (f"SELECT subj AS uri,\n       {cols}\n"
            f"FROM {tri} WHERE pred IN ({preds}) GROUP BY subj")


def _pagerank_sql(tri: str, n_iter: int = 5, d: float = 0.85) -> str:
    """PageRank unrolled to ``n_iter`` CTE rounds — the same damping /
    dangling-mass / edge-multiplicity semantics as the BSP
    implementation (``ops/graph.py``: outdeg counts edge ROWS, nodes =
    all endpoints, rank_{k+1} = (1-d)/n + d·dangling/n + d·Σ r/deg).
    Float sums differ only in association order (measured max abs diff
    1.3e-17 on the gate corpus); the driver's 6-decimal value hash is
    far coarser."""
    edges = (f"SELECT split_part(subj, '#', 1) AS s, "
             f"split_part(obj, '#', 1) AS t FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}'")
    # AS MATERIALIZED: the CTE chain references each round's result
    # multiple times — without materialization DuckDB re-inlines the
    # whole prefix per reference and the plan grows exponentially
    M = "AS MATERIALIZED"
    parts = [
        f"edges {M} ({edges})",
        f"nodes {M} (SELECT DISTINCT u FROM (SELECT s AS u FROM edges "
        "UNION ALL SELECT t AS u FROM edges))",
        f"odeg {M} (SELECT s, count(*) AS deg FROM edges GROUP BY s)",
        f"st {M} (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        f"r0 {M} (SELECT u, 1.0 / st.n AS r FROM nodes, st)",
    ]
    for k in range(n_iter):
        parts.append(
            f"d{k} {M} (SELECT coalesce(sum(r{k}.r), 0) AS dang FROM r{k} "
            f"LEFT JOIN odeg ON odeg.s = r{k}.u WHERE odeg.s IS NULL)")
        parts.append(
            f"c{k} {M} (SELECT e.t AS u, sum(r{k}.r / odeg.deg) AS c "
            f"FROM edges e JOIN r{k} ON r{k}.u = e.s "
            f"JOIN odeg ON odeg.s = e.s GROUP BY e.t)")
        parts.append(
            f"r{k + 1} {M} (SELECT n.u, (1 - {d}) / st.n "
            f"+ {d} * d{k}.dang / st.n + {d} * coalesce(c{k}.c, 0) AS r "
            f"FROM nodes n CROSS JOIN st CROSS JOIN d{k} "
            f"LEFT JOIN c{k} ON c{k}.u = n.u)")
    return ("WITH " + ",\n".join(parts)
            + f'\nSELECT u AS url, r AS "rank" FROM r{n_iter}')


def _ppr_sql(tri: str, seed_host: str, n_iter: int = 5,
             d: float = 0.85) -> str:
    """Personalized PageRank unrolled to ``n_iter`` CTE rounds — the
    seed-teleport / seed-dangling semantics of
    ``graph.personalized_pagerank`` (rank0 = 1/|S| on the seed host's
    nodes, 0 elsewhere; the (1−d) reset AND the dangling mass return
    to the seeds). Float association-order caveat as in
    :func:`_pagerank_sql`."""
    edges = (f"SELECT split_part(subj, '#', 1) AS s, "
             f"split_part(obj, '#', 1) AS t FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}'")
    M = "AS MATERIALIZED"
    parts = [
        f"edges {M} ({edges})",
        f"nodes {M} (SELECT DISTINCT u FROM (SELECT s AS u FROM edges "
        "UNION ALL SELECT t AS u FROM edges))",
        f"odeg {M} (SELECT s, count(*) AS deg FROM edges GROUP BY s)",
        f"seeds {M} (SELECT u FROM nodes "
        f"WHERE split_part(u, '/', 3) = '{seed_host}')",
        f"ss {M} (SELECT CAST(count(*) AS DOUBLE) AS ns FROM seeds)",
        f"r0 {M} (SELECT n.u, CASE WHEN se.u IS NOT NULL "
        f"THEN 1.0 / ss.ns ELSE 0.0 END AS r "
        f"FROM nodes n CROSS JOIN ss LEFT JOIN seeds se ON se.u = n.u)",
    ]
    for k in range(n_iter):
        parts.append(
            f"d{k} {M} (SELECT coalesce(sum(r{k}.r), 0) AS dang FROM r{k} "
            f"LEFT JOIN odeg ON odeg.s = r{k}.u WHERE odeg.s IS NULL)")
        parts.append(
            f"c{k} {M} (SELECT e.t AS u, sum(r{k}.r / odeg.deg) AS c "
            f"FROM edges e JOIN r{k} ON r{k}.u = e.s "
            f"JOIN odeg ON odeg.s = e.s GROUP BY e.t)")
        parts.append(
            f"r{k + 1} {M} (SELECT n.u, "
            f"(CASE WHEN se.u IS NOT NULL THEN (1 - {d}) / ss.ns "
            f"+ {d} * d{k}.dang / ss.ns ELSE 0.0 END) "
            f"+ {d} * coalesce(c{k}.c, 0) AS r "
            f"FROM nodes n CROSS JOIN ss CROSS JOIN d{k} "
            f"LEFT JOIN seeds se ON se.u = n.u "
            f"LEFT JOIN c{k} ON c{k}.u = n.u)")
    return ("WITH " + ",\n".join(parts)
            + f'\nSELECT u AS url, r AS "rank" FROM r{n_iter}')


def _local_triangles_sql(tri: str) -> str:
    """Per-node triangle counts + local clustering coefficient: the
    id-ordered three-way join enumerates each triangle once as
    ``x < y < z``; each contributes to all three vertices. The
    coefficient is integer micro-units via ``//`` (floordiv), matching
    ``ops/graph.py:local_triangles`` bit-for-bit — no float anywhere."""
    edges = (f"SELECT DISTINCT least(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS a, "
             f"greatest(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS b FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}' "
             f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)")
    return (
        f"WITH e0 AS MATERIALIZED ({edges}), "
        f"deg AS (SELECT u AS url, CAST(count(*) AS BIGINT) AS degree "
        f"FROM (SELECT a AS u FROM e0 UNION ALL SELECT b AS u FROM e0) "
        f"GROUP BY u), "
        f"tri3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        f"FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b "
        f"JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b), "
        f"pern AS (SELECT u AS url, CAST(count(*) AS BIGINT) AS t "
        f"FROM (SELECT x AS u FROM tri3 UNION ALL SELECT y AS u "
        f"FROM tri3 UNION ALL SELECT z AS u FROM tri3) GROUP BY u) "
        f"SELECT deg.url AS url, deg.degree AS degree, "
        f"COALESCE(pern.t, 0) AS n_triangles, "
        f"CASE WHEN deg.degree >= 2 THEN (2000000 * COALESCE(pern.t, 0)) "
        f"// (deg.degree * (deg.degree - 1)) ELSE 0 END AS lcc_micro "
        f"FROM deg LEFT JOIN pern ON pern.url = deg.url")


def _kcore_sql(tri: str, k: int = 3, n_rounds: int = 8) -> str:
    """k-core peel unrolled to ``n_rounds`` CTE rounds — the exact
    synchronous (Jacobi) semantics of ``ops/graph.py:kcore``: round i
    keeps the half-edges whose BOTH endpoints had degree ≥ k among
    round i−1 survivors; the output is the final half-edge group count
    (so a node peeled to degree 0 in a non-converged final round is
    absent on both sides). Integer counts only — no float-order
    concern."""
    edges = (f"SELECT DISTINCT least(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS a, "
             f"greatest(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS b FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}' "
             f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)")
    M = "AS MATERIALIZED"
    parts = [
        f"e {M} ({edges})",
        f"h0 {M} (SELECT a AS u, b AS v FROM e "
        "UNION ALL SELECT b, a FROM e)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"a{i} {M} (SELECT u FROM h{i} GROUP BY u "
            f"HAVING count(*) >= {k})")
        parts.append(
            f"h{i + 1} {M} (SELECT u, v FROM h{i} "
            f"WHERE u IN (SELECT u FROM a{i}) "
            f"AND v IN (SELECT u FROM a{i}))")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT u AS url, count(*) AS core_deg "
            f"FROM h{n_rounds} GROUP BY u")


def _coreness_sql(tri: str, n_rounds: int = 12) -> str:
    """Distributed h-index coreness iteration unrolled to ``n_rounds``
    — the exact synchronous semantics of ``ops/graph.py:core_numbers``
    (Montresor et al. 2011): est₀ = degree; each round est(u) becomes
    the h-index of its neighbors' previous estimates, written in SQL
    as ``max(least(est_v, row_number ordered by est_v desc))`` per
    node. Integer estimates only."""
    edges = (f"SELECT DISTINCT least(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS a, "
             f"greatest(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS b FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}' "
             f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)")
    M = "AS MATERIALIZED"
    parts = [
        f"e {M} ({edges})",
        f"h0 {M} (SELECT a AS u, b AS v FROM e "
        "UNION ALL SELECT b, a FROM e)",
        f"est0 {M} (SELECT u, CAST(count(*) AS BIGINT) AS est "
        "FROM h0 GROUP BY u)",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"rk{r} {M} (SELECT h0.u AS u, s.est AS ev, "
            f"row_number() OVER (PARTITION BY h0.u "
            f"ORDER BY s.est DESC) AS rn "
            f"FROM h0 JOIN est{r - 1} s ON s.u = h0.v)")
        parts.append(
            f"est{r} {M} (SELECT u, CAST(max(least(ev, rn)) AS BIGINT) "
            f"AS est FROM rk{r} GROUP BY u)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT u AS url, est AS coreness FROM est{n_rounds}")


def _components_sql(tri: str) -> str:
    """Weakly-connected components recomputed as a recursive-CTE
    transitive closure (the ``dedup.DUP_CLUSTERS_SQL`` pattern on
    string urls): component = min(url) reachable. Fine at gate scale;
    the operator's label propagation is the 100 TB path."""
    edges = (f"SELECT DISTINCT least(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS a, "
             f"greatest(split_part(subj, '#', 1), "
             f"split_part(obj, '#', 1)) AS b FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}' "
             f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)")
    return f"""
WITH RECURSIVE e AS ({edges}),
sym AS (SELECT a AS src, b AS dst FROM e
        UNION SELECT b, a FROM e),
reach(node, peer) AS (
    SELECT src, src FROM sym
    UNION
    SELECT r.node, s.dst FROM reach r JOIN sym s ON s.src = r.peer
)
SELECT node AS url, min(peer) AS component FROM reach GROUP BY node
"""


def _bfs_hops_sql(tri: str, seed_host: str, bound: int = 64) -> str:
    """Directed BFS hop distance recomputed as a recursive-CTE walk
    (dist-bounded so cycles terminate; the operator raises before the
    bound can ever truncate — ``graph.bfs_hops`` max_rounds equals
    ``bound``). Fine at gate scale; the frontier-mail BSP is the
    100 TB path."""
    edges = (f"SELECT split_part(subj, '#', 1) AS s, "
             f"split_part(obj, '#', 1) AS t FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}'")
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges}),
nodes AS MATERIALIZED (SELECT DISTINCT u FROM
    (SELECT s AS u FROM e UNION ALL SELECT t AS u FROM e)),
walk(u, dist) AS (
    SELECT u, 0 FROM nodes WHERE split_part(u, '/', 3) = '{seed_host}'
    UNION
    SELECT e.t, w.dist + 1 FROM walk w JOIN e ON e.s = w.u
    WHERE w.dist < {bound}
)
SELECT u AS url, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY u
"""


def _seed_closeness_sql(tri: str, seed_host: str) -> str:
    """Harmonic closeness of the seed host: the BFS recursive-CTE walk
    rolled up to one exact-integer summary row (micro-units with
    floor division — ``graph.seed_closeness`` parity)."""
    return f"""
WITH b AS ({_bfs_hops_sql(tri, seed_host)})
SELECT
  CAST(coalesce(sum(CASE WHEN dist > 0 THEN 1000000 // dist
                    ELSE 0 END), 0) AS BIGINT) AS harmonic_micro,
  CAST(coalesce(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS n_reached,
  CAST(coalesce(max(dist), 0) AS BIGINT) AS max_dist
FROM b
"""


def _hits_sql(tri: str, n_iter: int = 5) -> str:
    """HITS unrolled to ``n_iter`` rounds of two half-steps — the BSP
    implementation's exact semantics (``ops/graph.py:hits``): hub⁰=1
    for every node, each half-step consumes the OTHER score divided by
    its L2 norm, final scores are the last raw vectors divided by their
    norms, absent nodes score 0. Measured max abs diff 1.7e-16."""
    edges = (f"SELECT split_part(subj, '#', 1) AS s, "
             f"split_part(obj, '#', 1) AS t FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}'")
    M = "AS MATERIALIZED"
    parts = [
        f"edges {M} ({edges})",
        f"nodes {M} (SELECT DISTINCT u FROM (SELECT s AS u FROM edges "
        "UNION ALL SELECT t AS u FROM edges))",
        # hub0 = 1 for every node -> raw auth0 = in-degree
        f"a0 {M} (SELECT t AS u, CAST(count(*) AS DOUBLE) AS v "
        "FROM edges GROUP BY t)",
        f"an0 {M} (SELECT sqrt(sum(v * v)) AS n FROM a0)",
    ]
    for i in range(n_iter):
        parts.append(
            f"h{i + 1} {M} (SELECT e.s AS u, sum(a{i}.v / an{i}.n) AS v "
            f"FROM edges e JOIN a{i} ON a{i}.u = e.t CROSS JOIN an{i} "
            f"GROUP BY e.s)")
        parts.append(
            f"hn{i + 1} {M} (SELECT sqrt(sum(v * v)) AS n FROM h{i + 1})")
        if i + 1 < n_iter:
            parts.append(
                f"a{i + 1} {M} (SELECT e.t AS u, "
                f"sum(h{i + 1}.v / hn{i + 1}.n) AS v "
                f"FROM edges e JOIN h{i + 1} ON h{i + 1}.u = e.s "
                f"CROSS JOIN hn{i + 1} GROUP BY e.t)")
            parts.append(
                f"an{i + 1} {M} (SELECT sqrt(sum(v * v)) AS n "
                f"FROM a{i + 1})")
    la, lh = n_iter - 1, n_iter
    return ("WITH " + ",\n".join(parts) + f"""
SELECT n.u AS url,
       coalesce(a{la}.v, 0) / an{la}.n AS authority,
       coalesce(h{lh}.v, 0) / hn{lh}.n AS hub
FROM nodes n
LEFT JOIN a{la} ON a{la}.u = n.u
LEFT JOIN h{lh} ON h{lh}.u = n.u
CROSS JOIN an{la} CROSS JOIN hn{lh}""")


SECTIONS_GLOB = "/tmp/ferenda_ray_corpus/sections_{n}{rev}/*.parquet"


def _esc_xml(expr: str) -> str:
    """xml.sax.saxutils.escape (&, <, > — in that order) in SQL."""
    return ("replace(replace(replace(" + expr +
            ", '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")


def _atom_feeds_sql(pivot: str, archive_size: int = 50) -> str:
    """``render.atom_feeds_ds`` recomputed in SQL: entries ranked per
    feed by (updated DESC, uri ASC), paginated into ``archive_size``
    pages, each page's Atom XML reassembled line-for-line
    (``render.atom_feed`` joins its line list with newline; the header
    <updated> is the page's first entry)."""
    n = "chr(10)"
    entry = ("'<entry>' || " + n + " || '<id>' || " + _esc_xml("uri")
             + " || '</id>' || " + n + " || '<title>' || "
             + _esc_xml("title") + " || '</title>' || " + n
             + " || '<updated>' || " + _esc_xml("updated")
             + " || '</updated>' || " + n
             + " || '<link href=\"' || uri || '\"/>' || " + n
             + " || '</entry>'")
    return f"""
WITH pv AS MATERIALIZED ({pivot}),
ent AS MATERIALIZED (
    SELECT dct_language AS feedval, uri, dct_issued AS updated,
           dct_title AS title,
           row_number() OVER (PARTITION BY dct_language
                              ORDER BY dct_issued DESC, uri ASC) - 1 AS rn
    FROM pv
)
SELECT 'feed:' || feedval AS feed,
       CAST(rn // {archive_size} AS BIGINT) AS page,
       count(*) AS n_entries,
       '<?xml version="1.0" encoding="utf-8"?>' || {n} ||
       '<feed xmlns="http://www.w3.org/2005/Atom">' || {n} ||
       '<id>' || {_esc_xml("'feed:' || feedval")} ||
       '?page=' || (rn // {archive_size}) || '</id>' || {n} ||
       '<title>' || {_esc_xml("'Feed ' || feedval")} || '</title>' || {n} ||
       '<updated>' || {_esc_xml("arg_min(updated, rn)")} ||
       '</updated>' || {n} ||
       string_agg({entry}, {n} ORDER BY rn) || {n} || '</feed>' AS xml
FROM ent GROUP BY feedval, rn // {archive_size}"""


def _meta_triples_sql(pages: str) -> str:
    """Doc-level metadata triples recomputed in SQL DIRECTLY from the
    raw pages parquet — the one oracle that does NOT read any pipeline
    product, so the flagship's extraction *semantics* (not just its
    determinism) are driver-visible (VERDICT r2 §wrong-6).

    Mirrors ``stages/triples.py:doc_triples`` doc-level emission
    (reference ``documentrepository.py:1209-1250``
    ``parse_metadata_from_soup``): rdf:type, dct:identifier (url
    basename), prov:wasGeneratedBy, dct:title (lang-tagged, regexed
    out of <title>), dct:language (<html lang=..>), dct:issued
    (warc_ts date, xsd:date) — over the latest snapshot per url
    (snapshots in the synthetic corpus have strictly increasing
    warc_ts, so plain max() selects the same row as the pipeline's
    sha1-tie-break dedup). Synthetic titles contain no XML-escapable
    characters, so no unescape step is needed here."""
    t = "TRUE AS obj_is_uri"
    f = "FALSE AS obj_is_uri"
    return f"""
WITH latest AS (
    SELECT url, max(warc_ts) AS ts
    FROM read_parquet('{pages}') GROUP BY url
),
docs AS MATERIALIZED (
    SELECT p.url,
           regexp_extract(decode(p.html), '<title>([^<]*)</title>', 1)
               AS title,
           regexp_extract(decode(p.html), '<html lang="([a-z]*)">', 1)
               AS doclang,
           strftime(p.warc_ts, '%Y-%m-%d') AS issued
    FROM read_parquet('{pages}') p
    JOIN latest l ON p.url = l.url AND p.warc_ts = l.ts
)
SELECT url AS subj, '{S.RDF_TYPE}' AS pred, '{S.BIBO_DOCUMENT}' AS obj,
       {t}, '' AS lang, '' AS datatype, url FROM docs
UNION ALL
SELECT url, '{S.DCT_IDENTIFIER}', regexp_extract(url, '[^/]*$'),
       {f}, '', '', url FROM docs
UNION ALL
SELECT url, '{S.PROV_WASGENERATEDBY}', '{S.ENGINE_URI}',
       {t}, '', '', url FROM docs
UNION ALL
SELECT url, '{S.DCT_TITLE}', title, {f}, doclang, '', url
FROM docs WHERE title <> ''
UNION ALL
SELECT url, '{S.DCT_LANGUAGE}', doclang, {f}, '', '', url
FROM docs WHERE doclang <> ''
UNION ALL
SELECT url, '{S.DCT_ISSUED}', issued, {f}, '', '{S.XSD_DATE}', url
FROM docs"""


META_PREDICATES = (S.RDF_TYPE, S.DCT_IDENTIFIER, S.PROV_WASGENERATEDBY,
                   S.DCT_TITLE, S.DCT_LANGUAGE, S.DCT_ISSUED)

# EU-citation surface forms (stages/link.py _EU_CITE, RE2-safe).
# The \b word boundaries MIRROR the Python grammar — without them the
# oracle would match acts embedded in words ('Directive 2000/31/ECx')
# that the pipeline rejects.
_EU_ART_PAT = (r"\bArticle \d+(?:\(\d+\))? of "
               r"(?:Directive \d{4}/\d+/(?:EC|EEC|EU)"
               r"|Regulation \((?:EC|EEC|EU)\) No \d+/\d{2,4})\b")
_EU_DIR_PAT = r"\bDirective \d{4}/\d+/(?:EC|EEC|EU)\b"
_EU_REG_PAT = r"\bRegulation \((?:EC|EEC|EU)\) No \d+/\d{2,4}\b"


def _eulaw_refs_sql(pages: str) -> str:
    """Per-target citation counts of the EU-legislation grammar pack
    recomputed in SQL DIRECTLY from the raw pages parquet (the
    ``_meta_triples_sql`` pattern: semantics, not self-consistency) —
    latest snapshot per url, grammar priority emulated by extracting
    article-of-act matches first and DELETING their spans before the
    bare-act scan (the single-alternation consume rule of
    ``stages/link.py``), URIs rebuilt with the same int normalization
    as ``format_eulaw_uri``."""
    from ferenda_ray.stages.link import EULAW_NS as _EULAW_NS

    dir_uri = (f"'{_EULAW_NS}dir/' || "
               "CAST(regexp_extract(m, 'Directive (\\d{4})/', 1) "
               "AS BIGINT) || '/' || "
               "CAST(regexp_extract(m, 'Directive \\d{4}/(\\d+)/', 1) "
               "AS BIGINT)")
    reg_uri = (f"'{_EULAW_NS}reg/' || "
               "CAST(regexp_extract(m, 'No \\d+/(\\d+)', 1) "
               "AS BIGINT) || '/' || "
               "CAST(regexp_extract(m, 'No (\\d+)/', 1) AS BIGINT)")
    return f"""
WITH latest AS (
    SELECT url, max(warc_ts) AS ts
    FROM read_parquet('{pages}') GROUP BY url
), txt AS MATERIALIZED (
    SELECT decode(p.html) AS h
    FROM read_parquet('{pages}') p
    JOIN latest l ON p.url = l.url AND p.warc_ts = l.ts
), m_all AS (
    SELECT unnest(regexp_extract_all(h, '{_EU_ART_PAT}')) AS m FROM txt
    UNION ALL
    SELECT unnest(regexp_extract_all(
        regexp_replace(h, '{_EU_ART_PAT}', '', 'g'), '{_EU_DIR_PAT}'))
    FROM txt
    UNION ALL
    SELECT unnest(regexp_extract_all(
        regexp_replace(h, '{_EU_ART_PAT}', '', 'g'), '{_EU_REG_PAT}'))
    FROM txt
), uris AS (
    SELECT (CASE WHEN m LIKE '%Directive%' THEN {dir_uri}
                 ELSE {reg_uri} END)
           || (CASE WHEN regexp_extract(m, 'Article (\\d+)', 1) <> ''
                THEN '#A' || CAST(regexp_extract(m, 'Article (\\d+)', 1)
                                  AS BIGINT)
                     || (CASE WHEN regexp_extract(
                                 m, 'Article \\d+\\((\\d+)\\)', 1) <> ''
                          THEN '.' || CAST(regexp_extract(
                                  m, 'Article \\d+\\((\\d+)\\)', 1)
                                  AS BIGINT)
                          ELSE '' END)
                ELSE '' END) AS obj
    FROM m_all
)
SELECT obj, CAST(count(*) AS BIGINT) AS n_refs
FROM uris GROUP BY obj"""


def kg_oracle_sql(n_pages: int = 300, src_rev: str = "") -> dict[str, str]:
    """``src_rev``: the entry module's source-content digest — cache
    paths rotate with the code so these oracles can never read a stale
    parquet from an earlier build."""
    rev = f"_{src_rev}" if src_rev else ""
    tri = f"read_parquet('{TRIPLES_GLOB.format(n=n_pages, rev=rev)}')"
    sec = f"read_parquet('{SECTIONS_GLOB.format(n=n_pages, rev=rev)}')"
    edges = (f"SELECT split_part(subj, '#', 1) AS src, "
             f"split_part(obj, '#', 1) AS dst FROM {tri} "
             f"WHERE pred = '{S.DCT_REFERENCES}'")
    pivot = _facet_pivot(tri)
    return {
        "kg_triples": (
            f"SELECT subj, pred, obj, obj_is_uri, lang, datatype, url "
            f"FROM {tri}"),
        "kg_meta_triples": _meta_triples_sql(
            f"/tmp/ferenda_ray_corpus/pages_{n_pages}{rev}.parquet"),
        "kg_eulaw_refs": _eulaw_refs_sql(
            f"/tmp/ferenda_ray_corpus/pages_{n_pages}{rev}.parquet"),
        "kg_pagerank": _pagerank_sql(tri),
        "kg_ppr": _ppr_sql(tri, "www.site000.example.org"),
        "kg_bfs_hops": _bfs_hops_sql(tri, "www.site000.example.org"),
        "kg_seed_closeness": _seed_closeness_sql(
            tri, "www.site000.example.org"),
        "kg_hits": _hits_sql(tri),
        "kg_kcore": _kcore_sql(tri),
        "kg_local_triangles": _local_triangles_sql(tri),
        "kg_host_graph": (
            f"SELECT split_part(src, '/', 3) AS src_host, "
            f"split_part(dst, '/', 3) AS dst_host, "
            f"count(*) AS n_links FROM ({edges}) "
            f"GROUP BY src_host, dst_host"),
        "kg_coreness": _coreness_sql(tri),
        "kg_components": _components_sql(tri),
        "kg_cocitations": (
            f"WITH e AS (SELECT DISTINCT split_part(subj, '#', 1) AS s, "
            f"split_part(obj, '#', 1) AS t FROM {tri} "
            f"WHERE pred = '{S.DCT_REFERENCES}' "
            f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)) "
            f"SELECT x.t AS a, y.t AS b, count(*) AS n_cocited "
            f"FROM e x JOIN e y ON x.s = y.s AND x.t < y.t "
            f"GROUP BY x.t, y.t HAVING count(*) >= 2"),
        "kg_coupling": (
            f"WITH e AS (SELECT DISTINCT split_part(subj, '#', 1) AS s, "
            f"split_part(obj, '#', 1) AS t FROM {tri} "
            f"WHERE pred = '{S.DCT_REFERENCES}' "
            f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)) "
            f"SELECT x.s AS a, y.s AS b, count(*) AS n_coupled "
            f"FROM e x JOIN e y ON x.t = y.t AND x.s < y.s "
            f"GROUP BY x.s, y.s HAVING count(*) >= 2"),
        "kg_adamic_adar": (
            # per-TERM integer micro-weights (floor(1e6/ln(outdeg)))
            # so the pair scores sum exactly in any order — the same
            # float-determinism rule as the int-cent money oracles
            f"WITH e AS (SELECT DISTINCT split_part(subj, '#', 1) AS s, "
            f"split_part(obj, '#', 1) AS t FROM {tri} "
            f"WHERE pred = '{S.DCT_REFERENCES}' "
            f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)), "
            f"w AS (SELECT s, CAST(FLOOR(1000000.0 / LN(count(*))) "
            f"AS BIGINT) AS wt FROM e GROUP BY s HAVING count(*) >= 2) "
            f"SELECT x.t AS a, y.t AS b, count(*) AS n_common, "
            f"CAST(sum(w.wt) AS BIGINT) AS aa_micro "
            f"FROM e x JOIN e y ON x.s = y.s AND x.t < y.t "
            f"JOIN w ON w.s = x.s "
            f"GROUP BY x.t, y.t HAVING count(*) >= 2"),
        "kg_link_prediction": (
            # common-neighbours / Jaccard / preferential-attachment
            # over in-neighbourhoods; jaccard is integer-micro
            # floordiv AFTER the exact integer sums (the int-cent
            # determinism rule), so both sides hash identically
            f"WITH e AS (SELECT DISTINCT split_part(subj, '#', 1) AS s, "
            f"split_part(obj, '#', 1) AS t FROM {tri} "
            f"WHERE pred = '{S.DCT_REFERENCES}' "
            f"AND split_part(subj, '#', 1) <> split_part(obj, '#', 1)), "
            f"d AS (SELECT t, CAST(count(*) AS BIGINT) AS deg "
            f"FROM e GROUP BY t), "
            f"p AS (SELECT x.t AS a, y.t AS b, "
            f"CAST(count(*) AS BIGINT) AS n_common "
            f"FROM e x JOIN e y ON x.s = y.s AND x.t < y.t "
            f"GROUP BY x.t, y.t HAVING count(*) >= 2) "
            f"SELECT p.a, p.b, p.n_common, "
            f"da.deg AS deg_a, db.deg AS deg_b, "
            f"CAST((1000000 * p.n_common) "
            f"// (da.deg + db.deg - p.n_common) AS BIGINT) "
            f"AS jaccard_micro, "
            f"CAST(da.deg * db.deg AS BIGINT) AS pref_attach "
            f"FROM p JOIN d da ON da.t = p.a JOIN d db ON db.t = p.b"),
        "kg_assortativity": (
            # Newman degree assortativity as exact int64 sums + one
            # trunc-toward-zero micro floordiv (DuckDB // semantics,
            # matched by graph._tz_div on the Ray side)
            f"WITH e0 AS (SELECT DISTINCT least(src, dst) AS a, "
            f"greatest(src, dst) AS b FROM ({edges}) WHERE src <> dst), "
            f"deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM "
            f"(SELECT a AS u FROM e0 UNION ALL SELECT b AS u FROM e0) "
            f"GROUP BY u), "
            f"ed AS (SELECT da.deg AS dx, db.deg AS dy FROM e0 "
            f"JOIN deg da ON da.u = e0.a JOIN deg db ON db.u = e0.b), "
            f"s AS (SELECT CAST(count(*) AS BIGINT) AS m, "
            f"CAST(sum(dx + dy) AS BIGINT) AS s1, "
            f"CAST(sum(dx*dx + dy*dy) AS BIGINT) AS s2, "
            f"CAST(sum(2*dx*dy) AS BIGINT) AS sp FROM ed) "
            f"SELECT m AS n_edges, s1 AS sum_deg, s2 AS sum_sq, "
            f"sp AS sum_prod, "
            f"CAST((1000000 * (2*m*sp - s1*s1)) "
            f"// NULLIF(2*m*s2 - s1*s1, 0) AS BIGINT) AS r_micro "
            f"FROM s"),
        "kg_sections": (
            # self-consistency (like kg_triples): live extract+FSM
            # rerun vs the materialized deterministic sections cache
            f"SELECT url, fragment, about, title, ordinal, text "
            f"FROM {sec}"),
        "kg_fulltext_search": (
            # operator-level: the substring filter + projection + sort
            # recomputed in SQL over the same sections table
            f"SELECT url, fragment, title FROM {sec} "
            f"WHERE text LIKE '%RFC%'"),
        "kg_entries_stats": (
            f"SELECT stage, count(*) AS n_docs, "
            f"CAST(sum(CAST(ok AS BIGINT)) AS BIGINT) AS n_ok "
            f"FROM read_parquet("
            f"'/tmp/ferenda_ray_corpus/entries_{n_pages}{rev}/*.parquet') "
            f"GROUP BY stage"),
        "kg_composite_stats": (
            f"SELECT parser_used, count(*) AS n_docs "
            f"FROM read_parquet("
            f"'/tmp/ferenda_ray_corpus/composite_{n_pages}{rev}/*.parquet') "
            f"GROUP BY parser_used"),
        "kg_triple_counts": (
            f"SELECT url, count(*) AS n_triples FROM {tri} GROUP BY url"),
        "kg_stats": (
            f"SELECT pred, obj, count(DISTINCT subj) AS n_subjects "
            f"FROM {tri} "
            f"WHERE pred IN ('{S.RDF_TYPE}', '{S.DCT_LANGUAGE}') "
            f"GROUP BY pred, obj"),
        "kg_facets": pivot,
        "kg_incoming_refs": (
            f"SELECT dst, count(*) AS n_incoming, "
            f"string_agg(src, ';' ORDER BY src) AS citing "
            f"FROM (SELECT DISTINCT src, dst FROM ({edges})) "
            f"GROUP BY dst"),
        "kg_skeleton": (
            f"WITH refs AS (SELECT dst AS uri FROM ({edges})), "
            f"defs AS (SELECT DISTINCT split_part(subj, '#', 1) AS uri "
            f"FROM {tri}) "
            f"SELECT uri, count(*) AS n_refs FROM refs "
            f"WHERE uri NOT IN (SELECT uri FROM defs) GROUP BY uri"),
        "kg_triangle_count": (
            f"WITH u AS (SELECT DISTINCT least(src, dst) AS a, "
            f"greatest(src, dst) AS b FROM ({edges}) WHERE src <> dst) "
            f"SELECT count(*) AS n_triangles "
            f"FROM u e1 JOIN u e2 ON e1.b = e2.a "
            f"JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b"),
        "kg_degree_histogram": (
            f"WITH ind AS (SELECT dst, count(*) AS in_degree "
            f"FROM ({edges}) GROUP BY dst) "
            f"SELECT in_degree, count(*) AS n_nodes "
            f"FROM ind GROUP BY in_degree"),
        "kg_toc_pagesets": (
            f"SELECT CASE WHEN dct_title = '' THEN '' "
            f"ELSE lower(substr(dct_title, 1, 1)) END AS sel, "
            f"count(*) AS n_docs FROM ({pivot}) GROUP BY 1"),
        "kg_atom_feeds": _atom_feeds_sql(pivot),
        "kg_generate": (
            # self-consistency (the kg_triples pattern): live
            # docs+annotations render vs the materialized deterministic
            # generate cache
            f"SELECT url, html FROM read_parquet("
            f"'/tmp/ferenda_ray_corpus/generate_{n_pages}{rev}/*.parquet')"),
        "kg_news_feeds": (
            f"SELECT dct_language, uri, dct_issued, pos FROM ("
            f"SELECT dct_language, uri, dct_issued, "
            f"row_number() OVER (PARTITION BY dct_language "
            f"ORDER BY dct_issued DESC, uri ASC) - 1 AS pos "
            f"FROM ({pivot})) WHERE pos < 5"),
        "kg_nt_dump": (
            f"SELECT '<' || subj || '> <' || pred || '> ' || "
            f"CASE WHEN obj_is_uri THEN '<' || obj || '>' "
            f"WHEN datatype <> '' THEN "
            f"'\"' || {_ESC} || '\"^^<' || datatype || '>' "
            f"WHEN lang <> '' THEN '\"' || {_ESC} || '\"@' || lang "
            f"ELSE '\"' || {_ESC} || '\"' END || ' .' AS line "
            f"FROM {tri}"),
    }
