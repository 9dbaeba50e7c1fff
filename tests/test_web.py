"""Host-level web-corpus analytics (ops/web.py)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ferenda_ray.ops.web import host_of, host_stats, host_stats_sql


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].sort_values("host")
            .reset_index(drop=True))


def test_host_of_matches_split_part():
    urls = ["https://www.a.org/doc/1.html",
            "https://www.a.org/doc/1.html#frag",
            "http://b.example/x",
            "nohost", "", "https://", "a/b/c/d"]
    got = host_of(pa.array(urls, pa.string())).to_pylist()
    want = [duckdb.sql(
        "SELECT split_part(?, '/', 3)", params=[u]).fetchone()[0]
        for u in urls]
    assert got == want


def test_host_stats_vs_duckdb(ray_session, tmp_path):
    rows = []
    for h in range(7):
        for i in range(h + 2):
            url = f"https://site{h}.example.org/doc/{i}.html"
            for snap in range((i % 3) + 1):  # multi-snapshot urls
                rows.append({"url": url,
                             "text": f"pägé {h}/{i} snap {snap}" * (i + 1)})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path)

    got = _canon(host_stats(path, num_buckets=4).to_pandas())
    want = _canon(duckdb.sql(host_stats_sql(path)).df())
    want = want.astype({c: "int64" for c in
                        ("n_snapshots", "n_urls", "sum_text_chars")})
    pd.testing.assert_frame_equal(got, want)


def test_host_graph_vs_bruteforce(ray_session):
    """Host-level graph coarsening equals a brute-force pair count,
    including multi-batch partial merging."""
    import numpy as np
    import ray.data as rd

    from ferenda_ray.ops.graph import host_graph

    rng = np.random.default_rng(7)
    edges = [(f"https://h{int(a)}.org/p/{int(i)}",
              f"https://h{int(b)}.org/p/{int(j)}")
             for a, b, i, j in zip(rng.integers(0, 5, 300),
                                   rng.integers(0, 5, 300),
                                   rng.integers(0, 40, 300),
                                   rng.integers(0, 40, 300))]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])).repartition(7)

    brute = {}
    for s, d in edges:
        k = (s.split("/")[2], d.split("/")[2])
        brute[k] = brute.get(k, 0) + 1
    got = host_graph(ds, num_buckets=4).to_pandas()
    got_map = dict(zip(zip(got.src_host, got.dst_host), got.n_links))
    assert got_map == brute


def test_canon_urls_hand_cases():
    from ferenda_ray.ops.web import canon_urls

    got = canon_urls(pa.array([
        "HTTPS://WWW.Ex.COM:443/a/index.html?utm_source=x&z=1&a=2#f",
        "http://site.org:80/", "http://site.org",
        "https://h.net/p/?fbclid=abc",
        "https://h.net/p?b=2&a=1&a=0",
    ], pa.string())).to_pylist()
    assert got == [
        "https://www.ex.com/a?a=2&z=1",
        "http://site.org/", "http://site.org/",
        "https://h.net/p",
        "https://h.net/p?a=0&a=1&b=2",
    ]


def test_canon_urls_fuzz_vs_duckdb():
    """Differential fuzz: the polars canonicalization chain and the
    DuckDB SQL expression are the same function over adversarial URL
    shapes (case, ports, fragments, tracking params, duplicate and
    empty params, index.html, missing scheme, multiple '?')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ferenda_ray.ops.web import canon_url_sql_expr, canon_urls

    seg = st.text(
        alphabet="aBc0._-~%", min_size=0, max_size=6)
    param = st.one_of(
        st.just(""), st.just("utm_x=1"), st.just("fbclid"),
        st.just("ref=tw"), st.just("gclid=z"),
        st.tuples(seg, seg).map(lambda kv: f"{kv[0]}={kv[1]}"))
    url = st.builds(
        lambda scheme, host, port, path, idx, slash, params, frag:
        (scheme + host + port + "/" + "/".join(path)
         + ("/index.html" if idx else "/" if slash else "")
         + ("?" + "&".join(params) if params is not None else "")
         + ("#" + frag if frag else "")),
        st.sampled_from(["https://", "HTTP://", "ftp://", ""]),
        st.sampled_from(["Ex.COM", "a.b.ORG", "h", ""]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(seg, max_size=3),
        st.booleans(), st.booleans(),
        st.one_of(st.none(), st.lists(param, max_size=4)),
        st.sampled_from(["", "sec2", "?x=1"]))

    @settings(max_examples=150, deadline=None)
    @given(st.lists(url, min_size=1, max_size=8))
    def check(urls):
        got = canon_urls(pa.array(urls, pa.string())).to_pylist()
        con = duckdb.connect()
        con.execute("CREATE TABLE t (url VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)",
                        [(u,) for u in urls])
        want = [r[0] for r in con.sql(
            f"SELECT {canon_url_sql_expr('url')} FROM t").fetchall()]
        assert got == want

    check()


def test_c4_line_rules_hand_cases(ray_session, tmp_path):
    """Engineered line shapes: trailing blanks before the terminal
    mark, the 5-word floor, the javascript line drop, quote-terminated
    lines, lorem-ipsum and brace page drops, and the empty page."""
    import datetime

    from ferenda_ray.ops.web import c4_line_rules, c4_line_rules_sql

    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    texts = {
        "a": ("This is a good long sentence. And another one here.\n"
              "Too short.\n"
              "Five words ending in period.   \n"
              "this menu uses JavaScript everywhere sadly.\n"
              "no terminal punctuation on this line"),
        "b": ("Lorem Ipsum filler text goes right here.\n"
              "A perfectly fine second sentence follows. Third one too."),
        "c": "Only one good sentence lives here.",
        "d": 'He said "this quoted line has enough words."\n'
             "Another full sentence sits here! Did a question fit here?",
        "e": "",
        "f": "Config follows with a { brace token inside it. "
             "More sentences here. And here.",
    }
    rows = [{"url": f"https://h.org/{k}", "warc_ts": ts, "text": v}
            for k, v in texts.items()]
    path = str(tmp_path / "pages.parquet")
    tab = pa.Table.from_pydict({
        "url": [r["url"] for r in rows],
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("us")),
        "text": [r["text"] for r in rows]})
    pq.write_table(tab, path)

    got = (c4_line_rules(path).to_pandas()
           .sort_values("url").reset_index(drop=True))
    by = dict(zip(got.url, got.itertuples()))
    a = by["https://h.org/a"]
    assert (a.n_lines, a.n_kept_lines, a.n_sentences) == (5, 2, 3)
    assert bool(a.keep) is True
    b = by["https://h.org/b"]
    assert not b.rule_lorem and bool(b.keep) is False
    c = by["https://h.org/c"]
    assert c.n_sentences == 1 and not c.rule_sentences
    d = by["https://h.org/d"]
    assert d.n_kept_lines == 2 and d.n_sentences == 3 and bool(d.keep)
    e = by["https://h.org/e"]
    assert (e.n_lines, e.n_kept_lines) == (1, 0) and not e.rule_line
    f = by["https://h.org/f"]
    assert not f.rule_brace and bool(f.keep) is False

    want = (duckdb.sql(c4_line_rules_sql(path)).df()
            .sort_values("url").reset_index(drop=True))
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c_: "int64" for c_ in ("ts_s", "n_lines", "n_kept_lines",
                                "n_sentences")})
    pd.testing.assert_frame_equal(got, want)


def test_c4_line_rules_fuzz_vs_duckdb(ray_session, tmp_path):
    """Differential fuzz over adversarial line soup: the polars batch
    map and the DuckDB recompute are the same function."""
    import datetime
    import random

    from ferenda_ray.ops.web import c4_line_rules, c4_line_rules_sql

    rng = random.Random(99)
    # includes Unicode whitespace (NBSP, thin space) and \x0b: Rust
    # regex \S is Unicode-aware while RE2's is ASCII, so the word-count
    # predicate uses an explicit class — these chars pin that parity
    frag = ["word", "JavaScript", "lorem", "ipsum", "lorem ipsum", "{",
            ".", "!", "?", '"', "...", "two words", "\t", "  ", "…",
            " ", " ", "\x0b", "a b"]
    texts = []
    for _ in range(60):
        lines = []
        for _ in range(rng.randint(0, 6)):
            lines.append(" ".join(rng.choice(frag)
                                  for _ in range(rng.randint(0, 9)))
                         + rng.choice(["", " ", "\t", ".", '."', "!  "]))
        texts.append("\n".join(lines))
    ts0 = datetime.datetime(2024, 1, 1)
    tab = pa.Table.from_pydict({
        "url": [f"https://z.org/{i}" for i in range(len(texts))],
        "warc_ts": pa.array(
            [ts0 + datetime.timedelta(seconds=i) for i in
             range(len(texts))], pa.timestamp("us")),
        "text": texts})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    got = (c4_line_rules(path).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (duckdb.sql(c4_line_rules_sql(path)).df()
            .sort_values("url").reset_index(drop=True))
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c_: "int64" for c_ in ("ts_s", "n_lines", "n_kept_lines",
                                "n_sentences")})
    pd.testing.assert_frame_equal(got, want)


def test_host_crawl_stats_vs_duckdb(ray_session, tmp_path):
    """Recrawl stats: per-url snapshot chains straddling batches must
    re-sum before the ≥2 recrawl test and the max."""
    from ferenda_ray.ops.web import host_crawl_stats, host_crawl_stats_sql

    rows = []
    for h in range(5):
        for i in range(h + 1):
            url = f"https://s{h}.org/p{i}"
            rows += [{"url": url}] * ((i % 4) + 1)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path)

    got = (host_crawl_stats(path, num_buckets=4).to_pandas()
           .sort_values("host").reset_index(drop=True))
    by = dict(zip(got.host, got.itertuples()))
    assert by["s0.org"].n_recrawled == 0 and by["s0.org"].max_snapshots == 1
    assert by["s4.org"].n_urls == 5 and by["s4.org"].max_snapshots == 4

    want = (duckdb.sql(host_crawl_stats_sql(path)).df()
            .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            {c_: "int64" for c_ in ("n_urls", "n_snapshots",
                                    "n_recrawled", "max_snapshots")}))


def test_canonical_latest_vs_duckdb(ray_session, tmp_path):
    """Latest-per-canonical: variant folding + (ts desc, url asc)
    winner, including an exact-ts tie between two raw variants."""
    import datetime

    from ferenda_ray.ops.web import canonical_latest, canonical_latest_sql

    t0 = datetime.datetime(2024, 1, 1)

    def ts(k):
        return t0 + datetime.timedelta(hours=k)

    rows = [
        # one canonical group, three variants, newest wins
        ("https://A.org/x/index.html", ts(1)),
        ("https://a.org/x/", ts(5)),
        ("https://a.org/x?utm_source=z", ts(3)),
        # tie on ts: url ascending wins
        ("https://b.org/y?b=1&a=1", ts(2)),
        ("https://b.org/y?a=1&b=1", ts(2)),
        # plain singleton
        ("https://c.org/z", ts(9)),
    ]
    tab = pa.Table.from_pydict({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    got = (canonical_latest(path, num_buckets=4).to_pandas()
           .sort_values("norm_url").reset_index(drop=True))
    by = dict(zip(got.norm_url, got.itertuples()))
    assert by["https://a.org/x"].url == "https://a.org/x/"
    assert by["https://b.org/y?a=1&b=1"].url == "https://b.org/y?a=1&b=1"
    assert len(got) == 3

    want = (duckdb.sql(canonical_latest_sql(path)).df()
            .sort_values("norm_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype({"ts_s": "int64"}))


def test_host_quality_rollup(ray_session, tmp_path):
    """Host rollup of the C4 keep bits: exact integer permille (floor
    division), mixed keep/drop hosts, all-drop host."""
    import datetime

    from ferenda_ray.ops.web import host_quality, host_quality_sql

    good = ("A proper first sentence sits here. A second one follows "
            "naturally. And a third one closes it out.")
    bad = "no terminal punctuation and { a brace"
    rows = []
    # host g: 3 good; host m: 2 good + 1 bad (666 permille); host z: all bad
    for i in range(3):
        rows.append(("https://g.org/p%d" % i, good))
    rows += [("https://m.org/p0", good), ("https://m.org/p1", good),
             ("https://m.org/p2", bad)]
    rows += [("https://z.org/p%d" % i, bad) for i in range(2)]
    ts = datetime.datetime(2024, 1, 1)
    tab = pa.Table.from_pydict({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([ts] * len(rows), pa.timestamp("us")),
        "text": [r[1] for r in rows]})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    got = (host_quality(path, num_buckets=4).to_pandas()
           .sort_values("host").reset_index(drop=True))
    by = dict(zip(got.host, got.itertuples()))
    assert by["g.org"].kept_permille == 1000
    assert (by["m.org"].n_kept, by["m.org"].kept_permille) == (2, 666)
    assert (by["z.org"].n_kept, by["z.org"].kept_permille) == (0, 0)

    want = (duckdb.sql(host_quality_sql(path)).df()
            .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            {c_: "int64" for c_ in ("n_snapshots", "n_kept",
                                    "kept_permille")}))


def test_gated_pages_both_paths(ray_session, tmp_path):
    """Blocklist semi-join: broadcast path == bucketed-cogroup path ==
    DuckDB recompute; the failing host's snapshots all drop."""
    import datetime

    from ferenda_ray.ops.web import gated_pages, gated_pages_sql

    good = ("A proper first sentence sits here. A second one follows "
            "naturally. And a third one closes it out.")
    bad = "no terminal punctuation and { a brace"
    ts = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(4):
        rows.append((f"https://ok.org/p{i}", good))
    rows += [("https://mixed.org/p0", good),
             ("https://mixed.org/p1", bad)]          # 500 < 900
    rows += [(f"https://junk.org/p{i}", bad) for i in range(3)]
    tab = pa.Table.from_pydict({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([ts] * len(rows), pa.timestamp("us")),
        "text": [r[1] for r in rows]})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    def canon(df):
        return (df[sorted(df.columns)]
                .sort_values(["host", "url"]).reset_index(drop=True))

    bcast = canon(gated_pages(path, num_buckets=4).to_pandas())
    joined = canon(gated_pages(path, num_buckets=4,
                               broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(bcast, joined)
    assert set(bcast.host) == {"ok.org"} and len(bcast) == 4

    want = canon(duckdb.sql(gated_pages_sql(path)).df()
                 .astype({"ts_s": "int64"}))
    pd.testing.assert_frame_equal(bcast, want)


def test_curated_crawl_vs_duckdb(ray_session, tmp_path):
    """The three-stage composition equals the SQL recompute on a
    corpus exercising every drop reason: stale snapshot loses to a
    newer variant, C4-failing page on a good host, and a whole bad
    host."""
    import datetime

    from ferenda_ray.ops.web import curated_crawl, curated_crawl_sql

    good = ("A proper first sentence sits here. A second one follows "
            "naturally. And a third one closes it out.")
    bad = "no terminal punctuation and { a brace"
    t0 = datetime.datetime(2024, 5, 1)

    def ts(k):
        return t0 + datetime.timedelta(hours=k)

    rows = [
        # ok.org: canonical group of two variants — only the newest
        # survives stage 1; one separate C4-failing page drops
        ("https://ok.org/a/index.html", ts(1), good),
        ("https://ok.org/a/", ts(2), good),
        ("https://ok.org/b", ts(1), bad),
        ("https://ok.org/c", ts(1), good),
        # junk.org: all pages fail C4 → host gate also fails
        ("https://junk.org/p0", ts(1), bad),
        ("https://junk.org/p1", ts(1), bad),
        # mixed.org: one good page but host keep rate 1/3 < 900
        ("https://mixed.org/p0", ts(1), good),
        ("https://mixed.org/p1", ts(1), bad),
        ("https://mixed.org/p2", ts(1), bad),
    ]
    tab = pa.Table.from_pydict({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": [r[2] for r in rows]})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    # at the default 900-permille gate every host here fails (ok.org
    # is 3/4 = 750): both engines must return the empty set (ray 2.49
    # drops column schema on 0-row to_pandas, so compare counts)
    got = curated_crawl(path, num_buckets=4).to_pandas()
    want = duckdb.sql(curated_crawl_sql(path)).df()
    assert len(got) == 0 and len(want) == 0

    # with the default 900-permille gate every host here fails except
    # none (ok.org is 3/4=750) — rerun at 600 to see survivors
    got6 = (curated_crawl(path, min_permille=600, num_buckets=4)
            .to_pandas()
            .sort_values(["norm_url", "url"]).reset_index(drop=True))
    want6 = (duckdb.sql(curated_crawl_sql(path, min_permille=600)).df()
             .sort_values(["norm_url", "url"]).reset_index(drop=True)
             .astype({"ts_s": "int64"}))
    pd.testing.assert_frame_equal(
        got6[sorted(got6.columns)], want6[sorted(want6.columns)])
    assert set(got6.url) == {"https://ok.org/a/", "https://ok.org/c"}
    assert "https://ok.org/a" in set(got6.norm_url)


def test_curated_crawl_fuzz_vs_duckdb(ray_session, tmp_path):
    """Randomized corpus fuzz for the full composition: random
    variant-colliding urls × random good/bad texts × random snapshot
    times (including exact ties) must match the SQL recompute at two
    gate thresholds."""
    import datetime
    import random

    from ferenda_ray.ops.web import curated_crawl, curated_crawl_sql

    rng = random.Random(77)
    good = ("One proper sentence lives right here. Another proper one "
            "follows it closely. A third sentence then ends things.")
    bad = "fragment without any terminal { punctuation"
    t0 = datetime.datetime(2024, 6, 1)
    rows = []
    for i in range(160):
        h = rng.randint(0, 7)
        doc = rng.randint(0, 12)
        variant = rng.choice([
            "", "/", "/index.html", "?utm_source=x", "#frag",
            "?b=2&a=1", "?a=1&b=2"])
        url = f"https://s{h}.org/d{doc}{variant}"
        ts = t0 + datetime.timedelta(seconds=rng.randint(0, 5) * 60)
        text = good if rng.random() < 0.7 else bad
        rows.append((url, ts, text))
        if rng.random() < 0.1:
            # exact duplicate crawl record (same url AND ts): the
            # oracle's keep-side join must dedup like the operator
            rows.append((url, ts, text))
    tab = pa.Table.from_pydict({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": [r[2] for r in rows]})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tab, path)

    for mp in (500, 800):
        got = curated_crawl(path, min_permille=mp,
                            num_buckets=4).to_pandas()
        want = (duckdb.sql(curated_crawl_sql(path, min_permille=mp))
                .df())
        assert len(got) == len(want), mp
        if len(got):
            got = (got[sorted(got.columns)]
                   .sort_values(["norm_url", "url"])
                   .reset_index(drop=True))
            want = (want[sorted(want.columns)]
                    .sort_values(["norm_url", "url"])
                    .reset_index(drop=True).astype({"ts_s": "int64"}))
            pd.testing.assert_frame_equal(got, want)


def test_host_lang_stats_ties_and_merge(ray_session, tmp_path):
    """Majority-language tie breaks by language ascending; the empty
    string is a real class; partials merge across batches."""
    from ferenda_ray.ops.web import host_lang_stats, host_lang_stats_sql

    rows = []
    # host t: en==sv tie -> 'en'; host u: '' majority; host v: sv wins
    for lang, n in (("en", 3), ("sv", 3)):
        rows += [{"url": f"https://t.org/{lang}{i}", "lang": lang}
                 for i in range(n)]
    for lang, n in (("", 4), ("en", 1)):
        rows += [{"url": f"https://u.org/{lang}{i}", "lang": lang}
                 for i in range(n)]
    for lang, n in (("sv", 5), ("en", 2), ("de", 2)):
        rows += [{"url": f"https://v.org/{lang}{i}", "lang": lang}
                 for i in range(n)]
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path)

    got = (host_lang_stats(path, num_buckets=4).to_pandas()
           .sort_values("host").reset_index(drop=True))
    by = dict(zip(got.host, got.itertuples()))
    assert by["t.org"].top_lang == "en" and by["t.org"].top_lang_pages == 3
    assert by["u.org"].top_lang == "" and by["u.org"].n_langs == 2
    assert by["v.org"].top_lang == "sv" and by["v.org"].n_pages == 9

    want = (duckdb.sql(host_lang_stats_sql(path)).df()
            .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            {c_: "int64" for c_ in ("n_pages", "n_langs",
                                    "top_lang_pages")}))


def test_url_canonical_groups_vs_duckdb(ray_session, tmp_path):
    """Distributed variant-group counts equal the SQL recompute on a
    corpus with engineered variant collisions."""
    from ferenda_ray.ops.web import url_canonical_groups, url_canonical_sql

    rows = []
    for i in range(30):
        base = f"https://Site{i % 5}.example.org/doc/{i}"
        rows += [{"url": base + "/index.html?utm_source=a"},
                 {"url": base + "/"},
                 {"url": base.lower() + f"?b={i}&a={i}"},
                 {"url": base + f"?a={i}&b={i}#frag"}]
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path)

    got = (url_canonical_groups(path, num_buckets=4).to_pandas()
           .sort_values("norm_url").reset_index(drop=True))
    want = (duckdb.sql(url_canonical_sql(path)).df()
            .sort_values("norm_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])
