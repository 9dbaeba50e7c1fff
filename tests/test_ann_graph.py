"""ANN recall, graph analytics, facets, and multimodal stage tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(ray_session):
    from ferenda_ray.ops.ann import bruteforce_topk, ivf_topk

    exact = bruteforce_topk(SF, vec_id=0, k=10).to_pandas()
    approx = ivf_topk(SF, vec_id=0, k=10, nprobe=5).to_pandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.7, f"IVF recall {recall} too low"


def test_knn_classify(ray_session):
    from ferenda_ray.ops.ann import knn_classify

    out = knn_classify(SF, vec_id=0, k=15)
    assert list(out.columns) == ["vec_id", "pred_label", "n_votes"]
    assert 0 <= out.pred_label.iloc[0] <= 9


@pytest.fixture(scope="module")
def edges(ray_session):
    import ray.data as rd

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
    return rd.from_arrow(
        pa.table({"src": [r[0] for r in rows], "dst": [r[1] for r in rows]})
    )


def test_degrees(edges):
    from ferenda_ray.ops.graph import in_degrees, out_degrees

    ind = in_degrees(edges).to_pandas().set_index("dst")["in_degree"]
    assert ind["c"] == 3 and ind["b"] == 1 and ind["a"] == 1
    outd = out_degrees(edges).to_pandas().set_index("src")["out_degree"]
    assert outd["a"] == 2 and outd["c"] == 1


def test_incoming_refs(edges):
    from ferenda_ray.ops.graph import incoming_refs

    refs = incoming_refs(edges).to_pandas().set_index("dst")
    assert refs.loc["c", "citing"] == "a;b;d"
    assert refs.loc["c", "n_incoming"] == 3


def test_pagerank(edges):
    from ferenda_ray.ops.graph import pagerank

    def ranked(ds):
        return (ds.to_pandas()
                .sort_values(["rank", "url"], ascending=[False, True])
                .reset_index(drop=True))

    pr = ranked(pagerank(edges, n_iter=20))
    assert abs(pr["rank"].sum() - 1.0) < 1e-6
    # c has the most incoming links → highest rank
    assert pr.iloc[0]["url"] == "c"
    # deterministic
    pr2 = ranked(pagerank(edges, n_iter=20))
    pd.testing.assert_frame_equal(pr, pr2)


def test_facets_pivot(ray_session, pages_parquet):
    from ferenda_ray import schemas as S
    from ferenda_ray.ops.facets import faceted_data, stats_count_distinct
    from ferenda_ray.pipelines.kg import build_triples_ds

    triples = build_triples_ds(pages_parquet, link_concurrency=2, batch_size=32)
    fac = faceted_data(triples).to_pandas()
    # one row per subject, doc rows carry type + title + identifier
    assert fac.uri.is_unique
    docs = fac[fac.rdf_type == S.BIBO_DOCUMENT]
    assert (docs.dct_title != "").all()
    assert (docs.dct_identifier != "").all()
    st = stats_count_distinct(
        build_triples_ds(pages_parquet, link_concurrency=2, batch_size=32)
    ).to_pandas()
    type_counts = st[st.pred == S.RDF_TYPE].set_index("obj")["n_subjects"]
    assert type_counts[S.BIBO_DOCUMENT] == len(docs)


def test_media_decode_stage(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.multimodal import (FEATURE_DIM, MediaDecodeStage,
                                               synthetic_media_table)

    ds = rd.from_arrow(synthetic_media_table(50))
    out = ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                         batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 50
    assert out.decode_ok.all()
    assert "payload" not in out.columns  # wide column dropped
    assert all(len(f) == FEATURE_DIM for f in out.features)
    imgs = out[out.kind == "image"]
    assert (imgs.width > 0).all() and (imgs.duration_ms == -1).all()
    # determinism
    out2 = (rd.from_arrow(synthetic_media_table(50))
            .map_batches(MediaDecodeStage, batch_format="pyarrow",
                         batch_size=16, concurrency=2).to_pandas())
    import numpy as np
    a = np.asarray([np.asarray(f) for f in out.sort_values("media_id").features])
    b = np.asarray([np.asarray(f) for f in out2.sort_values("media_id").features])
    assert np.array_equal(a, b)


def test_media_resize_and_frame_sample(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.multimodal import (FrameSampleStage,
                                               MediaResizeStage,
                                               synthetic_media_table)

    ds = rd.from_arrow(synthetic_media_table(30))
    rs = ds.map_batches(MediaResizeStage, batch_format="pyarrow",
                        batch_size=16, concurrency=2).to_pandas()
    imgs = rs[rs.kind == "image"]
    assert (imgs.width <= 256).all() and (imgs.width > 0).all()
    assert "payload" in rs.columns  # transform stage keeps payload

    fs = (rd.from_arrow(synthetic_media_table(30))
          .map_batches(FrameSampleStage, batch_format="pyarrow",
                       batch_size=16, concurrency=2).to_pandas())
    vids = fs[fs.frame_idx >= 0]
    n_videos = 30 // 3
    assert len(vids) == n_videos * 4        # 4 frames per video
    assert (vids.groupby("media_id").ts_ms.is_monotonic_increasing).all()
    others = fs[fs.frame_idx == -1]
    assert len(others) == 30 - n_videos


def test_kmeans_deterministic_and_partitions(ray_session):
    from ferenda_ray.ops.ann import kmeans

    df = kmeans("/root/testdata/sf0.001", k=6, n_iter=4).to_pandas()
    assert len(df) == 500
    assert df.cluster.nunique() > 1
    df2 = kmeans("/root/testdata/sf0.001", k=6, n_iter=4).to_pandas()
    assert (df.sort_values("vec_id").cluster.to_numpy()
            == df2.sort_values("vec_id").cluster.to_numpy()).all()


def test_hits_scores(ray_session):
    import ray.data as rd

    from ferenda_ray.ops.graph import hits

    # star: hubs h1,h2 -> authority a (plus a->b chain)
    edges = rd.from_items([
        {"src": "h1", "dst": "a"}, {"src": "h2", "dst": "a"},
        {"src": "h1", "dst": "b"}, {"src": "a", "dst": "b"},
    ])
    def ranked(ds):
        return (ds.to_pandas()
                .sort_values(["authority", "url"],
                             ascending=[False, True])
                .reset_index(drop=True))

    df = ranked(hits(edges, n_iter=8))
    top_auth = df.iloc[0]
    assert top_auth.url in ("a", "b")
    hubs = df.set_index("url").hub
    assert hubs["h1"] > hubs["h2"]  # h1 points at both authorities
    # determinism
    df2 = ranked(hits(rd.from_items([
        {"src": "h1", "dst": "a"}, {"src": "h2", "dst": "a"},
        {"src": "h1", "dst": "b"}, {"src": "a", "dst": "b"},
    ]), n_iter=8))
    assert df.equals(df2)


def test_pagerank_equals_sequential_reference(ray_session):
    """BSP pagerank == an independent sequential power iteration with
    identical damping/dangling semantics, on a random digraph."""
    import random

    import numpy as np
    import ray.data as rd

    from ferenda_ray.ops.graph import pagerank

    rng = random.Random(3)
    nodes = [f"n{i:02d}" for i in range(60)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(300)})
    edges = [(s, t) for s, t in edges if s != t]

    got = pagerank(rd.from_items(
        [{"src": s, "dst": t} for s, t in edges]), n_iter=12).to_pandas()

    node_set = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(node_set)}
    n = len(node_set)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(12):
        dangling = sum(r[idx[u]] for u in node_set if u not in outdeg)
        base = (1 - d) / n + d * dangling / n
        nxt = np.full(n, base)
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / outdeg[s]
        r = nxt

    want = {u: r[idx[u]] for u in node_set}
    assert len(got) == n
    for row in got.itertuples():
        assert abs(row.rank - want[row.url]) < 1e-9, row.url


def test_triangle_count_handcheck(ray_session):
    """K4 has 4 triangles; adding a pendant edge changes nothing;
    duplicate/reversed/self-loop edges are canonicalized away."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import triangle_count

    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for x, y in itertools.combinations(nodes, 2)]
    edges += [("y", "x"), ("x", "y"), ("e", "a"), ("a", "a")]  # noise
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = triangle_count(rd.from_pandas(df), num_buckets=3)
    assert int(got.n_triangles[0]) == 4


def test_triangle_count_vs_bruteforce(ray_session):
    """Random-ish deterministic graph: bucketed wedge-close equals an
    in-memory brute force."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import triangle_count

    edges = [(f"n{(i * 7) % 23}", f"n{(i * 13 + 5) % 23}")
             for i in range(80)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    brute = sum(1 for a, b, c in itertools.combinations(
        sorted({n for e in und for n in e}), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und)
    got = triangle_count(rd.from_pandas(df), num_buckets=5)
    assert int(got.n_triangles[0]) == brute


def test_triangle_orientations_agree(ray_session):
    """Degree-ordered and id-ordered wedge generation count identical
    triangles on a random-ish graph with a hub."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import triangle_count

    edges = [(f"n{(i * 7) % 23}", f"n{(i * 13 + 5) % 23}")
             for i in range(80)]
    edges += [("hub", f"n{i}") for i in range(23)]  # attach a hub
    df = pd.DataFrame(edges, columns=["src", "dst"])
    a = triangle_count(rd.from_pandas(df), num_buckets=5, orient="degree")
    b = triangle_count(rd.from_pandas(df), num_buckets=5, orient="id")
    assert int(a.n_triangles[0]) == int(b.n_triangles[0]) > 0


def test_triangle_star_wedge_bound(ray_session):
    """On a star graph (1 hub, d leaves) degree orientation points
    every edge INTO the hub, so apexes are the degree-1 leaves and the
    wedge volume is ZERO — while id-ordering (hub sorts first) would
    emit C(d,2) wedge rows inside one bucket task. This is the O(m^1.5)
    vs O(d^2) hub-blowup guarantee from the round-3 brief."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import _canon_edges, _wedge_rows

    d = 40
    df = pd.DataFrame({"src": ["aaa_hub"] * d,
                       "dst": [f"leaf{i:03d}" for i in range(d)]})
    und = _canon_edges(rd.from_pandas(df))
    assert _wedge_rows(und, 4, "degree").count() == 0
    assert _wedge_rows(und, 4, "id").count() == d * (d - 1) // 2


def test_triangle_count_empty_edges(ray_session):
    """Empty edge set (e.g. a corpus with no references) returns 0
    instead of crashing on int(None) — ADVICE r3 regression."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import triangle_count

    df = pd.DataFrame({"src": pd.Series([], dtype="object"),
                       "dst": pd.Series([], dtype="object")})
    got = triangle_count(rd.from_pandas(df))
    assert int(got.n_triangles[0]) == 0


def _sync_peel_reference(edges, k, n_rounds):
    """Synchronous (Jacobi) k-core peel, bounded rounds — the exact
    semantics kcore and its unrolled SQL oracle both implement."""
    half = {}
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for a, b in und:
        half.setdefault(a, set()).add(b)
        half.setdefault(b, set()).add(a)
    alive = set(half)
    for _ in range(n_rounds):
        deg = {u: sum(v in alive for v in half[u]) for u in alive}
        dead = {u for u in alive if deg[u] < k}
        if not dead:
            break
        alive -= dead
    out = {}
    for u in alive:
        d = sum(v in alive for v in half[u])
        if d > 0:  # zero-degree survivor of a truncated peel: no edges
            out[u] = d
    return out


def test_kcore_vs_bruteforce(ray_session):
    """Converged case: kcore equals the fixpoint peel on a
    deterministic pseudo-random graph, at several k."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import kcore

    edges = [(f"n{(i * 7) % 29}", f"n{(i * 13 + 5) % 29}")
             for i in range(120)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    for k in (2, 3, 4):
        got = kcore(ds, k=k, n_rounds=50, num_buckets=5).to_pandas()
        want = _sync_peel_reference(edges, k, 50)
        # ray's to_pandas drops the column schema on 0-row results
        got_map = (dict(zip(got.url, got.core_deg)) if len(got) else {})
        assert got_map == want


def test_kcore_bounded_rounds_match_reference(ray_session):
    """NON-converged case (the oracle-parity contract): a long path
    graph peels one layer per round under k=2, so a small round bound
    truncates mid-peel — kcore must equal the same-round-count
    synchronous reference exactly, including dropping any survivor
    peeled to degree 0 in the final round."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import kcore

    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    for rounds in (1, 3, 8):
        got = kcore(ds, k=2, n_rounds=rounds, num_buckets=3).to_pandas()
        want = _sync_peel_reference(edges, 2, rounds)
        assert dict(zip(got.url, got.core_deg)) == want
    # fully converged: a path has no 2-core at all
    assert kcore(ds, k=2, n_rounds=50, num_buckets=3).count() == 0


def test_kcore_empty_and_validation(ray_session):
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from ferenda_ray.ops.graph import kcore

    empty = rd.from_pandas(pd.DataFrame({"src": ["x"], "dst": ["x"]}))
    assert kcore(empty, k=2).count() == 0  # self-loops drop to nothing
    with _pytest.raises(ValueError):
        kcore(empty, k=0)


def test_kcore_differential_fuzz(ray_session):
    """Seeded random multigraphs (self-loops + duplicate edges in the
    input, which canonicalization must collapse) vs the synchronous
    peel reference, across k and round bounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import kcore

    rng = np.random.default_rng(99)
    for trial in range(3):
        n = int(rng.integers(15, 40))
        m = int(rng.integers(30, 140))
        src = [f"v{int(x)}" for x in rng.integers(0, n, m)]
        dst = [f"v{int(x)}" for x in rng.integers(0, n, m)]
        edges = list(zip(src, dst))
        ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
        for k, rounds in ((2, 2), (3, 50), (4, 1)):
            got = kcore(ds, k=k, n_rounds=rounds,
                        num_buckets=4).to_pandas()
            want = _sync_peel_reference(edges, k, rounds)
            got_map = (dict(zip(got.url, got.core_deg))
                       if len(got) else {})
            assert got_map == want, (trial, k, rounds)


def _hindex_reference(edges, n_rounds):
    """Synchronous h-index iteration (Montresor et al. 2011) — the
    exact semantics core_numbers and its unrolled SQL oracle share."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    est = {u: len(vs) for u, vs in adj.items()}
    for _ in range(n_rounds):
        new = {}
        for u, vs in adj.items():
            vals = sorted((est[v] for v in vs), reverse=True)
            new[u] = max((min(v, i + 1) for i, v in enumerate(vals)),
                         default=0)
        if new == est:
            break
        est = new
    return est


def test_core_numbers_vs_exact_and_truncated(ray_session):
    """core_numbers equals (a) the exact min-degree-peel corenesses
    once converged, and (b) the same-round-count synchronous h-index
    reference when truncated mid-iteration (the oracle contract)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import core_numbers

    rng = np.random.default_rng(5)
    for trial in range(2):
        n = int(rng.integers(15, 45))
        m = int(rng.integers(30, 180))
        edges = [(f"v{int(a)}", f"v{int(b)}")
                 for a, b in zip(rng.integers(0, n, m),
                                 rng.integers(0, n, m))]
        ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
        for rounds in (1, 2, 60):
            got = core_numbers(ds, n_rounds=rounds,
                               num_buckets=4).to_pandas()
            want = _hindex_reference(edges, rounds)
            assert dict(zip(got.url, got.coreness)) == want, \
                (trial, rounds)
        # converged h-index == exact peel corenesses (sanity against
        # an independent algorithm, not just the same recurrence)
        und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive, deg, core, k = set(adj), \
            {u: len(adj[u]) for u in adj}, {}, 0
        while alive:
            u = min(alive, key=lambda x: (deg[x], x))
            k = max(k, deg[u])
            core[u] = k
            alive.remove(u)
            for v in adj[u]:
                if v in alive:
                    deg[v] -= 1
        assert _hindex_reference(edges, 60) == core


def test_components_vs_union_find(ray_session):
    """Label propagation equals union-find components (min-url label)
    on seeded random graphs plus a long chain (diameter stress)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import components

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a == b:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for u in list(parent):
            groups.setdefault(find(u), []).append(u)
        return {u: min(g) for g in groups.values() for u in g}

    rng = np.random.default_rng(11)
    cases = []
    for _ in range(2):
        n, m = int(rng.integers(20, 50)), int(rng.integers(15, 60))
        cases.append([(f"v{int(a)}", f"v{int(b)}")
                      for a, b in zip(rng.integers(0, n, m),
                                      rng.integers(0, n, m))])
    cases.append([(f"c{i:02d}", f"c{i + 1:02d}") for i in range(25)])
    for edges in cases:
        ds = rd.from_pandas(pd.DataFrame(edges,
                                         columns=["src", "dst"]))
        got = components(ds, num_buckets=4).to_pandas()
        assert dict(zip(got.url, got.component)) == uf_components(edges)

    # bounded rounds: a 25-hop chain cannot converge in 3 rounds
    ds = rd.from_pandas(pd.DataFrame(cases[-1],
                                     columns=["src", "dst"]))
    with pytest.raises(RuntimeError, match="did not converge"):
        components(ds, num_buckets=4, max_rounds=3)


def test_cocitations_vs_bruteforce(ray_session):
    """Bucketed co-citation counting equals brute force, including
    duplicate-edge collapse and the min_count threshold."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import cocitations

    rng = np.random.default_rng(17)
    edges = [(f"s{int(a)}", f"t{int(b)}")
             for a, b in zip(rng.integers(0, 12, 150),
                             rng.integers(0, 18, 150))]
    edges += edges[:20]  # duplicate rows must not inflate counts
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))

    cites = {}
    for s, t in set(edges):
        if s != t:
            cites.setdefault(s, set()).add(t)
    brute = {}
    for s, ts in cites.items():
        for a, b in itertools.combinations(sorted(ts), 2):
            brute[(a, b)] = brute.get((a, b), 0) + 1
    for mc in (1, 2, 3):
        got = cocitations(ds, min_count=mc, num_buckets=5).to_pandas()
        got_map = (dict(zip(zip(got.a, got.b), got.n_cocited))
                   if len(got) else {})
        assert got_map == {k: v for k, v in brute.items() if v >= mc}, mc


def test_coupling_vs_bruteforce(ray_session):
    """Bibliographic coupling equals brute force and is exactly
    co-citation over reversed edges."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import coupling

    rng = np.random.default_rng(23)
    edges = [(f"s{int(a)}", f"t{int(b)}")
             for a, b in zip(rng.integers(0, 18, 150),
                             rng.integers(0, 10, 150))]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))

    refs = {}
    for s, t in set(edges):
        refs.setdefault(t, set()).add(s)
    brute = {}
    for t, ss in refs.items():
        for a, b in itertools.combinations(sorted(ss), 2):
            brute[(a, b)] = brute.get((a, b), 0) + 1
    got = coupling(ds, min_count=2, num_buckets=5).to_pandas()
    got_map = (dict(zip(zip(got.a, got.b), got.n_coupled))
               if len(got) else {})
    assert got_map == {k: v for k, v in brute.items() if v >= 2}

def test_adamic_adar_vs_bruteforce(ray_session):
    """Bucketed Adamic–Adar equals brute force (counts AND int64
    micro-unit scores), including duplicate-edge collapse, self-loop
    drop, and the min_count threshold."""
    import itertools
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import adamic_adar

    rng = np.random.default_rng(31)
    edges = [(f"s{int(a)}", f"t{int(b)}")
             for a, b in zip(rng.integers(0, 12, 160),
                             rng.integers(0, 18, 160))]
    edges += edges[:25]          # duplicates must not inflate outdeg
    edges += [("t3", "t3")]      # self-loop must be dropped
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))

    cites = {}
    for s, t in set(edges):
        if s != t:
            cites.setdefault(s, set()).add(t)
    brute_n, brute_aa = {}, {}
    for s, ts in cites.items():
        if len(ts) < 2:
            continue
        wt = int(math.floor(1_000_000.0 / math.log(len(ts))))
        for a, b in itertools.combinations(sorted(ts), 2):
            brute_n[(a, b)] = brute_n.get((a, b), 0) + 1
            brute_aa[(a, b)] = brute_aa.get((a, b), 0) + wt
    for mc in (1, 2, 3):
        got = adamic_adar(ds, min_count=mc, num_buckets=5).to_pandas()
        got_n = (dict(zip(zip(got.a, got.b), got.n_common))
                 if len(got) else {})
        got_aa = (dict(zip(zip(got.a, got.b), got.aa_micro))
                  if len(got) else {})
        assert got_n == {k: v for k, v in brute_n.items() if v >= mc}, mc
        assert got_aa == {k: brute_aa[k] for k in got_n}, mc


def test_aa_weight_micro_duckdb_parity():
    """The per-term integer weight floor(1e6/ln(d)) matches DuckDB's
    FLOOR(1000000.0 / LN(d)) for every outdeg the synthetic corpora
    can produce (both sides call the platform libm on the same
    doubles — this sweep pins the oracle contract)."""
    import duckdb
    import numpy as np

    from ferenda_ray.ops.graph import aa_weight_micro

    d = np.arange(2, 5001, dtype="int64")
    ours = aa_weight_micro(d)
    theirs = duckdb.sql(
        "SELECT CAST(FLOOR(1000000.0 / LN(d)) AS BIGINT) "
        "FROM (SELECT unnest(generate_series(2, 5000)) AS d)"
    ).fetchnumpy()
    key = next(iter(theirs))
    assert (ours == theirs[key].astype("int64")).all()

def test_local_triangles_vs_bruteforce(ray_session):
    """Per-node triangle counts + integer-micro clustering coefficient
    equal brute force on random graphs, a star (0 triangles at every
    node), and a clique; the per-node sum is 3x the global count."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import local_triangles, triangle_count

    rng = np.random.default_rng(41)
    cases = []
    for _ in range(2):
        n, m = int(rng.integers(10, 25)), int(rng.integers(20, 70))
        cases.append([(f"v{int(a)}", f"v{int(b)}")
                      for a, b in zip(rng.integers(0, n, m),
                                      rng.integers(0, n, m))])
    cases.append([("hub", f"leaf{i}") for i in range(30)])      # star
    cases.append(list(itertools.combinations(
        [f"k{i}" for i in range(6)], 2)))                       # K6
    for edges in cases:
        und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        brute = {}
        for u, nb in adj.items():
            t = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                    if y in adj.get(x, ()))
            d = len(nb)
            lcc = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else 0
            brute[u] = (d, t, lcc)

        ds = rd.from_pandas(pd.DataFrame(list(edges),
                                         columns=["src", "dst"]))
        got = local_triangles(ds, num_buckets=5).to_pandas()
        got_map = {r.url: (r.degree, r.n_triangles, r.lcc_micro)
                   for r in got.itertuples()}
        assert got_map == brute
        total = triangle_count(ds, num_buckets=5)["n_triangles"][0]
        assert got["n_triangles"].sum() == 3 * total


def test_link_prediction_vs_bruteforce(ray_session):
    """Bucketed link-prediction suite equals brute force (common
    neighbours, distinct in-degrees, integer-micro Jaccard,
    preferential attachment), including duplicate-edge collapse,
    self-loop drop, and the min_count threshold."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import link_prediction

    rng = np.random.default_rng(47)
    edges = [(f"s{int(a)}", f"t{int(b)}")
             for a, b in zip(rng.integers(0, 12, 160),
                             rng.integers(0, 18, 160))]
    edges += edges[:25]          # duplicates must not inflate degrees
    edges += [("t5", "t5")]      # self-loop must be dropped
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))

    cites, indeg = {}, {}
    for s, t in set(edges):
        if s != t:
            cites.setdefault(s, set()).add(t)
            indeg[t] = indeg.get(t, 0) + 1
    brute = {}
    for s, ts in cites.items():
        for a, b in itertools.combinations(sorted(ts), 2):
            brute[(a, b)] = brute.get((a, b), 0) + 1
    for mc in (1, 2, 3):
        got = link_prediction(ds, min_count=mc, num_buckets=5).to_pandas()
        want = {k: v for k, v in brute.items() if v >= mc}
        got_n = (dict(zip(zip(got.a, got.b), got.n_common))
                 if len(got) else {})
        assert got_n == want, mc
        for row in got.itertuples():
            da, db = indeg[row.a], indeg[row.b]
            assert row.deg_a == da and row.deg_b == db
            assert row.pref_attach == da * db
            assert row.jaccard_micro == (
                1_000_000 * row.n_common) // (da + db - row.n_common)


def test_assortativity_vs_bruteforce(ray_session):
    """Distributed assortativity sums equal brute force, and r_micro
    uses DuckDB's trunc-toward-zero // (a star graph is maximally
    disassortative: r = -1 exactly → r_micro = -1000000)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import assortativity, _tz_div

    # star: every edge joins deg-8 hub to a deg-1 leaf → r = -1
    star = pd.DataFrame({"src": ["h"] * 8,
                         "dst": [f"l{i}" for i in range(8)]})
    got = assortativity(rd.from_pandas(star), num_buckets=3)
    assert got.n_edges[0] == 8 and got.r_micro[0] == -1_000_000

    rng = np.random.default_rng(53)
    edges = [(f"n{int(a)}", f"n{int(b)}")
             for a, b in zip(rng.integers(0, 25, 120),
                             rng.integers(0, 25, 120))]
    edges += edges[:10] + [("n3", "n3")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    canon = {(min(a, b), max(a, b)) for a, b in set(edges) if a != b}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(canon)
    s1 = sum(deg[a] + deg[b] for a, b in canon)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in canon)
    sp = sum(2 * deg[a] * deg[b] for a, b in canon)
    got = assortativity(ds, num_buckets=4)
    assert (int(got.n_edges[0]), int(got.sum_deg[0]),
            int(got.sum_sq[0]), int(got.sum_prod[0])) == (m, s1, s2, sp)
    assert got.r_micro[0] == _tz_div(
        1_000_000 * (2 * m * sp - s1 * s1), 2 * m * s2 - s1 * s1)

    # duckdb // parity on the negative quotient path
    import duckdb
    num, den = 1_000_000 * (2 * m * sp - s1 * s1), 2 * m * s2 - s1 * s1
    assert duckdb.sql(f"SELECT {num} // {den}").fetchone()[0] == \
        _tz_div(num, den)


def test_personalized_pagerank_vs_dense(ray_session):
    """BSP personalized PageRank equals a dense numpy power iteration
    with the same seed-teleport / seed-dangling semantics; mass is
    conserved and non-seed source-only nodes decay to zero."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import personalized_pagerank

    rng = np.random.default_rng(61)
    hosts = [f"h{i}.org" for i in range(4)]
    nodes = [f"https://{hosts[i % 4]}/p{i}" for i in range(20)]
    pairs = rng.integers(0, 20, size=(60, 2))
    edges = pd.DataFrame({"src": [nodes[a] for a, _ in pairs],
                          "dst": [nodes[b] for _, b in pairs]})
    seed_host = "h1.org"

    got = personalized_pagerank(
        rd.from_pandas(edges), seed_host=seed_host, n_iter=7,
        num_buckets=4).to_pandas().set_index("url")["rank"]

    # dense reference with identical semantics (edge ROWS, not
    # distinct edges, define outdeg and contributions — as in the BSP)
    urls = sorted(set(edges.src) | set(edges.dst))
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    outdeg = np.zeros(n)
    for s in edges.src:
        outdeg[idx[s]] += 1
    seed = np.array([u.split("/")[2] == seed_host for u in urls])
    r = np.where(seed, 1.0 / seed.sum(), 0.0)
    d = 0.85
    for _ in range(7):
        dang = r[outdeg == 0].sum()
        c = np.zeros(n)
        for s, t in edges.itertuples(index=False):
            c[idx[t]] += r[idx[s]] / outdeg[idx[s]]
        r = np.where(seed, (1 - d) / seed.sum()
                     + d * dang / seed.sum(), 0.0) + d * c
    want = pd.Series(r, index=urls)
    assert np.allclose(got.reindex(urls).values, want.values,
                       atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9


def test_bfs_hops_vs_bruteforce(ray_session):
    """Frontier-mail BSP BFS equals a python BFS: multi-seed host,
    directed edges, cycles, unreachable nodes absent from the output."""
    from collections import deque

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import bfs_hops

    rng = np.random.default_rng(71)
    hosts = [f"h{i}.org" for i in range(4)]
    nodes = [f"https://{hosts[i % 4]}/p{i}" for i in range(30)]
    pairs = rng.integers(0, 30, size=(70, 2))
    edges = pd.DataFrame({"src": [nodes[a] for a, _ in pairs],
                          "dst": [nodes[b] for _, b in pairs]})
    # a guaranteed-unreachable sink component rooted off-host
    edges = pd.concat([edges, pd.DataFrame(
        {"src": ["https://h3.org/iso1"], "dst": ["https://h3.org/iso2"]}
    )], ignore_index=True)
    seed_host = "h2.org"

    got = (bfs_hops(rd.from_pandas(edges), seed_host=seed_host,
                    num_buckets=4).to_pandas()
           .set_index("url")["dist"].to_dict())

    adj = {}
    every = set(edges.src) | set(edges.dst)
    for s, t in edges.itertuples(index=False):
        adj.setdefault(s, []).append(t)
    want, dq = {}, deque()
    for u in sorted(every):
        if u.split("/")[2] == seed_host:
            want[u] = 0
            dq.append(u)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    assert got == want
    assert "https://h3.org/iso2" not in got or \
        "https://h3.org/iso2" in want


def test_seed_closeness_vs_bruteforce(ray_session):
    """Harmonic closeness rollup equals the python BFS-derived exact
    integer sum (floor per-node micro contributions)."""
    from collections import deque

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.ops.graph import seed_closeness

    rng = np.random.default_rng(72)
    hosts = [f"h{i}.org" for i in range(4)]
    nodes = [f"https://{hosts[i % 4]}/p{i}" for i in range(25)]
    pairs = rng.integers(0, 25, size=(60, 2))
    edges = pd.DataFrame({"src": [nodes[a] for a, _ in pairs],
                          "dst": [nodes[b] for _, b in pairs]})
    seed_host = "h1.org"

    got = seed_closeness(rd.from_pandas(edges), seed_host=seed_host,
                         num_buckets=4)

    adj = {}
    every = set(edges.src) | set(edges.dst)
    for s, t in edges.itertuples(index=False):
        adj.setdefault(s, []).append(t)
    want, dq = {}, deque()
    for u in sorted(every):
        if u.split("/")[2] == seed_host:
            want[u] = 0
            dq.append(u)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    pos = [d for d in want.values() if d > 0]
    assert got.harmonic_micro[0] == sum(1_000_000 // d for d in pos)
    assert got.n_reached[0] == len(pos)
    assert got.max_dist[0] == (max(want.values()) if want else 0)
