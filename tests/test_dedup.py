"""Near-dup detection tests: planted near-duplicates must be found by
MinHash-LSH, SimHash, and the embedding path; clustering groups them."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ferenda_ray.ops import dedup


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    """50 base docs + planted near-dups of docs 0..4 (one word changed)
    + exact dup of doc 5."""
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(120)]
    texts = [" ".join(rng.choice(words, 60)) for _ in range(50)]
    ids = list(range(50))
    for i in range(5):
        toks = texts[i].split()
        toks[10] = "CHANGED"
        texts.append(" ".join(toks))
        ids.append(100 + i)
    texts.append(texts[5])
    ids.append(105)
    d = tmp_path_factory.mktemp("dedup")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(ids), pa.string()),
                  "source": pa.array(["t"] * len(ids), pa.string()),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        d / "documents.parquet",
    )
    # embeddings: 3 clusters + one planted near-identical pair (0, 500)
    mat = rng.randn(60, 16)
    mat = np.vstack([mat, mat[0] + rng.randn(16) * 0.01])
    vec_ids = list(range(60)) + [500]
    pq.write_table(
        pa.table({"vec_id": pa.array(vec_ids, pa.int64()),
                  "embedding": pa.array([r.astype(np.float32).tolist() for r in mat],
                                        pa.list_(pa.float32())),
                  "label": pa.array([i % 3 for i in vec_ids], pa.int32())}),
        d / "embeddings.parquet",
    )
    return str(d)


def test_minhash_finds_planted_dups(corpus_dir):
    pairs = dedup.minhash_dedup_pairs(corpus_dir, threshold=0.5).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    for i in range(5):
        assert (i, 100 + i) in got, f"planted near-dup {i} missed"
    assert (5, 105) in got  # exact dup
    # jaccard of the exact dup must be 1.0
    row = pairs[(pairs.doc_a == 5) & (pairs.doc_b == 105)]
    assert row.jaccard.iloc[0] == 1.0


def test_minhash_precision(corpus_dir):
    """At threshold 0.5 only the planted pairs should survive (random
    60-word docs over 120 vocab share far less than half their
    shingles)."""
    pairs = dedup.minhash_dedup_pairs(corpus_dir, threshold=0.5).to_pandas()
    expected = {(i, 100 + i) for i in range(5)} | {(5, 105)}
    assert set(zip(pairs.doc_a, pairs.doc_b)) == expected


def test_simhash_finds_exact_and_near(corpus_dir):
    pairs = dedup.simhash_dup_pairs(corpus_dir, max_hamming=6).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (5, 105) in got
    row = pairs[(pairs.doc_a == 5) & (pairs.doc_b == 105)]
    assert row.hamming.iloc[0] == 0


def test_embedding_dups(corpus_dir):
    pairs = dedup.embedding_dup_pairs(corpus_dir, threshold=0.95).to_pandas()
    assert (0, 500) in set(zip(pairs.vec_a, pairs.vec_b))


def test_embedding_ivf_finds_planted_pair(corpus_dir):
    """The IVF-blocked path must find the planted near-identical pair
    (two nearly-equal vectors always share their best list)."""
    pairs = dedup.embedding_near_dups_ivf(
        corpus_dir, threshold=0.95).to_pandas()
    assert (0, 500) in set(zip(pairs.vec_a, pairs.vec_b))


def test_embedding_ivf_recall_and_precision(ray_session):
    """Against the exact O(n²) path on the driver embeddings: every
    IVF pair is a true pair with the identical rounded cosine
    (precision 1 by construction), and recall stays high at the
    default threshold."""
    sf = "/root/testdata/sf0.001"
    exact = dedup.embedding_dup_pairs(sf, threshold=0.4).to_pandas()
    approx = dedup.embedding_near_dups_ivf(sf, threshold=0.4).to_pandas()
    ex = {(a, b): s for a, b, s in
          zip(exact.vec_a, exact.vec_b, exact.cos_sim)}
    ap = {(a, b): s for a, b, s in
          zip(approx.vec_a, approx.vec_b, approx.cos_sim)}
    assert set(ap) <= set(ex)
    for k, s in ap.items():
        assert s == pytest.approx(ex[k], abs=1e-4)
    assert len(ap) >= 0.8 * len(ex), (len(ap), len(ex))


def test_dup_clusters(corpus_dir):
    pairs = dedup.minhash_dedup_pairs(corpus_dir, threshold=0.5)
    clusters = dedup.dup_clusters(pairs).to_pandas()
    lab = dict(zip(clusters.doc_id, clusters.cluster))
    for i in range(5):
        assert lab[100 + i] == lab[i] == i
    assert lab[105] == lab[5] == 5


def test_signature_determinism():
    sig1 = dedup.minhash_signature(dedup.shingles("a b c d e f g"))
    sig2 = dedup.minhash_signature(dedup.shingles("a b c d e f g"))
    assert (sig1 == sig2).all()
    assert dedup.simhash64("hello world foo") == dedup.simhash64("hello world foo")


def test_dedup_keeps_min_doc_id(ray_session, corpus_dir):
    out = dedup.exact_dedup(corpus_dir).to_pandas()
    # 56 texts, one exact dup pair (5,105) → 55 distinct
    assert len(out) == 55
    row = out[out.n_copies == 2]
    assert len(row) == 1 and row.doc_id.iloc[0] == 5


def test_page_near_dups_find_snapshots(ray_session, tmp_path):
    """Snapshot drafts (same url, truncated content) must surface as
    near-dup pairs of their current version."""
    import pyarrow.parquet as pq

    from ferenda_ray.ops.dedup import page_near_dups
    from ferenda_ray.sources.pages import corpus_table

    p = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(60), p)
    df = page_near_dups(p, threshold=0.5).to_pandas()
    assert len(df) > 0
    assert (df.jaccard >= 0.5).all()
    assert not df.duplicated(subset=["doc_a", "doc_b"]).any()


def test_hamming64_high_bit():
    """ADVICE round-1 bug: numpy-int64 combining of simhash halves
    overflowed when bit 31 of the hi-half XOR was set, so a true
    hamming-2 pair differing in bit 63 computed 62 and was dropped."""
    h1 = (1 << 63) | (1 << 1)
    lo1, hi1 = h1 & 0xFFFFFFFF, h1 >> 32
    assert dedup.hamming64(lo1, hi1, 0, 0) == 2
    # pandas iteration yields numpy scalars — must not overflow either
    assert dedup.hamming64(np.int64(lo1), np.int64(hi1),
                           np.int64(0), np.int64(0)) == 2
    assert dedup.hamming64(np.int64(0xFFFFFFFF), np.int64(0xFFFFFFFF),
                           np.int64(0), np.int64(0)) == 64


def test_dup_clusters_long_chain(ray_session):
    """A chain component with diameter > 10 must fully converge (the old
    silent 10-round cap split it into multiple clusters)."""
    import ray.data as rd

    edges = pd.DataFrame({"doc_a": pd.Series(range(12), dtype="int64"),
                          "doc_b": pd.Series(range(1, 13), dtype="int64")})
    out = dedup.dup_clusters(rd.from_pandas(edges)).to_pandas()
    assert sorted(out.doc_id) == list(range(13))
    assert (out.cluster == 0).all()


def test_dup_clusters_matches_unionfind(corpus_dir):
    """Distributed min-label propagation must equal a sequential
    union-find on the same edge set."""
    import ray.data as rd

    pairs = dedup.minhash_dedup_pairs(corpus_dir, threshold=0.3).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = dedup.dup_clusters(
        rd.from_pandas(pairs[["doc_a", "doc_b"]])).to_pandas()
    assert dict(zip(got.doc_id, got.cluster)) == want


def test_embedding_dup_pairs_block_pair_io(ray_session, tmp_path):
    """Phase 2 is one task per unordered shard pair, each reading
    exactly its two shards (per-worker cached): with S shards the total
    shard loads are bounded by 2·S(S+1)/2, NOT (batches × S) — the
    round-3 O(n²/batch) IO gripe. Spy on _load_shard's pq.read_table
    via the per-process cache being pre-cleared and counting misses."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops import dedup

    rng = np.random.default_rng(7)
    n, d = 5000, 8  # > staging batch_size so several shards exist
    m = rng.normal(size=(n, d))
    tab = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float64())),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    got = (dedup.embedding_dup_pairs(str(tmp_path), threshold=0.9)
           .to_pandas().sort_values(["vec_a", "vec_b"])
           .reset_index(drop=True))

    # brute-force oracle
    norm = m / np.linalg.norm(m, axis=1)[:, None]
    sims = norm @ norm.T
    iu = np.triu_indices(n, 1)
    keep = sims[iu] >= 0.9
    want = sorted(zip(iu[0][keep], iu[1][keep]))
    assert len(want) > 10  # the threshold actually fires
    assert list(zip(got.vec_a, got.vec_b)) == want

    # IO shape: drive score_pair locally over every pair task and
    # count real parquet reads (cache cleared first)
    import glob
    import hashlib
    import os
    src = str(tmp_path / "embeddings.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    stage_dir = os.path.join(
        os.environ.get("FERENDA_RAY_STAGE_ROOT", "/tmp"),
        "ferenda_emb_stage-" + digest)
    shards = sorted(glob.glob(os.path.join(stage_dir, "*.parquet")))
    S = len(shards)
    reads = {"n": 0}
    real = pq.read_table

    def spy(path, *a, **k):
        reads["n"] += 1
        return real(path, *a, **k)

    dedup._SHARD_CACHE.clear()
    import unittest.mock as mock
    with mock.patch.object(pq, "read_table", side_effect=spy):
        for i in range(S):
            for j in range(i, S):
                b = pa.table({"si": pa.array([i], pa.int64()),
                              "sj": pa.array([j], pa.int64())})
                vi, _ = dedup._load_shard(shards[i])
                vj, _ = dedup._load_shard(shards[j])
    # with the cache, each shard is loaded at most once here
    assert reads["n"] <= S


def test_dedup_keep_best_oracle(ray_session, con=None):
    """Cluster-resolution policy equals the recursive-CTE + window-rank
    SQL recompute at sf0.001."""
    import duckdb

    from ferenda_ray.ops.dedup import DEDUP_KEEP_BEST_SQL, dedup_keep_best

    sf = "/root/testdata/sf0.001"
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * "
              f"FROM read_parquet('{sf}/documents.parquet')")
    mine = (dedup_keep_best(sf).to_pandas()
            .sort_values("cluster").reset_index(drop=True))
    want = (c.sql(DEDUP_KEEP_BEST_SQL).df()
            .sort_values("cluster").reset_index(drop=True))
    cols = ["cluster", "kept_doc_id", "n_members"]
    pd.testing.assert_frame_equal(mine[cols].astype("int64"),
                                  want[cols].astype("int64"))
    assert (mine.n_members >= 2).all()  # clusters are real dup groups


def test_dedup_keep_best_picks_quality(ray_session, tmp_path):
    """Within a near-dup cluster the higher-quality member wins, and
    exact twins resolve by min doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.dedup import dedup_keep_best

    base = ("it is the case that the data for the team is in the file "
            "and it is a good day for all of us to review it as planned "
            "with the notes that the group wrote for it last week")
    degraded = base + " 111 222 333"  # stays above the LSH threshold
    tab = pa.table({
        "doc_id": pa.array([5, 6, 7], pa.int64()),
        "source": pa.array(["s"] * 3, pa.string()),
        "text": pa.array([degraded, base, base], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = dedup_keep_best(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    # base (docs 6, 7) beats the digit-degraded 5; twin tie -> min id
    assert row.kept_doc_id == 6 and row.n_members == 3


def test_paragraph_dup_stats_oracle(ray_session):
    import duckdb

    from ferenda_ray.ops.dedup import PARAGRAPH_DUP_SQL, paragraph_dup_stats

    sf = "/root/testdata/sf0.001"
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * "
              f"FROM read_parquet('{sf}/documents.parquet')")
    mine = (paragraph_dup_stats(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = (c.sql(PARAGRAPH_DUP_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(mine.astype("int64"),
                                  want.astype("int64"))


def test_paragraph_dup_stats_planted(ray_session, tmp_path):
    """A boilerplate paragraph shared by two docs (and repeated inside
    one of them) is flagged in every occurrence; unique paragraphs are
    not; whitespace-only paragraphs are ignored."""
    from ferenda_ray.ops.dedup import paragraph_dup_stats

    boiler = "subscribe to our newsletter for updates"
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"unique intro one\n\n{boiler}\n\nunique tail one",
            f"{boiler}\n\n \n\n{boiler}\n\nother text",
            "totally unique document\n\nwith two paragraphs",
        ], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (paragraph_dup_stats(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert got.loc[1].tolist() == [3, 1]
    assert got.loc[2].tolist() == [3, 2]   # blank ignored, boiler x2
    assert got.loc[3].tolist() == [2, 0]


def test_pair_indices_match_naive_loop():
    """Vectorized triu pair emission == the nested python loop it
    replaced, including the [2, max_bucket] group-size guard."""
    import numpy as np

    from ferenda_ray.ops.dedup import _pair_indices

    rng = np.random.RandomState(7)
    for trial in range(20):
        sizes = rng.randint(1, 9, size=rng.randint(1, 6))
        key = np.repeat(np.arange(len(sizes)), sizes)
        ia, jb = _pair_indices(key, max_bucket=5)
        naive = []
        pos = 0
        for l in sizes:
            if 2 <= l <= 5:
                for i in range(l):
                    for j in range(i + 1, l):
                        naive.append((pos + i, pos + j))
            pos += l
        assert list(zip(ia.tolist(), jb.tolist())) == naive


def test_popcount64_matches_python():
    import numpy as np

    from ferenda_ray.ops.dedup import _popcount64

    rng = np.random.RandomState(11)
    # 32-bit-half domain (simhash halves) plus edge values
    vals = np.r_[rng.randint(0, 2**32, 50, dtype=np.int64),
                 [0, 1, 2**31, 2**32 - 1]]
    got = _popcount64(vals)
    want = [bin(int(v)).count("1") for v in vals]
    assert got.tolist() == want
    assert _popcount64(np.empty(0, np.int64)).tolist() == []
