"""Operator tests over the driver testdata (sf0.001) — each Ray result
checked against a duckdb-computed expectation (the same comparison the
driver's correctness gate performs)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(ray_res, con, sql, float_cols=()):
    mine = ray_res.to_pandas() if not isinstance(ray_res, pd.DataFrame) else ray_res
    want = con.sql(sql).df()
    assert sorted(mine.columns) == sorted(want.columns)
    mine = mine[sorted(mine.columns)].sort_values(
        sorted(mine.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    assert len(mine) == len(want)
    for c in mine.columns:
        if c in float_cols or mine[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                mine[c].astype(float).round(6), want[c].astype(float).round(6),
                check_names=False)
        else:
            assert (mine[c].astype(str).values == want[c].astype(str).values).all(), c


def test_q1(ray_session, con):
    from ferenda_ray.ops.relational import Q1_SQL, q1_pricing_summary

    _cmp(q1_pricing_summary(SF), con, Q1_SQL)


def test_latest_event(ray_session, con):
    from ferenda_ray.ops.relational import LATEST_EVENT_SQL, latest_event_per_user

    _cmp(latest_event_per_user(SF), con, LATEST_EVENT_SQL)


def test_anti_join(ray_session, con):
    from ferenda_ray.ops.relational import (CUSTOMERS_WITHOUT_EVENTS_SQL,
                                            customers_without_events)

    _cmp(customers_without_events(SF), con, CUSTOMERS_WITHOUT_EVENTS_SQL)


def test_pivot(ray_session, con):
    from ferenda_ray.ops.relational import PIVOT_SQL, pivot_user_event_counts

    _cmp(pivot_user_event_counts(SF), con, PIVOT_SQL)


def test_exact_dedup(ray_session, con):
    from ferenda_ray.ops.dedup import EXACT_DEDUP_SQL, exact_dedup

    _cmp(exact_dedup(SF), con, EXACT_DEDUP_SQL)


def test_token_counts(ray_session, con):
    from ferenda_ray.ops.text import TOKEN_COUNTS_SQL, token_counts

    _cmp(token_counts(SF), con, TOKEN_COUNTS_SQL)


def test_ann_topk(ray_session, con):
    from ferenda_ray.ops.ann import ANN_TOPK_SQL, bruteforce_topk

    _cmp(bruteforce_topk(SF), con, ANN_TOPK_SQL, float_cols=("cos_sim",))


def test_doc_structure_oracle(ray_session, con):
    from ferenda_ray.ops.text import DOC_STRUCTURE_SQL, doc_structure

    _cmp(doc_structure(SF), con, DOC_STRUCTURE_SQL)


def test_doc_structure_oracle_structured(ray_session, tmp_path):
    """The SQL oracle reproduces the FSM counts on text that exercises
    every classification branch (the driver corpus is flat prose):
    dotted/undotted headings, heading-with-rest, adjacent list
    paragraphs folding into one run, indented list markers, and a doc
    with no blocks at all."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import DOC_STRUCTURE_SQL, doc_structure

    texts = [
        # 2 dotted headings (one with rest), plain para, 1 list run
        "1. Intro\nafter heading text\n\nplain para\n\n"
        "- item a\n- item b\n\n- item c\n\n1.2 Sub",
        # undotted heading is a Heading node, not a Section
        "4 Announcement\n\nbody text",
        # indented markers + star markers are still list items
        "  - x\n  * y",
        # whitespace-only → no blocks, still a (0,0,0) row
        "   ",
        # long numbered first line (≥120 chars) is NOT a heading
        "1. " + "x" * 130 + "\n\nnext",
    ]
    tab = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    _cmp(doc_structure(str(tmp_path)), c, DOC_STRUCTURE_SQL)
    got = doc_structure(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert got.n_sections.tolist() == [2, 0, 0, 0, 0]
    assert got.n_lists.tolist() == [1, 0, 1, 0, 0]


def test_tokenize_id_rows_oracle(ray_session, con):
    from ferenda_ray.ops.text import TOKENIZE_ID_ROWS_SQL, tokenize_id_rows

    _cmp(tokenize_id_rows(SF), con, TOKENIZE_ID_ROWS_SQL)


def test_tokenize_ids(ray_session):
    from ferenda_ray.ops.text import VOCAB_SIZE, encode_ids, tokenize_ids

    df = tokenize_ids("/root/testdata/sf0.001", max_len=64).to_pandas()
    assert len(df) == 500
    assert (df.n_tokens > 0).all()
    first = df.sort_values("doc_id").iloc[0]
    assert len(first.input_ids) <= 64
    assert all(0 <= i < VOCAB_SIZE for i in first.input_ids)
    # deterministic across calls/processes
    assert encode_ids("Hello, world 42!") == encode_ids("Hello, world 42!")


def test_repetition_scores_oracle(ray_session, con):
    from ferenda_ray.ops.text import REPETITION_SCORES_SQL, repetition_scores

    _cmp(repetition_scores(SF), con, REPETITION_SCORES_SQL)


def test_repetition_scores_handcheck(ray_session, tmp_path):
    """Hand-computed signals: a doc that is one line repeated and a doc
    with one dominant bigram score high; clean prose scores low."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import repetition_scores

    texts = [
        "spam spam spam spam spam spam",      # top bigram = all bigrams
        "a\nb\nc\nd",                         # all lines distinct
        "x\nx\nx\nx",                         # 1 distinct of 4 lines
        "one two three four five six seven",  # every bigram unique
    ]
    tab = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (repetition_scores(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.frac_top_bigram[0] == 1.0
    assert got.frac_dup_lines[1] == 0.0
    assert abs(got.frac_dup_lines[2] - 0.75) < 1e-12
    assert abs(got.frac_top_bigram[3] - 1 / 6) < 1e-12


def test_pack_sequences_oracle(ray_session, con):
    from ferenda_ray.ops.text import PACK_SEQUENCES_SQL, pack_sequences

    _cmp(pack_sequences(SF), con, PACK_SEQUENCES_SQL)


def test_pack_sequences_vs_single_process(ray_session):
    """Layout pin: the distributed bucket-offset packing equals a
    single-process concat-and-chunk at a non-default max_len — exact
    (seq_id, n_docs, n_tokens) table, and token conservation holds."""
    import re

    import numpy as np
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import pack_sequences

    max_len = 200
    got = (pack_sequences(SF, max_len=max_len, num_buckets=7).to_pandas()
           .sort_values("seq_id").reset_index(drop=True))

    tok_re = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = sorted(zip(tab.column("doc_id").to_pylist(),
                      tab.column("text").to_pylist()))
    exp: dict[int, list[int]] = {}
    pos = 0
    for _d, text in docs:
        n = len(tok_re.findall(text))
        if n == 0:
            continue
        start, end = pos, pos + n
        for seq in range(start // max_len, (end - 1) // max_len + 1):
            dseq = exp.setdefault(seq, [0, 0])
            dseq[0] += 1
            dseq[1] += min(end, (seq + 1) * max_len) - max(start, seq * max_len)
        pos = end
    assert got.seq_id.tolist() == sorted(exp)
    assert got.n_docs.tolist() == [exp[s][0] for s in sorted(exp)]
    assert got.n_tokens.tolist() == [exp[s][1] for s in sorted(exp)]
    assert int(got.n_tokens.sum()) == pos  # token conservation
    # every sequence except the last is exactly full
    assert (got.n_tokens.values[:-1] == max_len).all()


def test_fingerprint_overlap_pairs_oracle(ray_session, con):
    from ferenda_ray.ops.text import (FINGERPRINT_OVERLAP_SQL,
                                      fingerprint_overlap_pairs)

    _cmp(fingerprint_overlap_pairs(SF), con, FINGERPRINT_OVERLAP_SQL)


def test_fingerprint_overlap_handcheck(ray_session, tmp_path):
    """Two docs sharing a verbatim 12-token span must pair; an unrelated
    doc must not; a boilerplate span in >max_df docs must be ignored."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import fingerprint_overlap_pairs

    span = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")
    boiler = "per aspera ad astra semper fidelis carpe diem veni vidi vici"
    texts = [
        f"intro words here {span} and a unique tail one",
        f"completely different start {span} another unique ending two",
        "nothing shared with anyone at all in this one whatsoever really",
    ] + [f"{boiler} filler{i} " * 3 for i in range(25)]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (fingerprint_overlap_pairs(str(tmp_path)).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert (0, 1) in set(zip(got.doc_a, got.doc_b))
    assert not ((got.doc_a == 2) | (got.doc_b == 2)).any()
    # the 25 boilerplate docs share every fingerprint, but df > max_df
    # caps them out of the pair stream
    assert not (got.doc_a >= 3).any()


def test_mix_corpus_oracle(ray_session, con):
    from ferenda_ray.ops.sample import MIX_CORPUS_SQL, mix_corpus

    _cmp(mix_corpus(SF), con, MIX_CORPUS_SQL)


def test_mix_corpus_rebalances(ray_session):
    """Post-mix token totals: within-budget sources keep every doc;
    over-budget sources shrink to ≈ the median source's total."""
    import pyarrow.parquet as pq
    from ferenda_ray.ops.sample import mix_corpus

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    got = mix_corpus(SF).to_pandas()
    pre = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "source", "text"])
    pre["n_tokens"] = pre.text.str.count(r"\S+")
    tot_pre = pre.groupby("source").n_tokens.sum()
    budget = sorted(tot_pre)[(len(tot_pre) - 1) // 2]
    tot_post = got.groupby("source").n_tokens.sum()
    for s, t in tot_pre.items():
        if t <= budget:
            assert tot_post.get(s, 0) == t, s  # kept whole
        else:
            assert tot_post.get(s, 0) <= t, s  # never grows
    # the most over-represented source must actually shrink, and the
    # whole mix must lose tokens
    worst = tot_pre.idxmax()
    assert tot_pre[worst] > budget
    assert tot_post.get(worst, 0) < tot_pre[worst]
    assert tot_post.sum() < tot_pre.sum()


def test_quality_classifier_oracle(ray_session, con):
    from ferenda_ray.ops.text import QUALITY_CLASSIFIER_SQL, quality_classifier

    _cmp(quality_classifier(SF), con, QUALITY_CLASSIFIER_SQL)


def test_quality_classifier_separates(ray_session, tmp_path):
    """Prose scores above the keep threshold; digit soup below it."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import quality_classifier

    texts = [
        "It is the case that the data for it is in the file and "
        "that it is a good day for the team to review it as planned.",
        "0192 3847 5656 1029 3847 5757 0192 8383 4747 5656 1029 0101",
    ]
    tab = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (quality_classifier(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert bool(got.keep[0]) is True
    assert bool(got.keep[1]) is False
    assert got.quality_score[0] > got.quality_score[1]


def test_lm_cross_entropy_oracle(ray_session, con):
    from ferenda_ray.ops.text import LM_CROSS_ENTROPY_SQL, lm_cross_entropy

    _cmp(lm_cross_entropy(SF), con, LM_CROSS_ENTROPY_SQL)


def test_lm_cross_entropy_ordering(ray_session, tmp_path):
    """A doc made of corpus-common tokens must score lower entropy than
    a doc of corpus-unique tokens — the perplexity-filter invariant."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import lm_cross_entropy

    texts = (["common words repeated here"] * 8
             + ["zqx vbn mlk pqr unique gibberish tokens wow"])
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (lm_cross_entropy(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.cross_entropy[0] < got.cross_entropy[8]
    # hand check doc 0: every token has corpus count 8, N = 40
    assert abs(got.cross_entropy[0] - (math.log(40) - math.log(8))) < 1e-9


def test_fingerprint_containment_oracle(ray_session, con):
    from ferenda_ray.ops.text import (FINGERPRINT_CONTAINMENT_SQL,
                                      fingerprint_containment_pairs)

    _cmp(fingerprint_containment_pairs(SF), con,
         FINGERPRINT_CONTAINMENT_SQL)


def test_fingerprint_containment_asymmetry(ray_session, tmp_path):
    """A short doc fully quoted inside a long doc must register ~100%
    containment even though symmetric overlap/Jaccard is small."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ferenda_ray.ops.text import (fingerprint_containment_pairs,
                                      winnow_fingerprint)

    quote = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa")
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(120))
    texts = [quote, f"{filler} {quote} {filler}"]
    tab = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = fingerprint_containment_pairs(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row.doc_a, row.doc_b) == (0, 1)
    assert row.n_a < row.n_b  # genuinely asymmetric sizes
    assert row.containment_pct >= 50


def test_doc_pages_oracle(ray_session, con):
    from ferenda_ray.ops.text import DOC_PAGES_SQL, doc_pages

    _cmp(doc_pages(SF), con, DOC_PAGES_SQL)


def test_doc_pages_dewrap_edge_cases(ray_session, tmp_path):
    """Python dewrap and the SQL oracle agree on the adversarial wrap
    shapes: chained hyphen wraps (ONE consuming pass — 'x-\\ny-\\nz'
    stays 'xy- z', never 'xyz'), soft-wrap chains of any length
    (two-pass RE2 emulation of the lookaround), non-ASCII boundary
    chars (re.ASCII pins Python to RE2's ASCII \\w/\\s), and trailing
    blank pages."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import DOC_PAGES_SQL, dewrap, doc_pages

    texts = [
        "x-\ny-\nz",                      # chained hyphen wrap
        "a\nb\nc\nd\ne",                  # soft-wrap chain (odd length)
        "café-\nlatte and naïve\nwrap",  # non-ASCII boundaries
        "exam-\nple of a hyphen-\nated paragraph\nwrapped hard",
        "page one\ftrailing\f \f\f",        # trailing blank pages
        "first\n\nsecond para\nstill second\fpg2-\nwrap",
    ]
    assert dewrap("x-\ny-\nz") == "xy- z"  # the ADVICE divergence case
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    _cmp(doc_pages(str(tmp_path)), c, DOC_PAGES_SQL)


def test_pack_from_counts_empty(ray_session):
    """An upstream that filters every document (e.g. a strict quality
    gate) yields a typed empty packing result, not a TypeError on the
    None Min/Max aggregate — ADVICE r3 regression."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.ops.text import pack_from_counts

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "n": pa.array([], pa.int64())}))
    got = pack_from_counts(empty)
    assert got.count() == 0
    assert sorted(got.schema().names) == ["n_docs", "n_tokens", "seq_id"]


def test_dsir_scores_oracle(ray_session, con):
    from ferenda_ray.ops.text import DSIR_SCORES_SQL, dsir_scores

    _cmp(dsir_scores(SF), con, DSIR_SCORES_SQL)


def test_dsir_scores_directionality(ray_session, tmp_path):
    """A doc written in the target slice's vocabulary scores higher
    than one written in the raw slice's vocabulary."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import dsir_scores

    tgt_text = "alpha beta gamma delta alpha beta gamma delta"
    raw_text = "one two three four five six seven eight nine ten"
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["src0", "src1", "src1", "src1"], pa.string()),
        "text": pa.array([tgt_text, raw_text, tgt_text, raw_text],
                         pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = (dsir_scores(str(tmp_path)).to_pandas()
           .set_index("doc_id").dsir_weight)
    assert set(got.index) == {1, 2, 3}  # target docs are not scored
    assert got[2] > got[1] and got[2] > got[3]  # target-like wins


def test_doc_pages_dewrap_differential_fuzz(ray_session, tmp_path):
    """Random wrap-shaped texts: the Python operator and the DuckDB
    oracle agree byte-for-byte (pins the round-4 single-pass hyphen
    fix against the whole input space, not just the known cases)."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import DOC_PAGES_SQL, doc_pages

    rng = random.Random(99)
    pieces = ["a", "bb", "ccc", "-", "-\n", "\n", "\n\n", " ", "\f",
              "x-\ny", "p-\nq-\nr", "é", "ü-\nö", "1-\n2", ".-\n."]
    texts = ["".join(rng.choice(pieces)
                     for _ in range(rng.randint(0, 25)))
             for _ in range(300)]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    _cmp(doc_pages(str(tmp_path)), c, DOC_PAGES_SQL)


def test_fp_pair_counts_vs_bruteforce(ray_session):
    """The coarse-bucketed pair miner equals an in-memory brute force
    (df window, max_df cap, exact shared-fp counts) on random
    fingerprint sets."""
    import itertools

    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from ferenda_ray.ops.text import _fp_pair_counts

    rng = np.random.default_rng(13)
    rows = []
    for d in range(40):
        for f in rng.choice(60, size=rng.integers(1, 15),
                            replace=False):
            rows.append((d, int(f)))
    tab = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "fp": pa.array([r[1] for r in rows], pa.int64())})
    max_df = 6
    got = (_fp_pair_counts(rd.from_arrow(tab), max_df).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    by_fp: dict[int, list[int]] = {}
    for d, f in rows:
        by_fp.setdefault(f, []).append(d)
    want: dict[tuple, int] = {}
    for f, docs in by_fp.items():
        docs = sorted(set(docs))
        if 2 <= len(docs) <= max_df:
            for a, b in itertools.combinations(docs, 2):
                want[(a, b)] = want.get((a, b), 0) + 1
    got_map = {(a, b): n for a, b, n in
               zip(got.doc_a, got.doc_b, got.n_shared)}
    assert got_map == want


def test_bigram_pmi_oracle_and_handcheck(ray_session, tmp_path):
    """Synthetic corpus where the PMI values are hand-derivable, plus
    the exact-SQL comparison on the same input (min_count=5 default:
    'a b' repeats clear it, singletons don't)."""
    import math

    import duckdb
    import pyarrow.parquet as pq

    import pyarrow as pa

    from ferenda_ray.ops.text import BIGRAM_PMI_SQL, bigram_pmi

    texts = [
        "a b " * 6,              # 'a b' ×6, 'b a' ×5
        "c d " * 7,              # 'c d' ×7, 'd c' ×6
        "x y",                   # below min_count, margins still count
        "",                      # no tokens at all
    ]
    tab = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    got = bigram_pmi(str(tmp_path)).to_pandas()
    _cmp(got, c, BIGRAM_PMI_SQL)
    got = got.set_index(["w1", "w2"])
    # stream: 11 'a b'-doc bigrams + 13 'c d'-doc bigrams + 1 'x y' = 25
    assert set(got.index) == {("a", "b"), ("b", "a"), ("c", "d"),
                              ("d", "c")}
    assert got.loc[("a", "b"), "n_pair"] == 6
    # margins in the bigram stream: c1('a')=6 ('a' only starts 'a b'),
    # c2('b')=6; pmi = ln(6·25/(6·6))
    assert abs(got.loc[("a", "b"), "pmi"]
               - math.log(6 * 25 / 36)) < 1e-12
    assert abs(got.loc[("c", "d"), "pmi"]
               - math.log(7 * 25 / (7 * 7))) < 1e-12


def test_bigram_pmi_sf(ray_session, con):
    from ferenda_ray.ops.text import BIGRAM_PMI_SQL, bigram_pmi

    _cmp(bigram_pmi(SF), con, BIGRAM_PMI_SQL)


def test_bigram_pmi_differential_fuzz(ray_session, tmp_path):
    """Seeded random corpora: the three-exchange BSP path equals the
    one-query DuckDB recompute on every draw (margins computed before
    the min_count filter, pmi association order, empty docs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb

    from ferenda_ray.ops.text import BIGRAM_PMI_SQL, bigram_pmi

    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        texts = []
        for _ in range(40):
            n = int(rng.integers(0, 30))
            texts.append(" ".join(rng.choice(vocab, n)))
        texts.append("")  # always one empty doc
        d = tmp_path / f"t{trial}"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            str(d / "documents.parquet"))
        c = duckdb.connect()
        c.execute(f"CREATE VIEW documents AS SELECT * FROM "
                  f"read_parquet('{d}/documents.parquet')")
        _cmp(bigram_pmi(str(d), min_count=5, num_buckets=7), c,
             BIGRAM_PMI_SQL)
