"""Curation-pipeline tests: composed oracle equality plus invariants
tying the composition to its constituent operators."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * "
              f"FROM read_parquet('{SF}/documents.parquet')")
    return c


def test_curation_pipeline_oracle(ray_session, con):
    from ferenda_ray.pipelines.curate import (CURATION_PIPELINE_SQL,
                                              curation_pipeline)

    mine = (curation_pipeline(SF).to_pandas()
            .sort_values("seq_id").reset_index(drop=True)
            [["seq_id", "n_docs", "n_tokens"]])
    want = (con.sql(CURATION_PIPELINE_SQL).df()
            .sort_values("seq_id").reset_index(drop=True)
            [["seq_id", "n_docs", "n_tokens"]])
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_curation_pipeline_invariants(ray_session, con):
    """Sequences are full except the last; curated token total is below
    the raw corpus total (the gate + mix actually drop something) and
    matches the oracle's mixed-doc token sum exactly."""
    from ferenda_ray.pipelines.curate import curation_pipeline

    got = (curation_pipeline(SF).to_pandas()
           .sort_values("seq_id").reset_index(drop=True))
    assert (got.n_tokens.values[:-1] == 512).all()
    raw_total = con.sql(
        "SELECT sum(len(regexp_extract_all(text, "
        "'[A-Za-z]+|[0-9]{1,3}|[^\\sA-Za-z0-9]'))) FROM documents"
    ).fetchone()[0]
    assert 0 < got.n_tokens.sum() < raw_total


def test_curation_dedup_and_gate_compose(ray_session, tmp_path):
    """A duplicated high-quality doc contributes once; a digit-soup doc
    is gated out entirely (PII redaction runs first, so the digits must
    not look like one long phone number); eval-slice docs (doc_id %
    20 == 0) never reach the corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    prose = ("It is the case that the data for it is in the file and "
             "that it is a good day for the team to review it as planned.")
    junk = "019x 384x 565x 102x 384x 575x 019x 838x 474x 565x 102x 010x"
    tab = pa.table({
        "doc_id": pa.array([20, 1, 2], pa.int64()),
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
        "text": pa.array(["held-out benchmark prose only", prose, junk],
                         pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(str(tmp_path)).to_pandas()
    import re
    n_prose = len(re.findall(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]", prose))
    # prose kept once; junk gated; the eval doc (id 20) excluded
    assert int(got.n_tokens.sum()) == n_prose


def test_curation_decontaminates(ray_session, tmp_path):
    """A corpus doc quoting a 5-gram of the eval slice is dropped; an
    equally prose-like doc with no overlap survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    bench = ("the quick brown fox jumps over a lazy dog while the sun "
             "is high and the day is long for all of the team")
    leak = ("it is known that the quick brown fox jumps over all and "
            "that it is a fine day for the group to rest as planned")
    clean = ("it is the case that the data for it is in the file and "
             "that it is a good day for the team to review it as planned")
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),  # 0 = eval slice
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
        "text": pa.array([bench, leak, clean], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(str(tmp_path)).to_pandas()
    import re
    n_clean = len(re.findall(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]",
                             clean))
    assert int(got.n_tokens.sum()) == n_clean  # leak dropped, clean kept


def test_curation_pii_redacted_features(ray_session, tmp_path):
    """PII runs before everything: a doc whose only distinguishing
    content is an email dedups against its redacted twin (same clean
    text → one survivor)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    a = ("write to alice@example.com for all of the details that the "
         "team needs and it is a good day for it to happen as planned")
    b = ("write to bob.smith@other.org for all of the details that the "
         "team needs and it is a good day for it to happen as planned")
    tab = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["s0", "s0"], pa.string()),
        "text": pa.array([a, b], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(str(tmp_path)).to_pandas()
    assert int(got.n_docs.sum()) == 1  # redacted twins collapse


def test_curation_explicit_benchmark_table(ray_session, tmp_path):
    """The production path: contamination defined by a SEPARATE
    constant-size benchmark table — corpus docs quoting it drop, the
    modulo slice is NOT excluded, and nothing from the benchmark
    itself enters the corpus stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    bench = ("the quick brown fox jumps over a lazy dog while the sun "
             "is high and the day is long for all of the team")
    leak = ("it is known that the quick brown fox jumps over all and "
            "that it is a fine day for the group to rest as planned")
    clean = ("it is the case that the data for it is in the file and "
             "that it is a good day for the team to review it as planned")
    pq.write_table(pa.table({"text": pa.array([bench], pa.string())}),
                   str(tmp_path / "benchmark.parquet"))
    tab = pa.table({
        # doc 20 would be the modulo eval slice; with an explicit
        # benchmark it is ordinary corpus and must survive
        "doc_id": pa.array([20, 1], pa.int64()),
        "source": pa.array(["s0", "s0"], pa.string()),
        "text": pa.array([clean, leak], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(
        str(tmp_path),
        benchmark_parquet=str(tmp_path / "benchmark.parquet")
    ).to_pandas()
    import re
    n_clean = len(re.findall(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]",
                             clean))
    assert int(got.n_tokens.sum()) == n_clean  # leak dropped, 20 kept


def test_benchmark_rows_no_seam_grams(ray_session, tmp_path):
    """Multi-row benchmark tables must NOT emit phantom n-grams
    spanning adjacent benchmark docs (the all-zero doc_id bug): a
    corpus doc whose only 5-gram overlap would be the seam between
    two benchmark rows must survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    # two 3-token benchmark docs; their seam would fabricate the
    # 5-grams "alpha beta gamma delta epsilon" / "beta gamma delta
    # epsilon zeta" if rows shared one doc id
    pq.write_table(
        pa.table({"text": pa.array(["alpha beta gamma",
                                    "delta epsilon zeta"], pa.string())}),
        str(tmp_path / "benchmark.parquet"))
    seam = ("we note alpha beta gamma delta epsilon here and that it "
            "is a good day for the team to review the data as planned")
    tab = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "source": pa.array(["s0"], pa.string()),
        "text": pa.array([seam], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(
        str(tmp_path),
        benchmark_parquet=str(tmp_path / "benchmark.parquet")
    ).to_pandas()
    assert int(got.n_docs.sum()) == 1  # seam gram is phantom: doc kept


def test_gopher_rules_each_rule_flips(ray_session, tmp_path):
    """Crafted docs: one passing all Gopher rules, then one violating
    each rule in isolation; distributed result == DuckDB recompute ==
    hand expectation."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import GOPHER_RULES_SQL, gopher_rules

    good = ("the cat sat with the dog and that was fine to see "
            "because both of them have been friendly today indeed "
            * 5)  # 100 tokens, sane lengths, stopwords present
    docs = {
        0: good,
        1: "the of and short",                        # rule_len (<50)
        2: ("ab " * 30 + "the of and that have with " 
            + "a " * 40).strip(),                     # mean wlen < 3
        3: good + " " + "# " * 30,                    # symbol ratio
        4: "\n".join(["- the of item and that"] * 60),  # bullets
        5: "\n".join(["the of and that more..."] * 60),  # ellipsis ends
        6: good + " " + "123 456 " * 40,              # alpha < 80%
        7: " ".join(["word"] * 80),                   # no stopwords
    }
    tab = pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array([docs[k] for k in docs], pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    got = (gopher_rules(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.sql(GOPHER_RULES_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    assert bool(got.keep[0]) is True
    assert got.keep[1:].sum() == 0
    flipped = {1: "rule_len", 2: "rule_mean_wlen", 3: "rule_symbol",
               4: "rule_bullet", 5: "rule_ellipsis", 6: "rule_alpha",
               7: "rule_stopwords"}
    for i, rule in flipped.items():
        assert not got.loc[i, rule], (i, rule)


def test_normalize_docs_hand_and_fuzz(ray_session, tmp_path):
    """Unicode + whitespace normalization: hand cases pin each rule
    (NFC composition, CRLF, C0 deletion, blank collapse, newline
    blank-stripping, trim), then unicode-soup fuzz proves the Arrow
    kernel chain and the DuckDB recompute are the same function."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import NORMALIZE_DOCS_SQL, normalize_docs

    hand = [
        "école",                      # NFC: e + combining acute
        "a\r\nb\rc",                        # CRLF / CR → LF
        "x\x00y\x07z\x7fw",                 # C0 + DEL deleted
        "a \t  b\tc",                       # blank runs → one space
        "  a  \n   b  \n\nc  ",             # newline blank-strip + trim
        "", " ", "\n\n", "already clean",
    ]
    rng = random.Random(4242)
    soup_chars = ["a", "b", " ", "\t", "\r", "\n", "\r\n", "\x00",
                  "\x1f", "\x7f", "é", "é", "…", "ﬁ", " ",
                  "中", "\x0b", "\x0c"]
    fuzz = ["".join(rng.choice(soup_chars)
                    for _ in range(rng.randint(0, 40)))
            for _ in range(120)]
    docs = hand + fuzz
    tab = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    got = (normalize_docs(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.sql(NORMALIZE_DOCS_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    want["n_chars"] = want["n_chars"].astype("int64")
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    texts = dict(zip(got.doc_id, got.text))
    assert texts[0] == "école" and bool(got.changed[0])
    assert texts[1] == "a\nb\nc"
    assert texts[2] == "xyzw"
    assert texts[3] == "a b c"
    assert texts[4] == "a\nb\n\nc"
    assert texts[5] == "" and texts[6] == "" and texts[7] == ""
    assert texts[8] == "already clean" and not bool(got.changed[8])


def test_quality_budget_head_vs_duckdb(ray_session, tmp_path):
    """Token-budget cut over the (n_pass desc, doc_id) order: hand
    corpus with mixed rule scores and a budget that cuts inside a
    same-score run; distributed composite-bucket prefix-sum == window
    cumsum, and the first excluded doc would have burst the budget."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.ops.text import (quality_budget_head,
                                      quality_budget_head_sql)

    good = ("the cat sat with the dog and that was fine to see "
            "because both of them have been friendly today indeed "
            * 5)  # passes all 7 gopher rules, 100 tokens
    soso = " ".join(["word"] * 80)          # fails stopwords: 6 rules
    tiny = "the of and short"               # fails length too
    docs = []
    for i in range(9):
        docs.append(good if i % 3 == 0 else (soso if i % 3 == 1
                                             else tiny))
    tab = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    budget = 260  # 3 good (300 tokens) burst it: keeps 2 good + ...
    got = (quality_budget_head(str(tmp_path), budget_tokens=budget,
                               id_buckets=3).to_pandas()
           .sort_values("cum_tokens").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.sql(quality_budget_head_sql(budget)).df()
            .sort_values("cum_tokens").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(
            {c: "int64" for c in ("n_pass", "n_tokens",
                                  "cum_tokens")}))
    # the three all-rules docs are 100 tokens each: exactly two fit
    assert got.doc_id.tolist() == [0, 3]
    assert got.cum_tokens.max() <= budget
