"""Benchmark decontamination + PII redaction (ops/decontam.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ferenda_ray.ops import decontam


def test_gram_hashes_distinct_and_stable():
    h1 = decontam._gram_hashes("a b c d e f")  # two 5-grams
    assert len(h1) == 2
    assert sorted(h1) == sorted(decontam._gram_hashes("a b c d e f"))
    assert len(decontam._gram_hashes("a b c")) == 0  # shorter than n
    # repeated n-gram counted once (set semantics)
    rep = decontam._gram_hashes("x y z w v " * 3)
    assert len(rep) == len(set(rep))


def test_decontaminate_matches_bruteforce(ray_session, tmp_path):
    """Distributed bloom+confirm equals a python brute force on a
    corpus with planted eval overlaps."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(60)]
    texts[3] = texts[0]            # doc 3 shares all grams with eval doc 0
    texts[41] = texts[20] + " zz"  # doc 41 overlaps eval doc 20
    tab = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    import pyarrow.parquet as pq

    pq.write_table(tab, tmp_path / "documents.parquet")

    got = decontam.decontaminate(str(tmp_path), num_buckets=4).to_pandas()

    # brute force
    grams = {i: set(map(int, decontam._gram_hashes(t)))
             for i, t in enumerate(texts)}
    eval_union = set().union(*(grams[i] for i in range(60)
                               if i % decontam.EVAL_MOD == 0))
    want = {i: len(grams[i] & eval_union) for i in range(60)
            if i % decontam.EVAL_MOD != 0 and grams[i] & eval_union}
    assert dict(zip(got.doc_id, got.n_contaminated)) == want
    assert 3 in want and 41 in want


def test_redact_pii_patterns(ray_session, tmp_path):
    texts = [
        "contact alice.smith+x@example-corp.org today",
        "call +1 (555) 123-4567 or 08-123 456 78 now",
        "server at 192.168.0.1 and 10.0.0.255 up",
        "clean text with no pii at all",
    ]
    tab = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    import pyarrow.parquet as pq

    pq.write_table(tab, tmp_path / "documents.parquet")
    out = (decontam.redact_pii(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "n_emails"] == 1
    assert "<EMAIL>" in out.loc[0, "clean"]
    assert "alice" not in out.loc[0, "clean"]
    assert out.loc[1, "n_phones"] >= 1
    assert "<PHONE>" in out.loc[1, "clean"]
    assert out.loc[2, "n_ips"] == 2
    assert out.loc[2, "clean"].count("<IP>") == 2
    assert out.loc[3, "clean"] == texts[3]
    assert (out.loc[3, ["n_emails", "n_phones", "n_ips"]] == 0).all()


def test_redact_pii_duckdb_parity(ray_session, tmp_path):
    """Arrow RE2 kernels and DuckDB regexp_* agree on the same pattern
    strings (both engines are RE2) — the oracle's premise."""
    import duckdb
    import pyarrow.parquet as pq

    texts = ["x a@b.io y 1.2.3.4", "nothing", "+46 70 123 45 67 ok",
             "two mails a@b.co c@d.se and ip 255.255.255.255"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tab, tmp_path / "documents.parquet")
    mine = (decontam.redact_pii(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.sql(decontam.REDACT_PII_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(mine[want.columns], want)


def test_gram_hash_rows_matches_per_doc_reference(ray_session):
    """The batched vectorized gram hasher equals a pure-python
    per-doc reference on gram COUNTS (distinct n-tuples) and never
    leaks windows across doc boundaries."""
    import random

    import pyarrow as pa

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 14)))
             for _ in range(60)]
    tab = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = decontam.gram_hash_rows(tab).to_pandas()
    per_doc = got.groupby("doc_id").size().to_dict()
    for i, t in enumerate(texts):
        toks = t.split()
        want = len({tuple(toks[j:j + decontam.NGRAM_N])
                    for j in range(len(toks) - decontam.NGRAM_N + 1)})
        assert per_doc.get(i, 0) == want, (i, t)
    # same gram in two docs -> same hash (the whole point)
    tab2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["a b c d e", "x a b c d e y"],
                                      pa.string())})
    g2 = decontam.gram_hash_rows(tab2).to_pandas()
    shared = set(g2[g2.doc_id == 1].gram) & set(g2[g2.doc_id == 2].gram)
    assert len(shared) == 1
