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
    is gated out entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.curate import curation_pipeline

    prose = ("It is the case that the data for it is in the file and "
             "that it is a good day for the team to review it as planned.")
    junk = "0192 3847 5656 1029 3847 5757 0192 8383 4747 5656 1029 0101"
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
        "text": pa.array([prose, prose, junk], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = curation_pipeline(str(tmp_path)).to_pandas()
    import re
    n_prose = len(re.findall(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]", prose))
    assert int(got.n_tokens.sum()) == n_prose  # one copy, junk dropped
