"""CLI end-to-end smoke (subprocess; owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    # cap the subprocess Ray session: it runs NEXT TO the session-scoped
    # pytest Ray session, and two unbounded local sessions contending
    # for the whole machine flaked this test under full-suite load
    out = subprocess.run(
        [sys.executable, "-m", "ferenda_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local",
             "FERENDA_RAY_CLI_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()


@pytest.mark.cli
def test_cli_run_status_dump(tmp_path):
    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    pages = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(30), pages)
    out = str(tmp_path / "kg")

    res = json.loads(run_cli("run", "--pages", pages, "--out", out,
                             "--buckets", "4")[-1])
    assert res["buckets_written"] == 4 and res["triples"] > 0

    st = json.loads(run_cli("status", "--out", out)[-1])
    assert st["buckets_done"] == 4 and st["triples"] == res["triples"]

    lines = run_cli("dump", "--out", out, "--limit", "5")
    nt = [line for line in lines if line.startswith("<")]
    assert len(nt) == 5 and all(line.endswith(" .") for line in nt)


@pytest.mark.cli
def test_cli_setup_scaffold(tmp_path):
    d = str(tmp_path / "proj")
    res = json.loads(run_cli("setup", "--dir", d)[-1])
    assert res["created"].endswith("ferenda_ray.ini")
    body = open(res["created"]).read()
    assert "steps = extract, structure, triples, canonicalize" in body
    # refuses overwrite without --force
    out = subprocess.run(
        [sys.executable, "-m", "ferenda_ray.cli", "setup", "--dir", d],
        capture_output=True, text=True, cwd=REPO, timeout=60)
    assert out.returncode == 1
    json.loads(run_cli("setup", "--dir", d, "--force")[-1])


@pytest.mark.cli
def test_cli_dedup_report_and_dsir(tmp_path):
    """The round-4 curation CLI surface: paragraph-dup report, cluster
    resolution, and DSIR scoring all run end-to-end and write parquet."""
    import shutil

    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                tmp_path / "documents.parquet")
    docs = str(tmp_path / "documents.parquet")
    out = run_cli("dedup-report", "--documents", docs,
                  "--out", str(tmp_path / "pdup"))
    assert json.loads(out[-1])["rows"] == 500
    out = run_cli("dedup-report", "--documents", docs, "--resolve",
                  "--out", str(tmp_path / "keep"))
    assert json.loads(out[-1])["rows"] > 0
    out = run_cli("dsir", "--documents", docs, "--target", "src0",
                  "--out", str(tmp_path / "dsir"))
    assert json.loads(out[-1])["rows"] == 475  # non-target docs


@pytest.mark.cli
def test_cli_kcore_and_collocations(tmp_path):
    """Late-r5 CLI surface: graph k-core over a materialized triples
    dir, and bigram-PMI collocations over a documents table."""
    import shutil

    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    pages = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(30), pages)
    out = str(tmp_path / "kg")
    run_cli("run", "--pages", pages, "--out", out, "--buckets", "4")
    res = json.loads(run_cli("kcore", "--triples", out, "--k", "2",
                             "--out", str(tmp_path / "core"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("kcore", "--triples", out, "--coreness",
                             "--out", str(tmp_path / "coreness"))[-1])
    assert res["rows"] >= json.loads(
        run_cli("kcore", "--triples", out, "--k", "1",
                "--out", str(tmp_path / "core1"))[-1])["rows"]

    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                tmp_path / "documents.parquet")
    res = json.loads(run_cli(
        "collocations", "--documents",
        str(tmp_path / "documents.parquet"),
        "--out", str(tmp_path / "pmi"))[-1])
    assert res["rows"] == 900
    res = json.loads(run_cli(
        "normalize", "--documents",
        str(tmp_path / "documents.parquet"),
        "--out", str(tmp_path / "norm"))[-1])
    assert res["rows"] == 500


def test_cli_graph_and_hoststats(tmp_path):
    """Final-session CLI surface: pairwise/per-node graph reports and
    host-level corpus stats."""
    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    pages = str(tmp_path / "pages.parquet")
    pq.write_table(corpus_table(30), pages)
    out = str(tmp_path / "kg")
    run_cli("run", "--pages", pages, "--out", out, "--buckets", "4")
    for what in ("cocitations", "adamic-adar", "link-prediction",
                 "triangles", "host-graph"):
        res = json.loads(run_cli(
            "graph", "--triples", out, "--what", what,
            "--out", str(tmp_path / f"g_{what}"))[-1])
        assert res["rows"] > 0, what
    for what in ("ppr", "bfs-hops"):
        res = json.loads(run_cli(
            "graph", "--triples", out, "--what", what,
            "--seed-host", "www.site000.example.org",
            "--out", str(tmp_path / f"g_{what}"))[-1])
        assert res["rows"] > 0, what
    res = json.loads(run_cli("hoststats", "--pages", pages,
                             "--out", str(tmp_path / "hs"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("c4", "--pages", pages,
                             "--out", str(tmp_path / "c4"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("c4", "--pages", pages, "--by-host",
                             "--out", str(tmp_path / "c4h"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("hostlangs", "--pages", pages,
                             "--out", str(tmp_path / "hl"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("hoststats", "--pages", pages, "--crawl",
                             "--out", str(tmp_path / "hc"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("canonlatest", "--pages", pages,
                             "--out", str(tmp_path / "cl"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("gate", "--pages", pages,
                             "--out", str(tmp_path / "gated"))[-1])
    assert res["rows"] > 0
    res = json.loads(run_cli("curate-crawl", "--pages", pages,
                             "--out", str(tmp_path / "curated"))[-1])
    assert res["rows"] > 0
