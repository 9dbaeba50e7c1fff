"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline = the flagship KG-construction pipeline (extract → FSM parse →
entity-link → canonicalize → dedup-materialize) over a deterministic
synthetic pages corpus sized to the scale factor; ``value`` is its wall
time, with triples/sec (the BASELINE.json metric) reported alongside.

``--scaling``: runs the headline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs plus scaling efficiency = (T8/T32)/(32/8) — the sandbox
evidence for the two-cluster-size criterion (see BASELINE.md §3).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Fair cluster-size simulation: 1 intra-task thread, like multi-node
# workers (see ferenda_ray._configure_threads). Must be set before
# ferenda_ray/polars import; inherited by Ray workers + subprocesses.
os.environ["FERENDA_RAY_PIN_THREADS"] = "1"
os.environ.setdefault("POLARS_MAX_THREADS", "1")
if os.path.isdir("/dev/shm"):
    # transient dedup-stage fragments on tmpfs: the sandbox's virtio
    # disk has high-variance IO that otherwise dominates the bench
    os.environ.setdefault("FERENDA_RAY_STAGE_ROOT", "/dev/shm")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Best-of-N per query/headline (VERDICT r3 #1: separate host noise from
# regressions). 2 keeps one bench invocation within the driver's budget
# while still discarding one-off stalls; the scaling mode forces 1 so a
# pair stays one-run-vs-one-run.
REPS = max(1, int(os.environ.get("GRAFT_BENCH_REPS", "2")))

N_PAGES = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 200000}
METRIC = ("triples/sec end-to-end (extract→link→canonicalize→materialize) "
          "on Common-Crawl-style Parquet web pages")


def sf_name() -> str:
    return os.path.basename(SF_DIR.rstrip("/")) or "sf0.1"


def _corpus_rev() -> str:
    """Digest of the corpus-generator sources: a generator change must
    regenerate the cached bench corpus, not silently measure a stale
    one (found in round 4 — the EU-grammar corpus change didn't reach
    the cached 200k/500k bench inputs)."""
    import hashlib

    h = hashlib.sha1()
    for f in ("ferenda_ray/sources/pages.py",
              "ferenda_ray/sources/entities.py"):
        with open(os.path.join(REPO, f), "rb") as fp:
            h.update(fp.read())
    return h.hexdigest()[:8]


def corpus_path(n_pages: int) -> str:
    """Materialize the deterministic corpus once per (size, generator
    revision) — untimed. Stale-revision corpora of the same size are
    pruned (a 200k-page parquet per generator edit would otherwise
    accumulate in the shared /tmp)."""
    import glob

    path = f"/tmp/ferenda_ray_bench/pages_{n_pages}_{_corpus_rev()}"
    done = os.path.join(path, "_done")
    if not os.path.exists(done):
        from ferenda_ray.sources.pages import generate_corpus_ds

        for stale in glob.glob(
                f"/tmp/ferenda_ray_bench/pages_{n_pages}*"):
            shutil.rmtree(stale, ignore_errors=True)
        generate_corpus_ds(n_pages).write_parquet(path)
        open(done, "w").write("ok")
    return path


def probe_pages_per_sec() -> float:
    """Single-process fused-stage probe (BASELINE §6): the host-speed
    anchor recorded ALONGSIDE every bench so cross-session drift is
    separable from code regressions — the shared VM swings ±30%
    between sessions and ±2-4x per query within one (BASELINE §8).
    Threads are pinned by the env set at module import, so this is one
    core's throughput."""
    from ferenda_ray.pipelines.kg import pages_to_triples_batch
    from ferenda_ray.sources.pages import corpus_table

    tab = corpus_table(2000)
    pages_to_triples_batch(tab.slice(0, 64))  # warm per-process state
    t0 = time.perf_counter()
    pages_to_triples_batch(tab)
    return round(2000 / (time.perf_counter() - t0), 1)


def run_kg(n_pages: int) -> dict:
    from ferenda_ray.pipelines.kg import build_triples_ds, run_kg_pipeline

    pages = corpus_path(n_pages)
    # Untimed warmup so the timed section measures steady-state
    # throughput (the BASELINE metric), not one-time cluster spin-up:
    # spawns the worker pool + per-worker imports, fills the parquet
    # metadata cache for the bench path, and exercises the full chain
    # once on a small slice.
    import ray.data as rd

    rd.read_parquet(pages).count()
    warm = corpus_path(min(2000, n_pages))
    build_triples_ds(warm, batch_size=128).count()
    out_root = ("/dev/shm/ferenda_ray_bench" if os.path.isdir("/dev/shm")
                else "/tmp/ferenda_ray_bench")
    out_dir = f"{out_root}/out_{n_pages}_{NUM_CPUS}"
    best, triples = None, 0
    for _ in range(REPS):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        manifest = run_kg_pipeline(
            pages, out_dir,
            num_buckets=64,
            batch_size=128,
            resume=False,
        )
        wall = time.perf_counter() - t0
        triples = int(manifest.n_triples.sum())
        best = wall if best is None else min(best, wall)
    shutil.rmtree(out_dir, ignore_errors=True)  # don't fill tmpfs
    return {"sec": round(best, 3), "triples": triples,
            "triples_per_sec": round(triples / best, 1), "pages": n_pages}


def run_queries() -> dict[str, float]:
    """A representative operator slice over the sf tables."""
    from ferenda_ray.ops import (ann, dedup, relational as rel, sketch,
                                 text, windows as win)
    from ferenda_ray.pipelines import curate

    out: dict[str, float] = {}
    for name, fn in [
        ("q1_pricing_summary", rel.q1_pricing_summary),
        ("latest_event_per_user", rel.latest_event_per_user),
        ("pivot_user_event_counts", rel.pivot_user_event_counts),
        ("exact_dedup", dedup.exact_dedup),
        ("token_counts", text.token_counts),
        ("minhash_dedup_pairs", dedup.minhash_dedup_pairs),
        ("ann_topk", ann.bruteforce_topk),
        ("events_asof_orders", win.events_asof_orders),
        ("user_sessions", win.user_sessions),
        ("props_stats", rel.props_stats),
        ("top_terms", sketch.top_terms),
        ("value_quantiles", sketch.value_quantiles),
        ("pack_sequences", text.pack_sequences),
        ("quality_classifier", text.quality_classifier),
        ("lm_cross_entropy", text.lm_cross_entropy),
        ("hopping_window_stats", win.hopping_window_stats),
        # round-4 additions to the recorded slice
        ("dsir_scores", text.dsir_scores),
        ("paragraph_dup_stats", dedup.paragraph_dup_stats),
        ("curation_pipeline", curate.curation_pipeline),
    ]:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            # consume (count) to force execution without materializing
            import pandas as pd

            if isinstance(res, pd.DataFrame):
                _ = len(res)
            else:
                _ = res.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # the result is fully consumed; free any stage-tier spill
            # dirs this query registered so a full bench session does
            # not accumulate per-query derived-data copies (outside
            # the timed region for cross-round comparability)
            from ferenda_ray import bsp

            bsp.release_spills()
        out[name] = round(best, 3)

    # web-corpus slice: the crawl-side curation ops over the SAME
    # 200k-page bench corpus the flagship consumes (added in the r5
    # closing session; new keys only — prior keys stay comparable)
    from ferenda_ray.ops import web

    pages = corpus_path(N_PAGES.get(sf_name(), 20000))
    for name, fn in [
        ("c4_line_rules", web.c4_line_rules),
        ("host_quality", web.host_quality),
        ("canonical_latest", web.canonical_latest),
    ]:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = fn(pages).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def bench_once() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        probe = probe_pages_per_sec()
        n_pages = N_PAGES.get(sf_name(), 20000)
        kg = run_kg(n_pages)
        queries = run_queries()
        queries["kg_pipeline"] = kg["sec"]
        return {
            "metric": METRIC,
            "value": kg["sec"],
            "unit": "sec",
            "queries": queries,
            "sf": sf_name(),
            "num_cpus": NUM_CPUS,
            "pages": kg["pages"],
            "triples_out": kg["triples"],
            "triples_per_sec": kg["triples_per_sec"],
            "reps": REPS,
            "probe_pages_per_sec": probe,
        }
    finally:
        import ray

        ray.shutdown()


def bench_scaling() -> dict:
    """Fresh-process runs at N and 4N CPUs on the same input
    ($GRAFT_SCALING_PAIR, default \"8,32\")."""
    # Default pair 2→8: on this single box, per-core memory bandwidth
    # degrades ~1.44x by 32 concurrent workers (measured with a
    # Ray-free probe, BASELINE.md §5), so higher pairs measure the
    # host's bandwidth ceiling, not the engine. A real 4x-node cluster
    # adds bandwidth with nodes. 8→32 numbers are also reported there.
    n_lo, n_hi = (int(x) for x in
                  os.environ.get("GRAFT_SCALING_PAIR", "2,8").split(","))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=SF_DIR, GRAFT_BENCH_REPS="1")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(n_lo), run(n_hi)
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    return {
        "metric": f"scaling efficiency, num_cpus {n_lo} → {n_hi} "
                  "(fresh processes, same input)",
        f"sec_{n_lo}": lo["value"],
        f"sec_{n_hi}": hi["value"],
        f"triples_per_sec_{n_lo}": lo["triples_per_sec"],
        f"triples_per_sec_{n_hi}": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": sf_name(),
        "pages": lo["pages"],
        # host-speed anchors of the two legs (drift within the pair
        # shows up as a probe delta, not a phantom efficiency change)
        f"probe_{n_lo}": lo.get("probe_pages_per_sec"),
        f"probe_{n_hi}": hi.get("probe_pages_per_sec"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_once()))
