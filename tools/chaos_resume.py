"""Checkpoint-resume chaos probe: run the KG pipeline, SIGKILL the
whole process group mid-flight, rerun with resume=True, and verify the
final triple table is IDENTICAL to an uninterrupted run.

Usage: PYTHONPATH=/root/repo python tools/chaos_resume.py [n_pages] [kill_after_s]
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_SNIPPET = """
import ray, sys
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from ferenda_ray.pipelines.kg import run_kg_pipeline
m = run_kg_pipeline(sys.argv[1], sys.argv[2], num_buckets=16, batch_size=64)
print("DONE", len(m))
ray.shutdown()
"""


def run_to_completion(pages: str, out: str) -> None:
    subprocess.run([sys.executable, "-c", RUN_SNIPPET, pages, out],
                   check=True, capture_output=True, text=True,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_kill(pages: str, out: str, kill_after: float) -> bool:
    """Start the run in its own process group, SIGKILL it after
    ``kill_after`` seconds. Returns True if it was actually killed
    (False = it finished first)."""
    p = subprocess.Popen([sys.executable, "-c", RUN_SNIPPET, pages, out],
                         start_new_session=True,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        p.wait(timeout=kill_after)
        return False
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
        time.sleep(2)  # let ray's raylet notice
        return True


def table_fingerprint(out_dir: str):
    import hashlib

    import pyarrow.dataset as pads

    t = pads.dataset(out_dir).to_table()
    import pandas as pd

    df = t.to_pandas().sort_values(list(t.column_names),
                                   kind="mergesort").reset_index(drop=True)
    return len(df), hashlib.sha1(
        df.to_csv(index=False).encode()).hexdigest()


def main(n_pages: int = 2000, kill_after: float = 6.0) -> dict:
    import shutil

    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    base = "/tmp/ferenda_chaos"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    pages = os.path.join(base, "pages.parquet")
    pq.write_table(corpus_table(n_pages), pages)

    ref_out = os.path.join(base, "ref")
    run_to_completion(pages, ref_out)
    ref_n, ref_h = table_fingerprint(ref_out)

    chaos_out = os.path.join(base, "chaos")
    killed = run_and_kill(pages, chaos_out, kill_after)
    # leftover stage dirs from the killed run are transient by design
    run_to_completion(pages, chaos_out)
    got_n, got_h = table_fingerprint(chaos_out)

    return {"killed_mid_run": killed, "n_pages": n_pages,
            "rows_ref": ref_n, "rows_resumed": got_n,
            "identical": (ref_n, ref_h) == (got_n, got_h)}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    print(json.dumps(main(n, k)))
