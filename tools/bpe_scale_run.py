"""Measure the actor-sharded BPE trainer at realistic merge counts
(VERDICT r4 #7): 30k merges over a deterministic large-vocabulary
corpus; reports wall and mean pair-count-delta size per 1k-merge bin
(the incremental design predicts deltas SHRINK as merges rarefy).

The sf* documents tables carry only ~31 distinct alpha words (synthetic
text), so this tool synthesizes its own corpus: 60k distinct
syllable-structured words with Zipf-ish counts — the shape a real
tokenizer-training vocabulary has.

Usage: PYTHONPATH=/root/repo python tools/bpe_scale_run.py [n_merges]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(path: str, n_words: int = 60000) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(0)
    cons = list("bcdfghjklmnprstvz")
    vows = list("aeiou")
    syll = [c + v for c in cons for v in vows]          # 85 syllables
    words = set()
    while len(words) < n_words:
        k = rng.randint(2, 6)
        words.add("".join(rng.choice(syll) for _ in range(k)))
    words = sorted(words)
    # Zipf-ish counts, capped so the corpus stays ~1M tokens
    counts = np.minimum((2000 / np.arange(1, n_words + 1) ** 0.7)
                        .astype(int) + 1, 200)
    rows, buf, size = [], [], 0
    for w, c in zip(words, counts):
        buf.extend([w] * int(c))
        size += int(c)
        if size >= 2000:
            rows.append(" ".join(buf))
            buf, size = [], 0
    if buf:
        rows.append(" ".join(buf))
    pq.write_table(pa.table({"text": pa.array(rows, pa.string())}),
                   os.path.join(path, "documents.parquet"))


def main(sf_dir: str, n: int) -> None:
    from ferenda_ray.ops.bpe import bpe_train

    stats: list = []
    t0 = time.perf_counter()
    merges = bpe_train(sf_dir, num_merges=n, round_stats=stats)
    wall = time.perf_counter() - t0
    print(f"merges learned: {len(merges)} / {n} requested; "
          f"wall {wall:.1f}s = {len(merges) / wall:.0f} merges/s")
    print(f"{'bin':>12} {'mean_delta':>11} {'max_delta':>10} {'min_freq':>9}")
    for lo in range(0, len(stats), 2000):
        b = stats[lo:lo + 2000]
        print(f"{lo:>6}-{lo + len(b):<5} "
              f"{sum(x[1] for x in b) / len(b):>10.1f} "
              f"{max(x[1] for x in b):>10} "
              f"{min(x[2] for x in b):>9}")


if __name__ == "__main__":
    import tempfile

    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
        logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        with tempfile.TemporaryDirectory() as d:
            synth_corpus(d)
            main(d, n)
    finally:
        ray.shutdown()
