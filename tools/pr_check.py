"""Triple-set precision/recall harness (the BASELINE P/R ≥ 0.95 gate).

Computes the expected triple set with a SINGLE-PROCESS oracle pipeline —
a plain Python loop over the same per-row semantics (extract → FSM parse
→ triple emit → link → canonicalize → set-dedup), no Ray — and compares
it against the DISTRIBUTED pipeline's materialized output. This
separates distributed-execution correctness (snapshot filtering,
shuffle, dedup survivor, checkpoint-resume) from per-row parse
semantics, which the golden fixtures in tests/ pin (reference analog:
``testutil.py:648-668`` distill_test graph comparison).

Usage: PYTHONPATH=/root/repo python tools/pr_check.py [n_pages]
Prints one JSON line: {"precision": ..., "recall": ..., "f1": ...,
"expected": N, "got": N, "n_pages": N}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY = ("subj", "pred", "obj", "obj_is_uri", "lang", "datatype")


def oracle_triples(n_pages: int) -> set[tuple]:
    """Sequential reference implementation over the synthetic corpus."""
    from ferenda_ray import schemas as S
    from ferenda_ray.pipelines.kg import _ref_triple, default_link_state
    from ferenda_ray.sources import pages as pgen
    from ferenda_ray.stages.extract import extract_page
    from ferenda_ray.stages.link import _MENTION, EntityLinker, scan_citations
    from ferenda_ray.stages.structure import parse_blocks, sections_rows
    from ferenda_ray.stages.triples import doc_triples

    alias, (uris, matrix), canon = default_link_state()
    linker = EntityLinker(alias, uris, matrix)

    out: set[tuple] = set()
    for i in range(n_pages):
        rows = pgen.gen_rows(i)
        # latest-per-url: gen_rows returns newest first; enforce by ts
        newest = max(rows, key=lambda r: r["warc_ts"])
        lang, title, text, blocks = extract_page(newest["html"])
        lang = lang or newest["lang"] or ""
        tree = parse_blocks(blocks)
        url = newest["url"]
        trips = doc_triples(url, newest["warc_ts"], lang, title, tree)
        for sec in sections_rows(url, tree, title):
            about, sec_text = sec["about"], sec["text"]
            for target in scan_citations(sec_text):
                trips.append(_ref_triple(about, S.DCT_REFERENCES, target, url))
            for m in _MENTION.finditer(sec_text):
                uri = linker.link(m.group(1))
                if uri is not None:
                    trips.append(_ref_triple(about, S.DCT_SUBJECT, uri, url))
        for t in trips:
            subj = canon.get(t["subj"], t["subj"])
            obj = (canon.get(t["obj"], t["obj"]) if t["obj_is_uri"]
                   else t["obj"])
            out.add((subj, t["pred"], obj, t["obj_is_uri"], t["lang"],
                     t["datatype"]))
    return out


def pipeline_triples(n_pages: int, out_dir: str) -> set[tuple]:
    """The distributed pipeline's materialized triple set."""
    import shutil

    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.kg import run_kg_pipeline
    from ferenda_ray.sources.pages import corpus_table
    from ferenda_ray.stages.materialize import read_triples

    pages_path = os.path.join(out_dir, "pages.parquet")
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(corpus_table(n_pages), pages_path)
    kg_out = os.path.join(out_dir, "kg")
    shutil.rmtree(kg_out, ignore_errors=True)
    run_kg_pipeline(pages_path, kg_out, num_buckets=16, batch_size=64)
    df = read_triples(kg_out).to_pandas()
    return set(map(tuple, df[list(KEY)].itertuples(index=False, name=None)))


def main(n_pages: int = 200) -> dict:
    out_dir = f"/tmp/ferenda_ray_prcheck/{n_pages}"
    got = pipeline_triples(n_pages, out_dir)
    expected = oracle_triples(n_pages)
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    res = {"precision": round(precision, 6), "recall": round(recall, 6),
           "f1": round(f1, 6), "expected": len(expected), "got": len(got),
           "n_pages": n_pages}
    if precision < 1.0 or recall < 1.0:
        fp = list(got - expected)[:5]
        fn = list(expected - got)[:5]
        res["sample_false_positives"] = fp
        res["sample_false_negatives"] = fn
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        print(json.dumps(main(n)))
    finally:
        ray.shutdown()
