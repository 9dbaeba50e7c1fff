"""CLI entry point — the ``ferenda-build.py`` analog
(reference ``ferenda/manager.py:467-668`` alias→action dispatch), one
subcommand per pipeline stage/product:

    python -m ferenda_ray.cli run      --pages P --out D [--buckets N]
    python -m ferenda_ray.cli sections --pages P --out D
    python -m ferenda_ray.cli generate --pages P --out D
    python -m ferenda_ray.cli ntdump   --pages P --out D
    python -m ferenda_ray.cli status   --out D
    python -m ferenda_ray.cli profile  --table T.parquet --columns c1 c2
    python -m ferenda_ray.cli curate   --documents documents.parquet --out D
    python -m ferenda_ray.cli gen-corpus --out D --pages-count N

Owns its Ray session (ray.init/shutdown) — library code never does.
On a cluster, submit with ``ray job submit -- python -m ferenda_ray.cli
run --pages s3://... --out s3://...`` (the run is resumable: finished
buckets are skipped via the partition manifest).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import os

    import ray

    if not ray.is_initialized():
        # FERENDA_RAY_CLI_CPUS caps the session (tests run the CLI as a
        # subprocess NEXT TO the pytest Ray session — two unbounded
        # local sessions contend for the whole machine and flake)
        cpus = os.environ.get("FERENDA_RAY_CLI_CPUS")
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR",
                 num_cpus=int(cpus) if cpus else None)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_run(args) -> int:
    from ferenda_ray.pipelines.kg import run_kg_pipeline

    if args.incremental:
        # crawl-delta merge into an existing table (reference needed()
        # mtime-gating analog): --pages is the DELTA, re-crawled urls
        # supersede their old triples, untouched buckets see zero write
        from ferenda_ray.pipelines.kg import build_triples_ds
        from ferenda_ray.stages.materialize import materialize_incremental

        man = materialize_incremental(
            build_triples_ds(args.pages, batch_size=args.batch_size),
            args.out, num_buckets=args.buckets)
        print(json.dumps({
            "buckets_rewritten": len(man),
            "triples_in_rewritten": (int(man.n_triples.sum())
                                     if len(man) else 0)}))
        return 0
    if args.config:
        # config-driven assembly (ferenda.ini analog, SURVEY §2.10):
        # the INI picks/parameterizes the stage chain, the two-phase
        # dedup-materialize sink stays the same
        from ferenda_ray.registry import assemble
        from ferenda_ray.stages import materialize as mat

        ds = assemble(args.pages, args.config)
        man = mat.materialize(ds, args.out, num_buckets=args.buckets,
                              resume=not args.no_resume)
        print(json.dumps({
            "buckets_written": len(man),
            "triples": int(man.n_triples.sum()) if len(man) else 0}))
        return 0
    man = run_kg_pipeline(args.pages, args.out, num_buckets=args.buckets,
                          batch_size=args.batch_size,
                          resume=not args.no_resume)
    print(json.dumps({"buckets_written": len(man),
                      "triples": int(man.n_triples.sum()) if len(man) else 0}))
    return 0


def cmd_sections(args) -> int:
    from ferenda_ray.pipelines.kg import build_sections_ds
    from ferenda_ray.stages.materialize import materialize_table

    man = materialize_table(
        build_sections_ds(args.pages, batch_size=args.batch_size),
        args.out, key_cols=["about"], num_buckets=32)
    print(json.dumps({"out": args.out, "buckets_written": len(man),
                      "rows": int(man.n_rows.sum()) if len(man) else 0}))
    return 0


def cmd_generate(args) -> int:
    import functools

    import ray

    from ferenda_ray.ops.graph import edges_from_triples, incoming_refs
    from ferenda_ray.ops.render import generate_batch
    from ferenda_ray.pipelines.kg import build_docs_ds, build_triples_ds

    refs = incoming_refs(
        edges_from_triples(build_triples_ds(args.pages))).to_pandas()
    ann_ref = ray.put({r.dst: r.citing.split(";")
                       for r in refs.itertuples()})
    (build_docs_ds(args.pages, batch_size=args.batch_size)
     .map_batches(functools.partial(generate_batch, annotations_ref=ann_ref),
                  batch_format="pyarrow", batch_size=args.batch_size)
     .write_parquet(args.out))
    print(json.dumps({"out": args.out}))
    return 0


def cmd_ntdump(args) -> int:
    from ferenda_ray.pipelines.kg import build_triples_ds
    from ferenda_ray.stages.materialize import write_nt

    man = write_nt(build_triples_ds(args.pages), args.out)
    print(json.dumps({"shards": len(man), "lines": int(man.n_lines.sum())}))
    return 0


def cmd_status(args) -> int:
    """Per-partition status from the lineage manifest (reference
    ``get_status``/``statusreport`` A6)."""
    from ferenda_ray.stages.materialize import read_manifest

    rows = read_manifest(args.out)
    print(json.dumps({
        "buckets_done": len(rows),
        "triples": sum(r["n_triples"] for r in rows),
        "t_ms_total": round(sum(r["t_ms"] for r in rows), 1),
    }))
    return 0


def cmd_dump(args) -> int:
    """Debug dump of materialized triples (reference S15
    ``Devel.dumprdf``/``dumpstore``): sample rows, optionally one
    subject's full graph, as N-Triples lines."""
    from ferenda_ray.stages.materialize import nt_lines, read_triples

    ds = read_triples(args.out)
    if args.subject:
        # compute-kernel equality, NOT an interpolated filter expression
        # (a subject containing a quote must not break/inject filter
        # syntax)
        subject = args.subject

        def eq(b):
            import pyarrow as pa
            import pyarrow.compute as pc

            return b.filter(pc.equal(b.column("subj"), pa.scalar(subject)))

        ds = ds.map_batches(eq, batch_format="pyarrow")
    for row in nt_lines(ds).limit(args.limit).take(args.limit):
        print(row["line"])
    return 0


def cmd_profile(args) -> int:
    """Per-column profile of a parquet table (n/nulls/min/max), one
    JSON line per column — the pre/post-transform data-quality check."""
    import ray.data as rd

    from ferenda_ray.ops.profile import profile_numeric

    ds = rd.read_parquet(args.table, columns=args.columns)
    for row in profile_numeric(ds, args.columns).take_all():
        print(json.dumps(row))
    return 0


def cmd_curate(args) -> int:
    """Curation over a documents table. Default: the per-language
    median-quality filter (kept rows as parquet). ``--pipeline``: the
    full composed chain — quality gate → exact dedup → source mixing →
    sequence packing — writing the packed-sequence training-feed
    summary."""
    import os

    sf_dir = os.path.dirname(args.documents) or "."
    if args.pipeline:
        from ferenda_ray.pipelines.curate import curation_pipeline

        out = curation_pipeline(sf_dir, max_len=args.max_len)
        out.write_parquet(args.out)
        df = __import__("ray").data.read_parquet(args.out)
        print(json.dumps({"out": args.out, "sequences": df.count()}))
        return 0
    from ferenda_ray.ops.text import curate_documents

    kept = curate_documents(sf_dir)
    kept.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_dedup_report(args) -> int:
    """Duplication report over a documents table: per-doc paragraph
    duplication stats plus, with ``--resolve``, the quality-argmax
    cluster resolution (one kept representative per near-dup cluster)."""
    import os

    sf_dir = os.path.dirname(args.documents) or "."
    if args.resolve:
        from ferenda_ray.ops.dedup import dedup_keep_best

        out = dedup_keep_best(sf_dir)
    else:
        from ferenda_ray.ops.dedup import paragraph_dup_stats

        out = paragraph_dup_stats(sf_dir)
    return _write_and_report(out, args.out)


def cmd_dsir(args) -> int:
    """DSIR importance weights of every non-target doc vs the target
    source slice (``--target``) — the data-selection scorer."""
    import os

    from ferenda_ray.ops.text import dsir_scores

    sf_dir = os.path.dirname(args.documents) or "."
    out = dsir_scores(sf_dir, target_source=args.target)
    return _write_and_report(out, args.out)


def cmd_kcore(args) -> int:
    """k-core of the citation graph over a materialized triples dir —
    the cohesive-subgraph slice of the graphanalyze report family
    (``--coreness`` computes every node's core number instead)."""
    from ferenda_ray.ops.graph import (core_numbers, edges_from_triples,
                                       kcore)
    from ferenda_ray.stages import materialize as mat

    edges = edges_from_triples(mat.read_triples(args.triples))
    if args.coreness:
        out = core_numbers(edges, n_rounds=args.rounds)
    else:
        out = kcore(edges, k=args.k, n_rounds=args.rounds)
    return _write_and_report(out, args.out)


def cmd_graph(args) -> int:
    """Pairwise / per-node citation-graph reports over a materialized
    triples dir: co-citation, bibliographic coupling, Adamic–Adar,
    per-node triangles + clustering coefficient, domain-graph
    coarsening."""
    from ferenda_ray.ops import graph as G
    from ferenda_ray.stages import materialize as mat

    edges = G.edges_from_triples(mat.read_triples(args.triples))
    seeded = {
        "ppr": lambda e: G.personalized_pagerank(
            e, seed_host=args.seed_host, n_iter=5),
        "bfs-hops": lambda e: G.bfs_hops(e, seed_host=args.seed_host),
    }
    if args.what in seeded:
        if not args.seed_host:
            raise SystemExit(f"--seed-host is required for {args.what}")
        fn = seeded[args.what]
    else:
        fn = {"cocitations": G.cocitations, "coupling": G.coupling,
              "adamic-adar": G.adamic_adar,
              "link-prediction": G.link_prediction,
              "triangles": G.local_triangles,
              "host-graph": G.host_graph}[args.what]
    return _write_and_report(fn(edges), args.out)


def _write_and_report(ds, out: str) -> int:
    """Shared tail of the report subcommands: write the result, then
    re-read the written parquet for the row count (reading the OUTPUT
    doubles as a sink smoke-check)."""
    ds.write_parquet(out)
    import ray.data as rd

    print(json.dumps({"out": out, "rows": rd.read_parquet(out).count()}))
    return 0


def cmd_hoststats(args) -> int:
    """Host-level corpus statistics over a raw pages parquet
    (``--crawl`` reports recrawl-scheduler stats instead)."""
    from ferenda_ray.ops.web import host_crawl_stats, host_stats

    return _write_and_report(
        (host_crawl_stats if args.crawl else host_stats)(args.pages),
        args.out)


def cmd_c4(args) -> int:
    """C4 line-level cleaning stats and keep flags over a raw pages
    parquet (``--by-host`` rolls the keep bits up to a host-level
    quality gate)."""
    from ferenda_ray.ops.web import c4_line_rules, host_quality

    fn = host_quality if args.by_host else c4_line_rules
    return _write_and_report(fn(args.pages), args.out)


def cmd_hostlangs(args) -> int:
    """Per-host language distribution over a raw pages parquet."""
    from ferenda_ray.ops.web import host_lang_stats

    return _write_and_report(host_lang_stats(args.pages), args.out)


def cmd_gate(args) -> int:
    """Apply the host-quality gate: surviving (host, url, ts_s)."""
    from ferenda_ray.ops.web import gated_pages

    return _write_and_report(
        gated_pages(args.pages, min_permille=args.min_permille),
        args.out)


def cmd_curate_crawl(args) -> int:
    """End-to-end crawl curation: canonical-latest + C4 keep + host
    gate; writes the curated (host, norm_url, url, ts_s) list."""
    from ferenda_ray.ops.web import curated_crawl

    return _write_and_report(
        curated_crawl(args.pages, min_permille=args.min_permille),
        args.out)


def cmd_canonlatest(args) -> int:
    """Latest snapshot per canonical url over a raw pages parquet."""
    from ferenda_ray.ops.web import canonical_latest

    return _write_and_report(canonical_latest(args.pages), args.out)


def cmd_normalize(args) -> int:
    """Unicode + whitespace normalization over a documents table."""
    import os

    from ferenda_ray.ops.text import normalize_docs

    sf_dir = os.path.dirname(args.documents) or "."
    return _write_and_report(normalize_docs(sf_dir), args.out)


def cmd_collocations(args) -> int:
    """Corpus collocations (bigram PMI) over a documents table."""
    import os

    from ferenda_ray.ops.text import bigram_pmi

    sf_dir = os.path.dirname(args.documents) or "."
    out = bigram_pmi(sf_dir, min_count=args.min_count)
    return _write_and_report(out, args.out)


def cmd_setup(args) -> int:
    """Scaffold a pipeline project dir (reference ``ferenda-setup`` /
    ``manager.runsetup``): writes the default INI (editable with
    ``registry.enable`` / ``run --config``)."""
    import os

    from ferenda_ray.registry import DEFAULT_INI

    os.makedirs(args.dir, exist_ok=True)
    ini = os.path.join(args.dir, "ferenda_ray.ini")
    if os.path.exists(ini) and not args.force:
        print(json.dumps({"error": f"{ini} exists (use --force)"}))
        return 1
    with open(ini, "w") as fp:
        fp.write(DEFAULT_INI)
    print(json.dumps({"created": ini}))
    return 0


def cmd_gen_corpus(args) -> int:
    from ferenda_ray.sources.pages import generate_corpus_ds

    generate_corpus_ds(args.pages_count).write_parquet(args.out)
    print(json.dumps({"out": args.out, "pages": args.pages_count}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ferenda_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, pages=True):
        if pages:
            sp.add_argument("--pages", required=True,
                            help="pages parquet path/dir")
        sp.add_argument("--out", required=True)
        sp.add_argument("--batch-size", type=int, default=128)

    sp = sub.add_parser("run"); common(sp)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--no-resume", action="store_true")
    sp.add_argument("--config", default=None,
                    help="INI pipeline config (registry.assemble)")
    sp.add_argument("--incremental", action="store_true",
                    help="treat --pages as a crawl delta; merge into "
                         "the existing --out table")
    sp.set_defaults(fn=cmd_run)
    sp = sub.add_parser("sections"); common(sp); sp.set_defaults(fn=cmd_sections)
    sp = sub.add_parser("generate"); common(sp); sp.set_defaults(fn=cmd_generate)
    sp = sub.add_parser("ntdump"); common(sp); sp.set_defaults(fn=cmd_ntdump)
    sp = sub.add_parser("status")
    sp.add_argument("--out", required=True); sp.set_defaults(fn=cmd_status)
    sp = sub.add_parser("dump")
    sp.add_argument("--out", required=True)
    sp.add_argument("--subject", default="")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_dump)
    sp = sub.add_parser("setup")
    sp.add_argument("--dir", required=True)
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_setup, needs_ray=False)
    sp = sub.add_parser("profile")
    sp.add_argument("--table", required=True, help="parquet path")
    sp.add_argument("--columns", nargs="+", required=True)
    sp.set_defaults(fn=cmd_profile)
    sp = sub.add_parser("curate")
    sp.add_argument("--documents", required=True,
                    help="documents.parquet path")
    sp.add_argument("--out", required=True)
    sp.add_argument("--pipeline", action="store_true",
                    help="full gate→dedup→mix→pack chain")
    sp.add_argument("--max-len", type=int, default=512)
    sp.set_defaults(fn=cmd_curate)
    sp = sub.add_parser("dedup-report")
    sp.add_argument("--documents", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--resolve", action="store_true",
                    help="emit per-cluster kept representative instead "
                         "of paragraph stats")
    sp.set_defaults(fn=cmd_dedup_report)
    sp = sub.add_parser("dsir")
    sp.add_argument("--documents", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--target", default="src0",
                    help="target-domain source value")
    sp.set_defaults(fn=cmd_dsir)
    sp = sub.add_parser("kcore")
    sp.add_argument("--triples", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--k", type=int, default=3)
    sp.add_argument("--rounds", type=int, default=16)
    sp.add_argument("--coreness", action="store_true")
    sp.set_defaults(fn=cmd_kcore)
    sp = sub.add_parser("graph")
    sp.add_argument("--triples", required=True)
    sp.add_argument("--what", required=True,
                    choices=["cocitations", "coupling", "adamic-adar",
                             "link-prediction", "triangles",
                             "host-graph", "ppr", "bfs-hops"])
    sp.add_argument("--seed-host", default=None)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_graph)
    sp = sub.add_parser("hoststats")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--crawl", action="store_true")
    sp.set_defaults(fn=cmd_hoststats)
    sp = sub.add_parser("canonlatest")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_canonlatest)
    sp = sub.add_parser("gate")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--min-permille", dest="min_permille", type=int,
                    default=900)
    sp.set_defaults(fn=cmd_gate)
    sp = sub.add_parser("curate-crawl")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--min-permille", dest="min_permille", type=int,
                    default=900)
    sp.set_defaults(fn=cmd_curate_crawl)
    sp = sub.add_parser("c4")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--by-host", dest="by_host", action="store_true")
    sp.set_defaults(fn=cmd_c4)
    sp = sub.add_parser("hostlangs")
    sp.add_argument("--pages", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_hostlangs)
    sp = sub.add_parser("collocations")
    sp.add_argument("--documents", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--min-count", dest="min_count", type=int, default=5)
    sp.set_defaults(fn=cmd_collocations)
    sp = sub.add_parser("normalize")
    sp.add_argument("--documents", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_normalize)
    sp = sub.add_parser("gen-corpus")
    sp.add_argument("--out", required=True)
    sp.add_argument("--pages-count", type=int, required=True)
    sp.set_defaults(fn=cmd_gen_corpus)

    args = p.parse_args(argv)
    if getattr(args, "needs_ray", True):
        _init_ray()
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
