"""ferenda_ray — a Ray-Data-native knowledge-graph-construction engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference framework (eckberg/ferenda, see /root/reference) on top of
``ray.data.Dataset``: streaming Arrow-batch pipelines that extract text from
raw HTML, run FSM/rule-based structural parsing, emit RDF-shaped triples,
link entity mentions against a broadcast alias dictionary (+ embedding
scorer) in stateful actor pools, canonicalize URIs, and materialize
deduplicated (subj, pred, obj) triples to partitioned Parquet with
per-partition lineage manifests and checkpoint-resume.

Nothing here ports the reference's execution engine (per-file
multiprocessing jobs, reference ``ferenda/manager.py:1042-1073``); every
stage is a Ray Data batch transform designed for multi-node streaming
execution.
"""

__version__ = "0.1.0"


def _configure_threads() -> None:
    """When FERENDA_RAY_PIN_THREADS=1, pin the intra-task thread pools
    (pyarrow, polars) to 1 thread. Ray's num_cpus only limits SCHEDULING
    slots — on a single test box, pyarrow/polars kernels otherwise fan
    out to every physical core inside each task, so a `num_cpus=8` run
    silently borrows all 32 cores and the two-cluster-size scaling
    comparison is meaningless. One thread per task is also the standard
    multi-node worker configuration. Runs per process: the package
    import happens in every Ray worker."""
    import os

    if os.environ.get("FERENDA_RAY_PIN_THREADS") == "1":
        os.environ.setdefault("POLARS_MAX_THREADS", "1")  # read at import
        try:
            import pyarrow as _pa

            _pa.set_cpu_count(1)
            _pa.set_io_thread_count(2)
        except Exception:  # pragma: no cover
            pass


_configure_threads()
