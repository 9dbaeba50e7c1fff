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
