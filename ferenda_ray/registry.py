"""Config-driven pipeline assembly — the reference's ``ferenda.ini``
surface (SURVEY §2.10) rebuilt for Dataset chains.

Reference analogs: ``manager.enable()`` registers a class by writing a
section with a ``class=`` key into ``ferenda.ini`` and ``manager.run``
assembles enabled repos from that file (``manager.py:674-712``,
``_load_class``). Here:

* a :class:`PipelineStep` names a ``map_batches`` batch function plus
  its defaults; the BUILTIN registry holds the engine's composable
  stages (extract → structure → triples / sections);
* an INI file selects and parameterizes steps —
  ``[pipeline] steps = extract, structure, triples`` with optional
  per-step sections (``batch_size``, ``concurrency``); a section with
  a ``fn = package.module:callable`` key plugs a USER-SUPPLIED batch
  function into the chain (the ``class=`` extension point);
* :func:`enable` appends such a section, mirroring the reference's
  ``enable()``; :func:`assemble` builds the lazy Dataset chain.

Steps that need broadcast linker state (``triples``) receive
``alias_ref``/``emb_ref`` via ``functools.partial`` exactly like
``kg.build_triples_ds`` — state is ``ray.put`` once per assembly and
loaded once per worker process.
"""

from __future__ import annotations

import configparser
import functools
import importlib
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class PipelineStep:
    """One named stage: a batch fn (``pa.Table -> pa.Table``) with its
    Ray-side defaults. ``needs_link_state=True`` marks stages that take
    broadcast ``alias_ref``/``emb_ref`` kwargs."""

    name: str
    fn: Callable
    batch_format: str = "pyarrow"
    batch_size: int | None = 64
    needs_link_state: bool = False
    needs_canon_state: bool = False
    defaults: dict[str, Any] = field(default_factory=dict)


def _builtin_steps() -> dict[str, PipelineStep]:
    from ferenda_ray.pipelines import kg
    from ferenda_ray.stages.canon import canon_batch
    from ferenda_ray.stages.extract import extract_batch
    from ferenda_ray.stages.structure import sections_batch, structure_batch

    return {
        "extract": PipelineStep("extract", extract_batch),
        "structure": PipelineStep("structure", structure_batch),
        "triples": PipelineStep("triples", kg.triple_emit_batch,
                                needs_link_state=True),
        "canonicalize": PipelineStep("canonicalize", canon_batch,
                                     needs_canon_state=True),
        "sections": PipelineStep("sections", sections_batch),
    }


def resolve_fn(path: str) -> Callable:
    """``package.module:callable`` → the callable (the reference's
    ``_load_class`` for ``class=`` keys)."""
    mod_name, _, attr = path.partition(":")
    if not attr:
        mod_name, _, attr = path.rpartition(".")
    fn = getattr(importlib.import_module(mod_name), attr)
    if not callable(fn):
        raise TypeError(f"{path} resolves to a non-callable")
    return fn


def enable(name: str, fn_path: str, config_path: str) -> str:
    """Register a user step in the INI (reference ``manager.enable``):
    writes ``[name] fn = fn_path`` and appends the step to
    ``[pipeline] steps``. Returns the step name."""
    resolve_fn(fn_path)  # fail fast, like the reference's _load_class
    cfg = configparser.ConfigParser()
    cfg.read(config_path)
    if not cfg.has_section("pipeline"):
        cfg.add_section("pipeline")
        cfg.set("pipeline", "steps", "")
    if not cfg.has_section(name):
        cfg.add_section(name)
    cfg.set(name, "fn", fn_path)
    steps = [s.strip() for s in cfg.get("pipeline", "steps").split(",")
             if s.strip()]
    if name not in steps:
        steps.append(name)
        cfg.set("pipeline", "steps", ", ".join(steps))
    with open(config_path, "w") as fp:
        cfg.write(fp)
    return name


def load_pipeline_config(config_path: str) -> tuple[list[str],
                                                    dict[str, dict],
                                                    dict[str, str]]:
    """INI → (ordered step names, per-step options, pipeline options)."""
    cfg = configparser.ConfigParser()
    if not cfg.read(config_path):
        raise FileNotFoundError(config_path)
    pipe = dict(cfg["pipeline"]) if cfg.has_section("pipeline") else {}
    names = [s.strip() for s in pipe.pop("steps", "").split(",")
             if s.strip()]
    if not names:
        raise ValueError(f"[pipeline] steps empty in {config_path}")
    opts = {sec: dict(cfg[sec]) for sec in cfg.sections()
            if sec != "pipeline"}
    return names, opts, pipe


def assemble(pages_path: str, config_path: str):
    """input parquet + INI → lazy Dataset chain.

    Pipeline options: ``dedupe_snapshots`` (default true; the
    latest-per-url filter), ``batch_size`` (uniform default — kept
    uniform across the fused chain unless a step overrides it, see
    BASELINE §4 fusion note), ``reader`` (``module:fn`` resolving to a
    ``path → Dataset`` source — the extension point for NON-pages
    corpora like the PEP/ECMA packs; with a custom reader the
    pages-specific snapshot dedupe defaults OFF)."""
    import ray

    from ferenda_ray.pipelines import kg

    names, opts, pipe = load_pipeline_config(config_path)
    default_bs = int(pipe.get("batch_size", 64))
    builtin = _builtin_steps()

    reader = pipe.get("reader")
    ds = (resolve_fn(reader)(pages_path) if reader
          else kg.read_pages(pages_path))
    if pipe.get("dedupe_snapshots",
                "false" if reader else "true").lower() != "false":
        max_ref = ray.put(kg.latest_per_url_map(pages_path))
        ds = ds.map_batches(
            functools.partial(kg.latest_filter, max_ref=max_ref),
            batch_format="pyarrow", batch_size=default_bs)

    link_state: tuple | None = None
    canon_ref = None
    state = None
    for name in names:
        o = opts.get(name, {})
        if name in builtin:
            step = builtin[name]
            fn = step.fn
        elif "fn" in o:
            step = PipelineStep(name, resolve_fn(o["fn"]))
            fn = step.fn
        else:
            raise KeyError(
                f"step {name!r}: not builtin and no fn= key in [{name}]")
        if step.needs_link_state or step.needs_canon_state:
            if state is None:
                state = kg.default_link_state()
        if step.needs_link_state:
            if link_state is None:
                link_state = (ray.put(state[0]), ray.put(state[1]))
            fn = functools.partial(fn, alias_ref=link_state[0],
                                   emb_ref=link_state[1])
        if step.needs_canon_state:
            if canon_ref is None:
                canon_ref = ray.put(state[2])
            fn = functools.partial(fn, canon_ref=canon_ref)
        kwargs: dict[str, Any] = {
            "batch_format": o.get("batch_format", step.batch_format),
            "batch_size": int(o.get("batch_size", default_bs)),
        }
        if "concurrency" in o:  # actor-pool stage
            kwargs["concurrency"] = int(o["concurrency"])
        ds = ds.map_batches(fn, **kwargs)
    return ds


DEFAULT_INI = """\
[pipeline]
steps = extract, structure, triples, canonicalize
batch_size = 64
"""


def _keep_en_example(batch):
    """Example user step (referenced by tests + README): keep only
    English docs. Any ``pa.Table -> pa.Table`` callable works."""
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch.column("lang"), "en"))
