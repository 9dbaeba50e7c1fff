"""Config-driven pipeline assembly (SURVEY §2.10; reference
manager.py:674-712 enable()/ferenda.ini semantics)."""

import pandas as pd
import pytest

from ferenda_ray import registry


def _write_ini(tmp_path, body: str) -> str:
    p = tmp_path / "ferenda_ray.ini"
    p.write_text(body)
    return str(p)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def test_default_ini_matches_fused_pipeline(ray_session, pages_parquet,
                                            tmp_path):
    """The assembled extract→structure→triples chain produces the SAME
    triple set as the fused flagship path (build_triples_ds)."""
    from ferenda_ray.pipelines.kg import build_triples_ds

    ini = _write_ini(tmp_path, registry.DEFAULT_INI)
    assembled = _canon(registry.assemble(pages_parquet, ini).to_pandas())
    fused = _canon(build_triples_ds(pages_parquet).to_pandas())
    pd.testing.assert_frame_equal(assembled, fused)


def test_user_step_via_fn_key(ray_session, pages_parquet, tmp_path):
    """A user-supplied dotted-path step slots into the chain (the
    reference's class= extension point)."""
    ini = _write_ini(tmp_path, """\
[pipeline]
steps = extract, keep_en, structure, sections

[keep_en]
fn = ferenda_ray.registry:_keep_en_example
""")
    out = registry.assemble(pages_parquet, ini).to_pandas()
    assert len(out)  # sections emitted
    assert set(out.columns) == {"url", "fragment", "about", "title",
                                "ordinal", "text"}


def test_enable_appends_section(tmp_path):
    ini = _write_ini(tmp_path, registry.DEFAULT_INI)
    name = registry.enable("keep_en",
                           "ferenda_ray.registry:_keep_en_example", ini)
    assert name == "keep_en"
    names, opts, _pipe = registry.load_pipeline_config(ini)
    assert names == ["extract", "structure", "triples", "canonicalize", "keep_en"]
    assert opts["keep_en"]["fn"] == "ferenda_ray.registry:_keep_en_example"


def test_enable_rejects_unresolvable(tmp_path):
    ini = _write_ini(tmp_path, registry.DEFAULT_INI)
    with pytest.raises((ImportError, AttributeError)):
        registry.enable("bad", "ferenda_ray.registry:_no_such_fn", ini)


def test_unknown_step_raises(ray_session, pages_parquet, tmp_path):
    ini = _write_ini(tmp_path, "[pipeline]\nsteps = extract, mystery\n")
    with pytest.raises(KeyError, match="mystery"):
        registry.assemble(pages_parquet, ini)


def test_per_step_batch_size_override(ray_session, pages_parquet,
                                      tmp_path):
    ini = _write_ini(tmp_path, """\
[pipeline]
steps = extract, structure, triples
batch_size = 32

[triples]
batch_size = 32
""")
    out = registry.assemble(pages_parquet, ini)
    assert out.count() > 0
