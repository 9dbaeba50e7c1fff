"""Stage S4 — URI canonicalization: COIN-style minting + owl:sameAs.

Reference semantics rebuilt:

* ``URIMinter``/``URISpace`` (``ferenda/thirdparty/coin.py:14-236``):
  canonical URIs are minted from resource metadata by priority-sorted
  templates with variable bindings and slug transforms, config loaded
  once (``swedishlegalsource.py:261-277``). Here: :class:`UriMinter`
  with priority templates over binding dicts; for the KG pipeline the
  bindings come from the entity table (label → slug).
* owl:sameAs canonical-mapping layer (``lagen/nu/sameas.py`` analog,
  SURVEY §2.4 J7): alias URIs collapse to one canonical URI before
  minting.

Scale notes: the sameAs + mint mapping is small relative to the triple
stream → broadcast once via ``ray.put`` and applied as a dict lookup
inside ``map_batches`` (no shuffle). If the mapping itself ever exceeds
worker memory, the fallback is a hash-partitioned join of triples
against the mapping table on ``obj`` (bucket both sides by
``hash(uri) % B``) — not needed at the current entity cardinality.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ferenda_ray.util import slugify


class UriMinter:
    """Priority-sorted URI templates over metadata bindings.

    Each template: ``{"priority": int, "requires": [binding, ...],
    "template": "https://…/{binding}"}``; the highest-priority template
    whose required bindings are all present wins (reference
    ``coin.py:100-236`` template selection). The ``slug`` binding is
    derived from ``label`` automatically.
    """

    _VAR = re.compile(r"\{(\w+)\}")

    def __init__(self, templates: list[dict]):
        self.templates = sorted(templates, key=lambda t: t["priority"])

    def mint(self, bindings: dict[str, str]) -> str | None:
        b = dict(bindings)
        if "label" in b and "slug" not in b:
            b["slug"] = slugify(b["label"])
        for tpl in self.templates:
            if all(r in b and b[r] for r in tpl["requires"]):
                return self._VAR.sub(lambda m: b[m.group(1)], tpl["template"])
        return None


ENTITY_TEMPLATES = [
    {"priority": 1, "requires": ["slug"],
     "template": "https://example.org/entity/{slug}"},
    {"priority": 2, "requires": ["id"],
     "template": "https://example.org/entity/id/{id}"},
]


def build_canonical_map(entity_rows: list[dict],
                        sameas: dict[str, str]) -> dict[str, str]:
    """Compose sameAs collapse + template minting into one raw→canonical
    dict (driver-side, broadcast to the rewrite stage).

    ``entity_rows``: dicts with ``entity_uri`` and binding fields
    (``label`` / ``id``).
    """
    minter = UriMinter(ENTITY_TEMPLATES)
    minted: dict[str, str] = {}
    for row in entity_rows:
        out = minter.mint({k: v for k, v in row.items() if k != "entity_uri"})
        if out:
            minted[row["entity_uri"]] = out
    combined: dict[str, str] = {}
    for raw in set(minted) | set(sameas):
        resolved = sameas.get(raw, raw)
        combined[raw] = minted.get(resolved, resolved)
    return combined


def canon_batch(batch: pa.Table, canon_ref) -> pa.Table:
    """triples batch → triples batch with subj/obj rewritten through the
    broadcast canonical map (URIs only; literals untouched). Stateless
    task; the map is resolved once per worker via the state cache."""
    from ferenda_ray.state import fetch

    canon: dict[str, str] = fetch(canon_ref)
    subj = [canon.get(s, s) for s in batch.column("subj").to_pylist()]
    objs = batch.column("obj").to_pylist()
    is_uri = batch.column("obj_is_uri").to_pylist()
    obj = [canon.get(o, o) if u else o for o, u in zip(objs, is_uri)]
    out = batch.drop_columns(["subj", "obj"])
    out = out.append_column("subj", pa.array(subj, pa.string()))
    out = out.append_column("obj", pa.array(obj, pa.string()))
    # restore canonical column order
    return out.select(
        ["subj", "pred", "obj", "obj_is_uri", "lang", "datatype", "url"]
    )


# -- scale-path canonicalization: salted hash-bucket join ------------------

def canon_rewrite_join(triples_ds, mapping_ds, col: str, *,
                       num_buckets: int = 64, salt: int = 4):
    """Rewrite one URI column through a (raw → canonical) MAPPING
    DATASET via a bucketed hash join — the scale path for when the
    mapping outgrows a broadcast (10^12-entity regime), per the
    north_rule's "groupby-aggregate shuffles keyed by salted entity
    hash".

    Skew design: triples are bucketed by ``(hash(uri) % num_buckets,
    row_salt)`` where ``row_salt = row_hash % salt``; each mapping row
    is REPLICATED to all ``salt`` sub-buckets. A head entity's triples
    therefore spread over ``salt`` tasks instead of hot-spotting one
    (classic salted replicated join). Literal-obj rows pass through a
    reserved bucket untouched.
    """
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from ferenda_ray.util import bucket_keys

    n_sub = num_buckets * salt
    PASS = n_sub  # bucket for rows that can never match (literals)

    def tag_triples(b: pa.Table) -> pa.Table:
        n = b.num_rows
        base = bucket_keys(b.column(col), num_buckets).astype(np.int64)
        buckets = base * salt + np.arange(n, dtype=np.int64) % salt
        if col == "obj":
            ok = b.column("obj_is_uri").to_numpy(zero_copy_only=False)
            buckets = np.where(ok, buckets, PASS)
        out = b.append_column(
            "bucket", pa.array(buckets.astype(np.int32), pa.int32()))
        return out.append_column("side",
                                 pa.array(np.zeros(n, np.int8()),
                                          pa.int8()))

    def tag_mapping(b: pa.Table) -> pa.Table:
        # replicate each mapping row to every salt sub-bucket —
        # vectorized arrow take + numpy repeat/tile, no per-row python
        n = b.num_rows
        base = bucket_keys(b.column("raw"),
                           num_buckets).astype(np.int64) * salt
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salt))
        m = n * salt
        empty = pa.array([""] * m, pa.string())
        return pa.table({
            "subj": b.column("raw").take(idx),       # raw key
            "pred": empty,
            "obj": b.column("canonical").take(idx),  # canonical value
            "obj_is_uri": pa.array(np.ones(m, bool)),
            "lang": empty,
            "datatype": empty,
            "url": empty,
            "bucket": pa.array(
                (np.repeat(base, salt)
                 + np.tile(np.arange(salt, dtype=np.int64), n))
                .astype(np.int32), pa.int32()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
        })

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g.side == 1]
        lut = dict(zip(m.subj, m.obj))
        t = g[g.side == 0].drop(columns=["bucket", "side"]).copy()
        if lut:
            t[col] = t[col].map(lambda v: lut.get(v, v))
        return t

    both = (triples_ds.map_batches(tag_triples, batch_format="pyarrow")
            .union(mapping_ds.map_batches(tag_mapping,
                                          batch_format="pyarrow")))
    return both.groupby("bucket").map_groups(rewrite, batch_format="pandas")


def canon_join(triples_ds, mapping_ds, *, num_buckets: int = 64,
               salt: int = 4):
    """Full join-based canonicalization: rewrite subj, then obj."""
    out = canon_rewrite_join(triples_ds, mapping_ds, "subj",
                             num_buckets=num_buckets, salt=salt)
    return canon_rewrite_join(out, mapping_ds, "obj",
                              num_buckets=num_buckets, salt=salt)
