"""Deterministic entity / alias / sameAs / embedding side tables.

Analog of the reference's ``commondata`` extra-TTL entity data
(``documentrepository.py:434-449``) that backs ``lookup_resource`` fuzzy
alias→URI linking (``documentrepository.py:478-525``), plus the
owl:sameAs canonical-mapping layer (SURVEY §2.4 J7) and the
embedding-ANN scorer input demanded by BASELINE.json.

Everything is a pure function of (seed, index) — reproducible at any
scale with identical content for overlapping indices (FIXTURES.md §5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ferenda_ray.util import slugify

SEED = 42
N_ENTITIES = 200
EMBED_DIM = 32

_FIRST = [
    "Acme", "Borealis", "Cascade", "Deltaform", "Everspring", "Fintower",
    "Granite", "Helix", "Ironwood", "Juniper", "Kestrel", "Lumen",
    "Meridian", "Northgate", "Obsidian", "Pinnacle", "Quartz", "Redwood",
    "Summit", "Tidewater", "Umbra", "Vanguard", "Westbrook", "Xenon",
    "Zephyr",
]
_SECOND = [
    "Corporation", "Institute", "Laboratories", "Foundation", "Systems",
    "Holdings", "Industries", "Partners", "Consortium", "Networks",
    "Dynamics", "Analytics", "Logistics", "Observatory", "Collective",
    "Alliance", "Ventures", "Works", "Society", "Council",
]

RAW_ENTITY_NS = "https://raw.example.org/entity/"
CANON_ENTITY_NS = "https://example.org/entity/"


def entity_label(i: int) -> str:
    first = _FIRST[i % len(_FIRST)]
    second = _SECOND[(i // len(_FIRST)) % len(_SECOND)]
    suffix = f" {i // (len(_FIRST) * len(_SECOND)) + 1}" if i >= len(_FIRST) * len(_SECOND) else ""
    return f"{first} {second}{suffix}"


def entity_uri(i: int) -> str:
    return f"{RAW_ENTITY_NS}{i:04d}"


def noisy_label(i: int) -> str:
    """A misspelled variant of the label (one char dropped from the second
    word) — still within difflib cutoff 0.8, exercising the fuzzy path
    (reference ``documentrepository.py:478-525``)."""
    label = entity_label(i)
    first, rest = label.split(" ", 1)
    drop = (i * 7 + 3) % (len(rest) - 2) + 1  # never the first char
    return f"{first} {rest[:drop] + rest[drop + 1:]}"


def sameas_map(n: int = N_ENTITIES) -> dict[str, str]:
    """Entities with i % 10 == 7 are duplicates of entity i-3 →
    owl:sameAs mapping raw_dup → raw_canonical (applied in the canon
    stage before URI minting)."""
    return {entity_uri(i): entity_uri(i - 3) for i in range(7, n, 10)}


def embed_text(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic character-trigram hashing embedding, L2-normalized.

    A stand-in for a real sentence-embedding model (none available in this
    environment); the Ray-side plumbing — broadcast matrix, batched cosine
    scoring in the linker actor — is identical to what a real model needs.
    """
    v = np.zeros(dim, dtype=np.float64)
    t = f"  {text.lower()}  "
    for j in range(len(t) - 2):
        tri = t[j : j + 3]
        h = hashlib.md5(tri.encode("utf-8")).digest()
        idx = h[0] % dim
        sign = 1.0 if h[1] % 2 else -1.0
        v[idx] += sign
    norm = np.linalg.norm(v)
    if norm > 0:
        v /= norm
    return v.astype(np.float32)


def entities_table(n: int = N_ENTITIES) -> pa.Table:
    """(entity_uri, label, canonical_uri, embedding) — the broadcast side."""
    uris = [entity_uri(i) for i in range(n)]
    labels = [entity_label(i) for i in range(n)]
    canon = [CANON_ENTITY_NS + slugify(lbl) for lbl in labels]
    emb = [embed_text(lbl).tolist() for lbl in labels]
    return pa.table(
        {
            "entity_uri": pa.array(uris, pa.string()),
            "label": pa.array(labels, pa.string()),
            "canonical_uri": pa.array(canon, pa.string()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
        }
    )


def aliases_table(n: int = N_ENTITIES) -> pa.Table:
    """(label, entity_uri, exact) — alias dictionary rows, including the
    canonical spelling; the noisy variants are NOT in the dictionary (they
    must be caught by the fuzzy matcher)."""
    labels, uris = [], []
    for i in range(n):
        labels.append(entity_label(i))
        uris.append(entity_uri(i))
    return pa.table(
        {
            "label": pa.array(labels, pa.string()),
            "entity_uri": pa.array(uris, pa.string()),
        }
    )


def alias_dict(n: int = N_ENTITIES) -> dict[str, str]:
    return {entity_label(i): entity_uri(i) for i in range(n)}
