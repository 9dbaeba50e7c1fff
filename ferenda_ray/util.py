"""Scalar helper functions (string / number / id utilities).

Re-implements, from their documented semantics, the utility surface of the
reference's ``ferenda/util.py`` that the pipeline stages need
(normalize_space ``util.py:286``, split_numalpha/numcmp ``util.py:191-246``,
title_sortkey ``util.py:724``, roman numerals ``util.py:689-711``,
ordinal increment ``util.py:712-723``, base27 ``util.py:845-853``,
uri_leaf ``util.py:621``) plus hashing helpers used for shuffles.

All functions are pure and cheap; they run inside ``map_batches`` bodies
(vectorized at the batch level where it matters).
"""

from __future__ import annotations

import hashlib
import re
import struct
import unicodedata

_WS_RE = re.compile(r"\s+")


def normalize_space(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends.

    The frozen normalization rule of the extract stage (reference analog:
    ``util.py:286-296``). ``str.split()`` and ``\\s+``-sub agree on every
    whitespace codepoint (exhaustively checked) and the split form is
    ~4x faster on this hot path (~40 calls per extracted page).
    """
    return " ".join(s.split())


_NUMALPHA_RE = re.compile(r"(\d+)")


def split_numalpha(s: str) -> list:
    """Split a string into alternating str/int parts for natural sort.

    ``"6 a" -> ['', 6, ' a']`` so that "6 a" < "7" < "10" under tuple
    comparison (reference analog ``util.py:191-246``).
    """
    return [int(p) if p.isdigit() else p for p in _NUMALPHA_RE.split(s)]


def numalpha_sortkey(s: str) -> str:
    """A plain-string sort key with the same ordering as split_numalpha.

    Ray/Arrow sorts need a flat column, so encode each integer run as a
    fixed-width zero-padded field.
    """
    return "".join(
        p.zfill(12) if p.isdigit() else p for p in _NUMALPHA_RE.split(s)
    )


_TITLE_STRIP_RE = re.compile(r"[^\w ]")


def title_sortkey(s: str) -> str:
    """Lowercase, strip leading 'the ', drop non-word chars, no spaces
    (reference analog ``util.py:724-739``)."""
    s = s.lower()
    if s.startswith("the "):
        s = s[4:]
    s = _TITLE_STRIP_RE.sub("", s)
    return s.replace(" ", "")


_COLLATORS: dict = {}


def _make_collator(locale_name: str):
    """Resolve the best available collation backend ONCE per process
    per locale (the per-row path must never touch process-global
    ``setlocale`` — it is not thread-safe)."""
    try:  # PyICU — the reference-exact path
        import icu

        coll = icu.Collator.createInstance(icu.Locale(locale_name))
        return coll.getSortKey
    except ImportError:
        pass
    try:  # POSIX locale collation: set LC_COLLATE once, keep it
        import locale as _loc

        _loc.setlocale(_loc.LC_COLLATE, f"{locale_name}.UTF-8")
        return lambda s: _loc.strxfrm(s).encode("utf-8",
                                                "surrogatepass")
    except Exception:
        return lambda s: title_sortkey(s).encode("utf-8",
                                                 "surrogatepass")


def collate_sortkey(s: str, locale_name: str = "sv_SE") -> bytes:
    """TRUE locale-collated sort key (reference
    ``documentrepository.py:2843-2851`` ``locale.strxfrm``): ICU when
    available, else ``locale.strxfrm`` with LC_COLLATE set once per
    process, else the :func:`title_sortkey` approximation encoded as
    bytes. This container ships neither PyICU nor non-C locales, so
    the approximation is what runs here (and what the oracle-checked
    ``customers_by_sortkey`` uses directly); on a cluster image with
    PyICU the key column becomes exactly the reference's collation.
    The backend is resolved once per (process, locale) — the per-row
    path does no ``setlocale`` mutation — and the byte key is what a
    distributed sort needs: collation happens at key EXTRACTION, never
    inside the comparator."""
    f = _COLLATORS.get(locale_name)
    if f is None:
        f = _COLLATORS[locale_name] = _make_collator(locale_name)
    return f(s)


_ROMAN_VALUES = [
    (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
    (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
    (5, "V"), (4, "IV"), (1, "I"),
]
_ROMAN_RE = re.compile(r"^[MDCLXVI]+$")


def to_roman(n: int) -> str:
    if not 0 < n < 4000:
        raise ValueError("number out of range (must be 1..3999)")
    out = []
    for val, sym in _ROMAN_VALUES:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


def from_roman(s: str) -> int:
    vals = {"M": 1000, "D": 500, "C": 100, "L": 50, "X": 10, "V": 5, "I": 1}
    total = 0
    prev = 0
    for ch in reversed(s.upper()):
        v = vals[ch]
        total = total - v if v < prev else total + v
        prev = max(prev, v)
    return total


def is_roman(s: str) -> bool:
    if not s or not _ROMAN_RE.match(s.upper()):
        return False
    try:
        return to_roman(from_roman(s)) == s.upper()
    except (ValueError, KeyError):
        return False


def ordinal_increment(o: str) -> str:
    """"6" -> "7", "6a" -> "6b", "6 a" -> "6 b" (reference ``util.py:712``)."""
    parts = split_numalpha(o)
    last = parts[-1]
    if isinstance(last, int):
        parts[-1] = last + 1
    else:
        stripped = last.rstrip()
        if not stripped:
            # trailing whitespace only; bump the preceding int
            for i in range(len(parts) - 1, -1, -1):
                if isinstance(parts[i], int):
                    parts[i] += 1
                    break
        else:
            parts[-1] = last[: len(last) - 1] + chr(ord(last[-1]) + 1)
    return "".join(str(p) for p in parts)


_B27_ALPHA = "0ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def base27encode(n: int) -> str:
    if n == 0:
        return _B27_ALPHA[0]
    out = []
    while n > 0:
        n, r = divmod(n, 27)
        out.append(_B27_ALPHA[r])
    return "".join(reversed(out))


def base27decode(s: str) -> int:
    n = 0
    for ch in s:
        n = n * 27 + _B27_ALPHA.index(ch)
    return n


def uri_leaf(uri: str) -> str:
    """Last path/fragment segment of a URI: 'http://a/b#c' -> 'c'
    (reference ``util.py:621``)."""
    for sep in ("#", "/", ":"):
        if sep in uri:
            leaf = uri.rsplit(sep, 1)[-1]
            if leaf:
                return leaf
    return uri


def ucfirst(s: str) -> str:
    return s[:1].upper() + s[1:] if s else s


_SLUG_STRIP_RE = re.compile(r"[^a-z0-9]+")


def slugify(s: str) -> str:
    """Deterministic ascii slug used by the URI minter: NFKD-fold,
    lowercase, non-alnum runs -> '-'."""
    s = unicodedata.normalize("NFKD", s)
    s = s.encode("ascii", "ignore").decode("ascii").lower()
    return _SLUG_STRIP_RE.sub("-", s).strip("-")


def hash64(s: str) -> int:
    """Stable 64-bit signed hash of a string (sha1-based, process-stable —
    unlike builtin hash). Used as shuffle/dedup key."""
    h = hashlib.sha1(s.encode("utf-8", "surrogatepass")).digest()
    return struct.unpack("<q", h[:8])[0]


def stable_uint(s: str, mod: int) -> int:
    """Stable bucket id in [0, mod) for partitioning."""
    h = hashlib.sha1(s.encode("utf-8", "surrogatepass")).digest()
    return struct.unpack("<Q", h[:8])[0] % mod


def bucket_ints(keys, mod: int):
    """Vectorized stable bucket ids in [0, mod) for an int64 key array
    (SplitMix64-finalizer mix so sequential keys spread; numpy, no
    per-row python)."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    k = (k ^ (k >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    k = (k ^ (k >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    k = k ^ (k >> np.uint64(31))
    return (k % np.uint64(mod)).astype(np.int32)


def cluster(values, maxgap=None, maxgap_ratio=10, remove_outliers=True):
    """1-D gap clustering (reference ``ferenda/util.py:893-910``
    semantics): sort, start a new group where the gap to the previous
    member exceeds ``maxgap`` (default: value range / maxgap_ratio);
    optionally drop outlier groups — fewer than 4 members when the
    clustering is coarse (group count below len(data)/10). The
    layout-analysis helper ``pdfanalyze`` uses this shape for grouping
    textbox edges. One documented divergence: the outlier test is
    evaluated against the INITIAL group count for every group (the
    reference re-evaluates against a list it is mutating, so whether a
    group survives depends on how many were already removed)."""
    data = sorted(values)
    if not data:
        return []
    if maxgap is None:
        maxgap = (data[-1] - data[0]) / maxgap_ratio
    groups = [[data[0]]]
    for x in data[1:]:
        if abs(x - groups[-1][-1]) <= maxgap:
            groups[-1].append(x)
        else:
            groups.append([x])
    if remove_outliers and len(groups) < len(data) / 10:
        groups = [g for g in groups if len(g) >= 4]
    return groups


def bucket_keys(values, mod: int):
    """Vectorized stable bucket ids in [0, mod) for ANY key column —
    ints go straight to :func:`bucket_ints`; strings are hashed ONCE
    by the polars xxhash kernel and then bucketed (replaces the
    per-row ``stable_uint(str(k))`` python+sha1 loop). Bucket
    assignment is job-internal (co-location only) — EXCEPT graph
    durable resume roots, which persist bucket-partitioned files and
    therefore stamp the hash behavior (``ops/graph._bucket_fn_stamp``:
    polars' kernel is not contractually version-stable) so a kernel
    change refuses to resume instead of misrouting keys."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)  # zero-copy for string columns
    else:
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            return bucket_ints(arr.astype(np.int64, copy=False), mod)
        s = pl.Series(values)
    if s.dtype.is_integer():
        return bucket_ints(s.to_numpy().astype(np.int64, copy=False),
                           mod)
    h = s.cast(pl.String).hash(17).to_numpy()
    return bucket_ints(np.ascontiguousarray(h).view(np.int64), mod)


def list_col_matrix(col, dtype="float64"):
    """Arrow list<float> column → (n, dim) numpy matrix via
    list_flatten (respects slices; no per-row python)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(a).to_numpy(zero_copy_only=False).astype(dtype)
    n = len(a)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)
