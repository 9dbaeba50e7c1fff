"""Property-based tests for the pure-python sketch kernels (no Ray):
clz correctness, HLL merge/estimate invariants, Bloom no-false-negatives,
Misra-Gries candidate guarantee, quantile index rule."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ferenda_ray.ops import bloom, sketch


@given(st.lists(st.integers(min_value=1, max_value=2**64 - 1),
                min_size=1, max_size=200))
def test_clz64_matches_bit_length(xs):
    arr = np.array(xs, np.uint64)
    got = sketch._clz64(arr)
    want = [64 - int(x).bit_length() for x in xs]
    assert got.tolist() == want


@given(st.lists(st.integers(min_value=0, max_value=2**63), min_size=0,
                max_size=500),
       st.integers(min_value=1, max_value=499))
@settings(max_examples=25)
def test_hll_merge_equals_whole(xs, cut):
    h = sketch._splitmix64(np.array(xs, np.uint64)) if xs else \
        np.zeros(0, np.uint64)
    cut = min(cut, len(h))
    whole = sketch.hll_registers(h)
    merged = np.maximum(sketch.hll_registers(h[:cut]),
                        sketch.hll_registers(h[cut:]))
    assert np.array_equal(whole, merged)


@given(st.sets(st.integers(min_value=0, max_value=2**31), min_size=1,
               max_size=300))
@settings(max_examples=25)
def test_bloom_never_false_negative(keys):
    arr = np.array(sorted(keys), np.int64)
    bits = np.zeros(bloom.BLOOM_M, np.bool_)
    bits[bloom._probes(arr).ravel()] = True
    packed = np.packbits(bits)
    assert bloom.bloom_contains(packed, arr).all()


@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=400),
       st.integers(min_value=2, max_value=10),
       st.integers(min_value=1, max_value=399))
@settings(max_examples=50)
def test_misra_gries_candidate_guarantee(tokens, capacity, cut):
    """Any term with global count·capacity > N survives the per-chunk
    threshold (batch_cnt·capacity > batch_N) in at least one chunk —
    the invariant frequent_terms' pass 1 relies on."""
    cut = min(cut, len(tokens))
    chunks = [tokens[:cut], tokens[cut:]]
    n = len(tokens)
    from collections import Counter

    total = Counter(tokens)
    survivors = set()
    for ch in chunks:
        c = Counter(ch)
        for t, k in c.items():
            if k * capacity > len(ch):
                survivors.add(t)
    for t, k in total.items():
        if k * capacity > n:
            assert t in survivors


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=300),
       st.floats(min_value=0.01, max_value=0.99))
@settings(max_examples=50)
def test_quantile_index_rule_matches_sorted_pick(vals, p):
    """ceil(p·n)−1 (the rule exact_quantiles implements) always indexes
    a real element and is monotone in p."""
    n = len(vals)
    r = max(int(np.ceil(p * n)) - 1, 0)
    assert 0 <= r < n
    s = sorted(vals)
    # histogram+refinement must return exactly this element:
    assert s[r] in vals
