"""Parity: fused Pallas SW kernel == the lax.scan sw_pass, bit for bit.

The Pallas kernel (ops/sw_pallas.py) re-implements the scoring pass of
the reference's striped Smith-Waterman (src/ssw.c:192-380,406-580) with
VMEM-resident DP state; these tests pin it to the existing sw_pass —
which is itself pinned to the NumPy oracle and the compiled ssw.c shim
in tests/test_sw.py — across every semantic knob (terminate, byte/word
pad rows, second-best edge inclusivity) and through sw_align_ends.

Runs in Pallas interpret mode on the CPU test backend; the TPU lowering
of the same kernel is exercised by the verify skill / bench_align.
"""

import numpy as np
import pytest

from sapling_tpu.ops.sw import sw_align_ends, sw_pass
from sapling_tpu.ops.sw_pallas import sw_pass_pallas


def _random_batch(rng, b, w, r, related_every=3):
    q = rng.integers(0, 5, (b, w)).astype(np.int8)
    ref = rng.integers(0, 5, (b, r)).astype(np.int8)
    for i in range(0, b, related_every):   # some high-scoring lanes
        ln = min(w, r - 5)
        ref[i, 5:5 + ln] = q[i, :ln]
    ql = rng.integers(5, w + 1, b).astype(np.int32)
    rl = rng.integers(10, r + 1, b).astype(np.int32)
    return q, ql, ref, rl


FIELDS = ("score", "ref_end", "read_end", "score2", "ref_end2")


@pytest.mark.parametrize("pad_to,second_inclusive", [(16, False), (8, True)])
def test_pallas_pass_bit_parity(pad_to, second_inclusive):
    rng = np.random.default_rng(11)
    q, ql, ref, rl = _random_batch(rng, 48, 40, 60)
    term = np.full(48, -1, np.int32)
    kw = dict(pad_to=pad_to, second_inclusive=second_inclusive)
    a = sw_pass(q, ql, ref, rl, term, **kw)
    b = sw_pass_pallas(q, ql, ref, rl, term, interpret=True, **kw)
    for k in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(b[k]), np.asarray(a[k]), err_msg=k)


def test_pallas_pass_terminate_parity():
    rng = np.random.default_rng(12)
    q, ql, ref, rl = _random_batch(rng, 32, 24, 36)
    no_term = np.full(32, -1, np.int32)
    term = np.asarray(sw_pass(q, ql, ref, rl, no_term)["score"], np.int32)
    a = sw_pass(q, ql, ref, rl, term)
    b = sw_pass_pallas(q, ql, ref, rl, term, interpret=True)
    for k in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(b[k]), np.asarray(a[k]), err_msg=k)


def test_pallas_align_ends_parity():
    rng = np.random.default_rng(13)
    q, ql, ref, rl = _random_batch(rng, 30, 100, 140)
    a = sw_align_ends(q, ql, ref, rl)
    b = sw_align_ends(q, ql, ref, rl, use_pallas=True)
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(b[k]), np.asarray(a[k]), err_msg=k)


def test_pallas_nonstandard_scoring():
    # the aligner's actual params (align.cpp:20-23 uses SSW defaults);
    # sweep a different matrix to catch hard-coded constants
    rng = np.random.default_rng(14)
    q, ql, ref, rl = _random_batch(rng, 16, 30, 50)
    term = np.full(16, -1, np.int32)
    kw = dict(match=3, mismatch=1, gap_open=5, gap_extend=2, mask_len=7)
    a = sw_pass(q, ql, ref, rl, term, **kw)
    b = sw_pass_pallas(q, ql, ref, rl, term, interpret=True, **kw)
    for k in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(b[k]), np.asarray(a[k]), err_msg=k)
