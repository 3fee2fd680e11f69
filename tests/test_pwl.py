"""PWL index build + prediction conformance vs the scalar oracle."""

import numpy as np
import pytest

from sapling_tpu.index.pwl import build_pwl
from sapling_tpu.index.suffix_array import build_suffix_data
from sapling_tpu.ops import pack as packops
from sapling_tpu.ops.predict import predict_pwl, predict_pwl_f64
from sapling_tpu.sim.genomes import gc_biased_genome, repeat_genome, uniform_genome

from .oracle import OracleSapling


def _build_both(seq, k, buckets):
    o = OracleSapling(bytes(seq), k=k, buckets=buckets)
    sd = build_suffix_data(seq)
    codes = packops.encode_bases(seq)
    t, audit, kmers = build_pwl(codes, sd.inv, sd.lcp, k, buckets,
                                return_audit=True)
    return o, t, audit, kmers


@pytest.mark.parametrize(
    "gen,k,buckets",
    [
        (lambda: uniform_genome(500, seed=0), 8, 5),
        (lambda: uniform_genome(2000, seed=1), 12, 8),
        (lambda: gc_biased_genome(1500, 0.8, seed=2), 10, 6),
        (lambda: repeat_genome(1200, 37, seed=3), 8, 6),
    ],
)
def test_pwl_table_matches_oracle(gen, k, buckets):
    seq = gen()
    o, t, audit, kmers = _build_both(seq, k, buckets)
    assert list(t.xlist) == o.xlist
    assert list(t.ylist) == o.ylist
    assert list(audit.errors) == o.errors
    assert audit.perfect_predictions == o.perfect
    assert (t.max_over, t.max_under, t.mean_error, t.most_over, t.most_under) == (
        o.max_over, o.max_under, o.mean_error, o.most_over, o.most_under
    )


def test_exact_rational_vs_f64_oracle():
    """The int64 rational prediction must agree with the C++ double
    semantics on every genome k-mer of the corpora (both in and out of
    bucket range)."""
    rng = np.random.default_rng(9)
    seq = uniform_genome(4000, seed=4)
    k, buckets = 10, 7
    o, t, _, kmers = _build_both(seq, k, buckets)
    # genome kmers + random kmers (incl. out-of-range values)
    rand = rng.integers(0, 1 << (2 * k), 5000, dtype=np.int64)
    xs = np.concatenate([kmers, rand])
    got = np.asarray(
        predict_pwl(xs, t.xlist, t.ylist, 2 * k, buckets, len(seq), xp=np)
    )
    want = predict_pwl_f64(xs, t.xlist, t.ylist, 2 * k, buckets, len(seq))
    want = np.minimum(want, len(seq) - 1)  # we clamp above; C++ doesn't
    np.testing.assert_array_equal(got, want)
    # spot-check the scalar oracle agrees too
    for x in xs[:200]:
        assert int(want[np.flatnonzero(xs == x)[0]]) == min(
            o.query_pwl(int(x)), len(seq) - 1
        )


def test_checkpoints_fast_and_parallel_audit_parity():
    """The sort-free (and fork-striped) sweep-1 reduction and the
    fork-chunked error audit must be bit-identical to the serial
    argsort forms at every worker count (the multi-Gbp build path,
    tools/build_big_index.py)."""
    from sapling_tpu.index.pwl import (build_checkpoints,
                                       build_checkpoints_fast, error_audit)

    rng = np.random.default_rng(7)
    for trial in range(4):
        m = int(rng.integers(1, 60_000))
        k = int(rng.integers(4, 21))
        kbits = 2 * k
        buckets = int(rng.integers(2, min(kbits, 12)))
        kmers = rng.integers(0, 1 << kbits, m).astype(np.int64)
        if trial % 2:  # heavy duplication exercises the tie-breaks
            kmers = kmers % max(1, m // 50)
        y = rng.permutation(m).astype(np.int64)
        x1, y1 = build_checkpoints(kmers, y, kbits, buckets)
        for w in (1, 3):
            x2, y2 = build_checkpoints_fast(kmers, y, kbits, buckets,
                                            chunk=1 << 12, workers=w)
            assert np.array_equal(x1, x2) and np.array_equal(y1, y2)
        fwd = rng.integers(0, 5, max(m - 1, 1)).astype(np.int32)
        inv = rng.permutation(m).astype(np.int64)
        a1 = error_audit(kmers, inv, None, x1, y1, k, buckets, m,
                         chunk=1 << 12, fwd=fwd, workers=1)
        a2 = error_audit(kmers, inv, None, x1, y1, k, buckets, m,
                         chunk=1 << 12, fwd=fwd, workers=3)
        assert np.array_equal(a1.errors, a2.errors)
        assert a1.perfect_predictions == a2.perfect_predictions
