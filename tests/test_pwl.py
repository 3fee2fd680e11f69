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
