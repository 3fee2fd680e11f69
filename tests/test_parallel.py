"""Multi-device (8 virtual CPU) tests for the dp-sharded query path and
collective statistics, plus the driver-facing graft entry points."""

import numpy as np
import pytest

from sapling_tpu.config import IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.parallel.mesh import make_mesh, pad_to_multiple
from sapling_tpu.parallel.query import ShardedQueryEngine, error_histogram
from sapling_tpu.sim.genomes import uniform_genome


@pytest.fixture(scope="module")
def index():
    genome = uniform_genome(20_000, seed=77)
    return SaplingIndex.build(genome, IndexConfig(k=21, buckets=8))


def test_pad_to_multiple():
    a = np.arange(10)
    p, b = pad_to_multiple(a, 8, 0)
    assert p.shape[0] == 16 and b == 10
    p2, b2 = pad_to_multiple(a, 5, 0)
    assert p2 is a or p2.shape[0] == 10


def test_sharded_query_matches_single_device(index):
    mesh = make_mesh(8)
    eng = ShardedQueryEngine(index, mesh)
    rng = np.random.default_rng(3)
    length = 21
    starts = rng.integers(0, index.n - length + 1, 1000)  # not dp-divisible
    codes2d = index.codes[starts[:, None] + np.arange(length)]
    sharded = eng.query_positions(codes2d)
    single = index.query_positions(codes2d)
    np.testing.assert_array_equal(sharded, single)
    assert index.verify_hits(codes2d, sharded).all()


def test_error_histogram_psum(index):
    mesh = make_mesh(8)
    errs = np.random.default_rng(0).integers(-100, 100, 5000)
    h = error_histogram(errs, mesh, nbins=32)
    assert int(h.sum()) == 5000
    # cross-check against numpy
    lo, hi = int(errs.min()), int(errs.max()) + 1
    width = max(1, (hi - lo + 31) // 32)
    ref = np.bincount(np.clip((errs - lo) // width, 0, 31), minlength=32)
    np.testing.assert_array_equal(h, ref)


def test_mesh_tp_axis():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[-1].shape  # one position per query
    assert np.asarray(out).min() >= 0  # all sampled queries must be found


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
