"""Index-sharded query engine: bit parity with the single-device engine.

The sharded engine distributes the per-rank arrays over a mesh axis and
combines probes with psum (sapling_tpu.parallel.sharded_index); nothing
about the decision sequence changes, so every output — hit positions
including which duplicate rank is returned, and -1 not-founds — must be
EXACTLY equal to SaplingIndex.query_positions, which is itself
reference-parity-tested (tests/test_query.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sapling_tpu.config import IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.ops.query import SplitRanks, take_rank
from sapling_tpu.parallel.mesh import make_mesh
from sapling_tpu.parallel.sharded_index import IndexShardedEngine
from sapling_tpu.sim.genomes import repeat_genome, uniform_genome


@pytest.fixture(scope="module")
def idx():
    # repeats up front so duplicate-rank tie-breaking is exercised
    g = np.concatenate([repeat_genome(4096, period=96, seed=7),
                        uniform_genome((1 << 14) - 4096, seed=77)])
    return SaplingIndex.build(g, IndexConfig(k=21, buckets=10))


def _mixed_queries(idx, length, nq=512, seed=3):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, idx.n - length + 1, nq)
    codes = idx.codes[starts[:, None] + np.arange(length)].copy()
    # a quarter random (mostly absent -> -1 / stride-scan paths)
    codes[: nq // 4] = rng.integers(0, 4, (nq // 4, length), dtype=np.uint8)
    return codes


@pytest.mark.parametrize("dp,nidx", [(2, 4), (1, 8), (4, 2)])
def test_sharded_parity_k21(idx, dp, nidx):
    mesh = make_mesh(dp * nidx, tp=nidx, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh)
    codes = _mixed_queries(idx, 21)
    want = idx.query_positions(codes)
    got = eng.query_positions(codes)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("length", [11, 31])
def test_sharded_parity_lengths(idx, length):
    """Short queries (< k: kmerizeAdjusted path) and long queries (> k:
    phase-C stride scan) through the sharded probes."""
    mesh = make_mesh(8, tp=4, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh)
    codes = _mixed_queries(idx, length, nq=256, seed=9)
    np.testing.assert_array_equal(
        eng.query_positions(codes), idx.query_positions(codes))


def test_sharded_parity_split_storage(idx):
    """SplitRanks (uint32 lo + uint8 hi) storage — the 5 B/rank layout for
    >= 4.3 Gbp genomes — returns identical positions."""
    mesh = make_mesh(8, tp=2, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh, rev_storage="split")
    codes = _mixed_queries(idx, 21, nq=256, seed=11)
    np.testing.assert_array_equal(
        eng.query_positions(codes), idx.query_positions(codes))


def test_sharded_parity_no_prefix(idx):
    """The packed-genome probe path (what a >HBM genome actually runs —
    per-rank prefix arrays are dropped first at that scale)."""
    mesh = make_mesh(8, tp=4, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh, use_prefix=False)
    codes = _mixed_queries(idx, 21, nq=256, seed=13)
    np.testing.assert_array_equal(
        eng.query_positions(codes), idx.query_positions(codes))


def test_sharded_binsearch_parity(idx):
    mesh = make_mesh(8, tp=4, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh)
    codes = _mixed_queries(idx, 21, nq=256, seed=15)
    np.testing.assert_array_equal(
        eng.query_positions_binsearch(codes),
        idx.query_positions_binsearch(codes))


def test_split_ranks_40bit_values():
    """take_rank on SplitRanks reassembles positions above 2^32 exactly
    (wheat-scale 40-bit text positions; no 14 Gbp build fits this host, so
    the storage path is proven on synthetic values)."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 14_300_000_000, 4096).astype(np.int64)
    sr = SplitRanks(lo=jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)),
                    hi=jnp.asarray((vals >> 32).astype(np.uint8)))
    i = rng.integers(0, 4096, 1000)
    got = np.asarray(take_rank(sr, jnp.asarray(i)))
    np.testing.assert_array_equal(got, vals[i])


def test_sharded_adaptive_bounds(idx):
    """adaptive_bounds through the sharded probes: must equal the
    single-device adaptive engine exactly (identical ladder, distributed
    gathers)."""
    from sapling_tpu.config import QueryConfig

    mesh = make_mesh(8, tp=4, axes=("dp", "idx"))
    eng = IndexShardedEngine(idx, mesh)
    codes = _mixed_queries(idx, 21, nq=256, seed=21)
    want = idx.query_positions(codes, QueryConfig(adaptive_bounds=True))
    got = eng.query_positions(codes, adaptive_bounds=True)
    np.testing.assert_array_equal(got, want)
