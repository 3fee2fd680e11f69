"""Query-engine conformance: batched plQuery / binary search vs the oracle."""

import numpy as np
import pytest

from sapling_tpu.config import IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.io.fasta import Genome
from sapling_tpu.ops import pack as packops
from sapling_tpu.sim.genomes import gc_biased_genome, repeat_genome, uniform_genome

from .oracle import OracleSapling


def _index_and_oracle(seq, k, buckets):
    o = OracleSapling(bytes(seq), k=k, buckets=buckets)
    idx = SaplingIndex.build(
        Genome(seq=seq, chr_ends=[(len(seq), "sim")]),
        IndexConfig(k=k, buckets=buckets),
    )
    # build parity is asserted in test_pwl; sanity check bounds here
    assert (idx.table.most_over, idx.table.most_under) == (o.most_over, o.most_under)
    return idx, o


def _sample_queries(seq, num, length, seed, include_absent=True):
    rng = np.random.default_rng(seed)
    n = len(seq)
    pos = rng.integers(0, n - length + 1, num)
    q = seq[pos[:, None] + np.arange(length)]
    if include_absent:
        m = max(1, num // 8)
        rand = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, (m, length))
        ]
        q = np.concatenate([q, rand])
    return q


@pytest.mark.parametrize(
    "gen,k,buckets,length",
    [
        (lambda: uniform_genome(800, seed=10), 8, 5, 8),    # L == k
        (lambda: uniform_genome(800, seed=11), 8, 5, 5),    # L < k
        (lambda: uniform_genome(800, seed=12), 8, 5, 20),   # L > k
        (lambda: gc_biased_genome(1500, 0.85, seed=13), 10, 7, 10),
        (lambda: repeat_genome(900, 23, seed=14), 8, 6, 16),  # heavy repeats
        (lambda: uniform_genome(3000, seed=15), 12, 9, 12),
    ],
)
def test_plquery_position_parity(gen, k, buckets, length):
    seq = gen()
    idx, o = _index_and_oracle(seq, k, buckets)
    q = _sample_queries(seq, 200, length, seed=99)
    codes = packops.encode_bases(q)
    got = idx.query_positions(codes)
    for i in range(q.shape[0]):
        s = bytes(q[i])
        km = o.kmerize_adjusted(length, s)
        want = o.pl_query(s, km, length)
        assert got[i] == want, (
            f"lane {i}: got {got[i]} want {want} query {s.decode()}"
        )


def test_plquery_self_check():
    """Every in-genome query must land on a matching substring
    (reference correctness criterion: sapling_example.cpp:143-154)."""
    seq = uniform_genome(5000, seed=20)
    idx, _ = _index_and_oracle(seq, 10, 8)
    q = _sample_queries(seq, 500, 10, seed=21, include_absent=False)
    codes = packops.encode_bases(q)
    got = idx.query_positions(codes)
    ok = idx.verify_hits(codes, got)
    assert ok.all()


def test_binsearch_parity():
    seq = uniform_genome(1200, seed=30)
    idx, o = _index_and_oracle(seq, 8, 6)
    q = _sample_queries(seq, 150, 8, seed=31, include_absent=False)
    codes = packops.encode_bases(q)
    got = idx.query_positions_binsearch(codes)
    for i in range(q.shape[0]):
        want = o.b_query(bytes(q[i]))
        assert got[i] == want


def test_query_length_sweep_self_check():
    """Mirrors the reference's 6-length experiment sweep
    (sapling_example.cpp:91-99) at miniature scale."""
    seq = uniform_genome(4000, seed=40)
    k = 12
    idx, o = _index_and_oracle(seq, k, 8)
    for length in (k - 10, k, k + 10, k + 20, k + 30, k + 80):
        q = _sample_queries(seq, 64, length, seed=41 + length,
                            include_absent=False)
        codes = packops.encode_bases(q)
        got = idx.query_positions(codes)
        ok = idx.verify_hits(codes, got)
        # short queries can return any position matching the prefix; the
        # self-check criterion is substring equality, matching the reference.
        assert ok.all(), f"length={length}: {int((~ok).sum())} bad"
        for i in range(8):  # spot positional parity per length too
            s = bytes(q[i])
            want = o.pl_query(s, o.kmerize_adjusted(length, s), length)
            assert got[i] == want
