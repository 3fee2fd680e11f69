"""Manber-Myers llcp/rlcp-pruned binary search (the reference's unused
`fancyBinarySearch`, src/binarysearch.cpp:90-153) — lane-for-lane parity
against a scalar replica of the reference decision sequence (with
llcp/rlcp built over the search interval; see build_llcp_rlcp)."""

import numpy as np

from sapling_tpu.config import IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.index.suffix_array import build_llcp_rlcp
from sapling_tpu.ops import pack as packops
from sapling_tpu.ops.query import binsearch_batch, fancy_binsearch_batch
from sapling_tpu.sim.genomes import uniform_genome


def _scalar_fancy(codes, rev, llcp, rlcp, q, n):
    """Literal scalar replica of bQuery -> fancyBinarySearch
    (binarysearch.cpp:90-165), llcp/rlcp over (0, n-1)."""
    length = len(q)

    def get_lcp(idx):
        l = 0
        while idx + l < n and l < length and codes[idx + l] == q[l]:
            l += 1
        return l

    def too_small(idx, nlcp):
        return nlcp + idx == n or (nlcp < length and idx + nlcp < n
                                   and q[nlcp] > codes[idx + nlcp])

    l0 = get_lcp(rev[0])
    if l0 == length:
        return rev[0]
    l1 = get_lcp(rev[n - 1])
    if l1 == length:
        return rev[n - 1]

    lo, hi, lo_lcp, hi_lcp = 0, n - 1, l0, l1
    while True:
        if hi == lo + 1:
            return -1                      # reference: n+1 sentinel
        if hi == lo + 2:
            return rev[lo + 1]             # unverified, like the reference
        mid = (lo + hi) >> 1
        if lo_lcp >= hi_lcp:
            if llcp[mid] > lo_lcp:
                lo = mid
                continue
            if llcp[mid] < lo_lcp:
                hi, hi_lcp = mid, llcp[mid]
                continue
        else:
            if rlcp[mid] > hi_lcp:
                hi = mid
                continue
            if rlcp[mid] < hi_lcp:
                lo, lo_lcp = mid, rlcp[mid]
                continue
        idx = rev[mid]
        nlcp = get_lcp(idx)
        if nlcp == length:
            return rev[mid]
        if too_small(idx, nlcp):
            lo, lo_lcp = mid, nlcp
        else:
            hi, hi_lcp = mid, nlcp


def test_fancy_binsearch_matches_scalar_and_selfchecks():
    g = uniform_genome(60_000, seed=21)
    idx = SaplingIndex.build(g, IndexConfig(k=13, buckets=8))
    n = idx.n
    from sapling_tpu.index.suffix_array import build_suffix_data

    suffix = build_suffix_data(g)
    llcp, rlcp = build_llcp_rlcp(np.asarray(suffix.lcp, np.int64), n)

    rng = np.random.default_rng(3)
    L = 13
    starts = rng.integers(0, n - L, 400)
    codes2d = idx.codes[starts[:, None] + np.arange(L)]
    # plus absent queries (not in genome): random codes
    absent = rng.integers(0, 4, (100, L)).astype(np.uint8)
    codes2d = np.concatenate([codes2d, absent])

    dev = idx.device_arrays()
    q_words = packops.pack_queries(codes2d)
    pos = np.asarray(fancy_binsearch_batch(
        dev["packed"], dev["rev"], llcp, rlcp, q_words, n=n, length=L))

    rev = np.asarray(idx.rev, np.int64)
    for i in range(codes2d.shape[0]):
        want = _scalar_fancy(idx.codes, rev, llcp, rlcp, codes2d[i], n)
        assert pos[i] == want, (i, pos[i], want)

    # present queries must all verify (the fancy path is still a correct
    # suffix-array search)
    good = idx.verify_hits(codes2d[:400], pos[:400])
    assert good.all()

    # and the plain baseline agrees on which queries it can verify
    bs = np.asarray(binsearch_batch(dev["packed"], dev["rev"], q_words,
                                    n=n, length=L))
    assert idx.verify_hits(codes2d[:400], bs[:400]).all()
