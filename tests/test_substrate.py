"""Unit tests for the host substrate: SA-IS, Kasai, packing, FASTA."""

import numpy as np
import pytest

from sapling_tpu.index.suffix_array import (
    build_suffix_data,
    lcp_ge_k_runs,
)
from sapling_tpu.io.fasta import read_fasta
from sapling_tpu.native import build_suffix_array, lcp_kasai
from sapling_tpu.ops import pack as packops
from sapling_tpu.sim.genomes import uniform_genome

from .oracle import lcp_array, suffix_array_naive


@pytest.mark.parametrize("seed", range(5))
def test_sais_matches_naive(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 400))
    seq = uniform_genome(n, seed=seed)
    sa = build_suffix_array(seq)
    assert list(sa) == suffix_array_naive(bytes(seq))


def test_kasai_matches_naive():
    seq = uniform_genome(300, seed=42)
    sa = build_suffix_array(seq)
    inv, lcp = lcp_kasai(seq, sa)
    assert list(lcp) == lcp_array(bytes(seq), list(sa))
    assert (inv[sa] == np.arange(len(seq))).all()


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 1000).astype(np.uint8)
    words = packops.pack_codes(codes)
    assert (packops.unpack_words(words, 1000) == codes).all()


def test_pack_lexicographic():
    # aligned word comparison == base-wise lexicographic comparison
    rng = np.random.default_rng(1)
    for _ in range(100):
        a = rng.integers(0, 4, 16).astype(np.uint8)
        b = rng.integers(0, 4, 16).astype(np.uint8)
        wa = packops.pack_codes(a, pad_words=0)[0]
        wb = packops.pack_codes(b, pad_words=0)[0]
        assert (wa < wb) == (list(a) < list(b))


def test_kmerize_matches_oracle():
    from .oracle import OracleSapling

    seq = uniform_genome(200, seed=3)
    codes = packops.encode_bases(seq)
    o = OracleSapling(bytes(seq), k=8, buckets=4)
    for i in range(0, 150, 7):
        assert packops.kmerize(codes[i : i + 8], 8) == o.kmerize(bytes(seq[i : i + 8]))
    # short-query padding
    for ln in (3, 5, 7):
        got = packops.kmerize_adjusted(codes[:ln], ln, 8)
        assert got == o.kmerize_adjusted(ln, bytes(seq[:ln]))
        batch = packops.batch_kmers_adjusted(codes[:ln][None, :], 8)
        assert batch[0] == got


def test_kmers_scan():
    seq = uniform_genome(100, seed=5)
    codes = packops.encode_bases(seq)
    ks = packops.kmers_scan(codes, 9)
    for i in (0, 13, 91):
        assert ks[i] == packops.kmerize(codes[i : i + 9], 9)


def test_lcp_runs():
    rng = np.random.default_rng(2)
    lcp = rng.integers(0, 6, 50)
    fwd, bwd = lcp_ge_k_runs(lcp, 3)
    for i in range(50):
        f = 0
        while i + f < 50 and lcp[i + f] >= 3:
            f += 1
        assert fwd[i] == f
        b = 0
        while i - b >= 0 and lcp[i - b] >= 3:
            b += 1
        assert bwd[i] == b


def test_fasta_filtering(tmp_path):
    p = tmp_path / "g.fa"
    p.write_bytes(b">chr1 description here\nACgtN\nnACGT\n>chr2\nTTxxTT\n")
    g = read_fasta(str(p))
    assert bytes(g.seq) == b"ACGTACGTTTTT"
    assert g.chr_ends == [(8, "chr1"), (12, "chr2")]
    assert g.name_at(0) == ("chr1", 0)
    assert g.name_at(9) == ("chr2", 1)
