"""Evaluation toolkit tests (SURVEY.md §2 components #14-21 equivalents),
each checked against brute force on small seeded genomes."""

import numpy as np

from sapling_tpu.config import IndexConfig
from sapling_tpu.evalx.alignment_quality import compare_sam, truth_sam_lines
from sapling_tpu.evalx.bins import best_and_worst_bins, bin_scatter, per_bin_errors
from sapling_tpu.evalx.kmer_stats import kmer_spectrum
from sapling_tpu.evalx.memory import index_memory_report
from sapling_tpu.evalx.sa_sample import sample_for_plot, sample_sa
from sapling_tpu.index.pwl import build_pwl
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.index.suffix_array import build_suffix_data
from sapling_tpu.ops.pack import encode_bases
from sapling_tpu.sim.genomes import repeat_genome, uniform_genome


def test_kmer_spectrum_vs_bruteforce():
    g = np.concatenate([uniform_genome(800, seed=3), repeat_genome(200, 7, seed=4)])
    sd = build_suffix_data(g)
    spec = kmer_spectrum(sd.lcp, g.shape[0], max_k=12)
    seq = g.tobytes()
    for k in (1, 2, 3, 5, 8, 12):
        kmers = [seq[i : i + k] for i in range(len(seq) - k + 1)]
        from collections import Counter

        c = Counter(kmers)
        assert spec["distinct"][k - 1] == len(c), k
        assert spec["unique"][k - 1] == sum(v == 1 for v in c.values()), k
        assert spec["total"][k - 1] == len(kmers)


def test_sa_sample_matches_reference_semantics():
    g = uniform_genome(3000, seed=5)
    sd = build_suffix_data(g)
    codes = encode_bases(g)
    ranks, kmers = sample_sa(codes, sd.inv, k=11, stride=1)
    assert ranks.shape[0] == 3000 - 11 + 1
    # rank must be the suffix-array rank of that position
    np.testing.assert_array_equal(ranks, np.asarray(sd.inv[: ranks.shape[0]]))
    r2, k2 = sample_for_plot(codes, sd.inv, k=11, target_points=100)
    assert 90 <= r2.shape[0] <= 210


def test_per_bin_and_highlight():
    g = uniform_genome(20_000, seed=6)
    sd = build_suffix_data(g)
    codes = encode_bases(g)
    table, audit, kmers = build_pwl(codes, sd.inv, sd.lcp, 21, 8,
                                    return_audit=True)
    stats = per_bin_errors(audit, kmers, 21, 8)
    assert stats["count"].sum() == kmers.shape[0]
    assert stats["p95"] >= 0
    bw = best_and_worst_bins(audit, kmers, 21, 8, count=3)
    assert len(bw["best"]) == 3 and len(bw["worst"]) == 3
    worst = bw["worst"][0]
    assert stats["max"][worst] == max(
        stats["max"][b] for b in range(256) if stats["count"][b] > 0)
    xs, ys = bin_scatter(kmers, sd.inv[: kmers.shape[0]], 21, 8, worst)
    assert xs.shape == ys.shape and xs.shape[0] == stats["count"][worst]


def test_alignment_quality_compare():
    truth = truth_sam_lines(["r1", "r2", "r3", "r4"], ["c", "c", "c", "c"],
                            [100, 200, 300, 400])
    got = [
        "r1\t0\tc\t105\t60\t*\t*\t0\t0\t*\t*",   # within 10 -> good
        "r2\t0\tc\t250\t60\t*\t*\t0\t0\t*\t*",   # off by 49 -> bad
        "r3\t4\t*\t0\t255\t*\t*\t0\t0\t*\t*",    # unaligned
    ]
    rep = compare_sam(got, truth)
    assert (rep.good, rep.bad, rep.unaligned, rep.missing) == (1, 1, 1, 1)


def test_memory_report():
    g = uniform_genome(10_000, seed=7)
    idx = SaplingIndex.build(g, IndexConfig(k=21, buckets=8))
    rep = index_memory_report(idx)
    assert rep["total_bytes"] > 0
    assert rep["device_hot_bytes"] < rep["total_bytes"]
    assert 0 < rep["pwl_overhead_frac"] < 1
