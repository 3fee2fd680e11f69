"""End-to-end aligner tests.

Byte-parity target: the reference `align` binary with its never-populated
`Sapling::sa` read fixed to the intended `lsa.inv` (the shipped binary
segfaults on the first verified seed; SURVEY.md §3.2). The oracle is built
by patching that one expression and compiling the otherwise-untouched
reference sources into tests/_build (gitignored).

Also checks simulation truth recovery (the reference's own evaluation
strategy, eval/Aligner/AlignmentQuality.java: chromosome + position
within 10bp).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from sapling_tpu.align.aligner import SeedExtendAligner
from sapling_tpu.config import AlignerConfig, IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.io.fasta import write_fasta
from sapling_tpu.io.fastq import read_fastq
from sapling_tpu.sim.genomes import simulate_reads, uniform_genome, write_fastq

HERE = os.path.dirname(os.path.abspath(__file__))
BUILD = os.path.join(HERE, "_build")
REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_align_bin():
    os.makedirs(BUILD, exist_ok=True)
    exe = os.path.join(BUILD, "align_fixed")
    if not os.path.exists(exe):
        # The patched oracle source is reference-derived; keep it OUTSIDE the
        # repo tree (temp dir) — only the compiled oracle binary lands in
        # tests/_build.
        import tempfile

        with tempfile.TemporaryDirectory(prefix="sapling_oracle_") as td:
            patched = os.path.join(td, "align_fixed.cpp")
            with open(os.path.join(REF_SRC, "align.cpp")) as f:
                src = f.read()
            src = src.replace("sapling->sa[ref_pos]", "sapling->lsa.inv[ref_pos]")
            with open(patched, "w") as f:
                f.write(src)
            cmd = [
                "g++", "-O2", "-std=c++11", "-msse4.1", "-o", exe, patched,
                os.path.join(REF_SRC, "ssw_cpp.cpp"), os.path.join(REF_SRC, "ssw.c"),
                "-I", REF_SRC,
            ]
            res = subprocess.run(cmd, capture_output=True, text=True)
            if res.returncode != 0:
                pytest.skip(f"reference align build failed: {res.stderr}")
    return exe


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("alncorpus")
    g = uniform_genome(120_000, seed=31)
    # two chromosomes to exercise the chrEnds logic
    ref_fa = str(d / "ref.fa")
    write_fasta(ref_fa, [("chr1", bytes(g[:70_000])), ("chr2", bytes(g[70_000:]))])
    reads, pos, isrc = simulate_reads(g, 120, 100, sub_rate=0.02, seed=8)
    fq = str(d / "reads.fq")
    write_fastq(fq, reads)
    return {"dir": str(d), "ref_fa": ref_fa, "fq": fq, "genome": g,
            "true_pos": pos, "is_rc": isrc}


def _run_ours(corpus, out_sam, cl):
    idx = SaplingIndex.from_fasta(corpus["ref_fa"], IndexConfig(k=16))
    aligner = SeedExtendAligner(idx, AlignerConfig())
    aligner.align_fastq(corpus["fq"], out_sam, cl=cl)
    return idx


def test_sam_byte_parity_vs_fixed_reference(ref_align_bin, corpus):
    d = corpus["dir"]
    ref_sam = os.path.join(d, "ref_out.sam")
    our_sam = os.path.join(d, "our_out.sam")
    res = subprocess.run(
        [ref_align_bin, corpus["fq"], corpus["ref_fa"], ref_sam],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr
    # reference @PG CL: echoes its argv; reproduce the same string
    cl = f"{ref_align_bin} {corpus['fq']} {corpus['ref_fa']} {ref_sam}"
    _run_ours(corpus, our_sam, cl)
    with open(ref_sam) as f:
        ref_lines = f.read().splitlines()
    with open(our_sam) as f:
        our_lines = f.read().splitlines()
    # the @PG line embeds differing output paths; compare it specially
    assert len(our_lines) == len(ref_lines)
    diffs = []
    for i, (a, b) in enumerate(zip(our_lines, ref_lines)):
        if a.startswith("@PG"):
            continue
        if a != b:
            diffs.append((i, a, b))
    assert not diffs, f"{len(diffs)} differing SAM lines; first: {diffs[0]}"


def test_sam_byte_parity_indel_reads(ref_align_bin, tmp_path):
    """Gap-path coverage: reads with short insertions/deletions must still
    produce byte-identical SAM (I/D cigar ops, gap-affected MAPQ/ZS)."""
    from sapling_tpu.sim.genomes import simulate_reads_indel

    d = str(tmp_path)
    g = uniform_genome(90_000, seed=77)
    ref_fa = os.path.join(d, "ref.fa")
    write_fasta(ref_fa, [("chrI", bytes(g))])
    reads, _pos, _rc = simulate_reads_indel(
        g, 80, 100, sub_rate=0.02, indel_rate=0.02, seed=12)
    fq = os.path.join(d, "reads.fq")
    write_fastq(fq, np.stack(reads))
    ref_sam = os.path.join(d, "ref_out.sam")
    our_sam = os.path.join(d, "our_out.sam")
    res = subprocess.run([ref_align_bin, fq, ref_fa, ref_sam],
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    idx = SaplingIndex.from_fasta(ref_fa, IndexConfig(k=16))
    SeedExtendAligner(idx, AlignerConfig()).align_fastq(fq, our_sam, cl="x")
    ref_lines = open(ref_sam).read().splitlines()
    our_lines = open(our_sam).read().splitlines()
    assert len(our_lines) == len(ref_lines)
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(our_lines, ref_lines))
             if a != b and not a.startswith("@PG")]
    n_gapped = sum("I" in l.split("\t")[5] or "D" in l.split("\t")[5]
                   for l in ref_lines if not l.startswith("@") and
                   l.split("\t")[1] != "4")
    assert not diffs, f"{len(diffs)} differing lines; first: {diffs[0]}"
    assert n_gapped >= 5, f"corpus too easy: only {n_gapped} gapped records"


def test_alignment_quality_vs_truth(corpus):
    """AlignmentQuality semantics (reference:
    eval/Aligner/AlignmentQuality.java:8-73): aligned position within 10bp
    of simulated truth."""
    d = corpus["dir"]
    our_sam = os.path.join(d, "qual_out.sam")
    _run_ours(corpus, our_sam, cl="x")
    g = corpus["genome"]
    truth = corpus["true_pos"]
    n_good = n_aligned = 0
    i = 0
    with open(our_sam) as f:
        for line in f:
            if line.startswith("@"):
                continue
            parts = line.rstrip("\n").split("\t")
            flag = int(parts[1])
            if flag != 4:
                n_aligned += 1
                chrom, pos1 = parts[2], int(parts[3]) - 1
                gpos = pos1 + (70_000 if chrom == "chr2" else 0)
                if abs(gpos - truth[i]) <= 10:
                    n_good += 1
            i += 1
    assert i == 120
    assert n_aligned >= 115, f"only {n_aligned}/120 aligned"
    assert n_good >= n_aligned - 2, f"{n_good}/{n_aligned} within 10bp"


def test_sam_byte_parity_repeat_heavy(ref_align_bin, tmp_path):
    """maxHits-clamping coverage: a tandem-repeat region gives 16-mer seeds
    with >32 occurrences, exercising the reference's dynamic offset
    clamping (src/align.cpp:310-321 — full clamped range only until a best
    exists, then offset 0 only) that the vectorized winner selection
    reproduces via the y0/eligibility model. Also includes reads at the
    genome's very end (off-end candidate windows)."""
    d = str(tmp_path)
    rng = np.random.default_rng(2024)
    unit = uniform_genome(180, seed=5)
    g = np.concatenate([
        uniform_genome(25_000, seed=61),
        np.tile(unit, 70),                      # ~12.6 kb tandem repeat
        uniform_genome(25_000, seed=62),
    ])
    ref_fa = os.path.join(d, "ref.fa")
    write_fasta(ref_fa, [("chrR", bytes(g))])
    n = len(g)
    starts = np.concatenate([
        rng.integers(24_000, 26_000, 40),       # span unique/repeat edge
        rng.integers(27_000, 35_000, 40),       # deep inside the repeat
        rng.integers(n - 140, n - 100, 10),     # at the genome end
        rng.integers(0, n - 100, 30),
    ])
    reads = []
    base_map = np.frombuffer(b"ACGT", np.uint8)
    for s in starts:
        r = g[s : s + 100].copy()
        mut = rng.random(100) < 0.02
        r[mut] = base_map[rng.integers(0, 4, mut.sum())]
        if rng.random() < 0.5:
            comp = {65: 84, 67: 71, 71: 67, 84: 65}
            r = np.array([comp[int(b)] for b in r[::-1]], np.uint8)
        reads.append(r)
    fq = os.path.join(d, "reads.fq")
    write_fastq(fq, np.stack(reads))
    ref_sam = os.path.join(d, "ref_out.sam")
    our_sam = os.path.join(d, "our_out.sam")
    res = subprocess.run([ref_align_bin, fq, ref_fa, ref_sam],
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    idx = SaplingIndex.from_fasta(ref_fa, IndexConfig(k=16))
    # sanity: the corpus really exercises the over-maxHits branch
    lft, rgt = idx.count_hits(np.asarray([idx.inv[30_000]]), 32)
    assert int(lft[0]) + int(rgt[0]) > 32
    SeedExtendAligner(idx, AlignerConfig()).align_fastq(fq, our_sam, cl="x")
    ref_lines = open(ref_sam).read().splitlines()
    our_lines = open(our_sam).read().splitlines()
    assert len(our_lines) == len(ref_lines)
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(our_lines, ref_lines))
             if a != b and not a.startswith("@PG")]
    assert not diffs, f"{len(diffs)} differing lines; first: {diffs[0]}"


def test_sam_byte_parity_mixed_length_reads(ref_align_bin, tmp_path):
    """Arbitrary per-record read lengths (reference src/align.cpp:174-190
    imposes no fixed length): a 60-150 bp mixed FASTQ must produce
    byte-identical SAM. Exercises the shape-bucket padding paths for
    variable valid-seed counts and variable SW window widths that the
    fixed-length corpora never hit (VERDICT r3 weak #5)."""
    d = str(tmp_path)
    rng = np.random.default_rng(404)
    g = uniform_genome(150_000, seed=19)
    ref_fa = os.path.join(d, "ref.fa")
    write_fasta(ref_fa, [("chrM", bytes(g[:90_000])),
                         ("chrN", bytes(g[90_000:]))])
    base_map = np.frombuffer(b"ACGT", np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    lengths = rng.integers(60, 151, 150)
    reads = []
    for L in lengths:
        s = int(rng.integers(0, len(g) - L))
        r = g[s : s + L].copy()
        mut = rng.random(L) < 0.02
        r[mut] = base_map[rng.integers(0, 4, mut.sum())]
        if rng.random() < 0.5:
            r = np.array([comp[int(b)] for b in r[::-1]], np.uint8)
        reads.append(r)
    fq = os.path.join(d, "reads.fq")
    write_fastq(fq, reads)
    ref_sam = os.path.join(d, "ref_out.sam")
    our_sam = os.path.join(d, "our_out.sam")
    res = subprocess.run([ref_align_bin, fq, ref_fa, ref_sam],
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    idx = SaplingIndex.from_fasta(ref_fa, IndexConfig(k=16))
    # small blocks + pipeline: mixed lengths inside AND across blocks
    SeedExtendAligner(idx, AlignerConfig()).align_fastq(
        fq, our_sam, cl="x", block=64, workers=2)
    ref_lines = open(ref_sam).read().splitlines()
    our_lines = open(our_sam).read().splitlines()
    assert len(our_lines) == len(ref_lines)
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(our_lines, ref_lines))
             if a != b and not a.startswith("@PG")]
    assert not diffs, f"{len(diffs)} differing lines; first: {diffs[0]}"


def test_pipelined_blocks_preserve_order_and_bytes(corpus):
    """align_fastq through the 2-worker align_blocks pipeline with many
    small blocks emits byte-identical SAM to a single-block run — block
    boundaries and thread overlap must not reorder or alter records."""
    d = corpus["dir"]
    idx = SaplingIndex.from_fasta(corpus["ref_fa"], IndexConfig(k=16))
    aligner = SeedExtendAligner(idx, AlignerConfig())
    one = os.path.join(d, "one_block.sam")
    many = os.path.join(d, "many_blocks.sam")
    aligner.align_fastq(corpus["fq"], one, cl="t", block=4096, workers=1)
    aligner.align_fastq(corpus["fq"], many, cl="t", block=16, workers=3)
    with open(one, "rb") as f1, open(many, "rb") as f2:
        assert f1.read() == f2.read()


def test_fused_winner_matches_two_dispatch(corpus, monkeypatch):
    """The fused one-dispatch score+select+begins program emits SAM
    byte-identical to the two-dispatch flow (separate forward SW, host
    winner selection, winner-row reverse pass)."""
    d = corpus["dir"]
    idx = SaplingIndex.from_fasta(corpus["ref_fa"], IndexConfig(k=16))
    aligner = SeedExtendAligner(idx, AlignerConfig())
    fused = os.path.join(d, "fused.sam")
    aligner.align_fastq(corpus["fq"], fused, cl="t")
    monkeypatch.setenv("SAPLING_ALIGN_FUSED", "0")
    two = os.path.join(d, "two_dispatch.sam")
    aligner.align_fastq(corpus["fq"], two, cl="t")
    with open(fused, "rb") as f1, open(two, "rb") as f2:
        assert f1.read() == f2.read()


def test_coalesced_seed_query_matches_per_block(corpus):
    """align_blocks with coalesce>1 (one padded seed-query dispatch per
    group of blocks) yields records byte-identical to per-block
    dispatches — per-lane query results must not depend on batch
    composition or shape-bucket padding."""
    d = corpus["dir"]
    idx = SaplingIndex.from_fasta(corpus["ref_fa"], IndexConfig(k=16))
    aligner = SeedExtendAligner(idx, AlignerConfig())
    a = os.path.join(d, "coalesce1.sam")
    b = os.path.join(d, "coalesce4.sam")
    aligner.align_fastq(corpus["fq"], a, cl="t", block=64, workers=2,
                        coalesce=1)
    aligner.align_fastq(corpus["fq"], b, cl="t", block=64, workers=2,
                        coalesce=4)
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read()


def test_shape_buckets():
    """Pad buckets: multiples of their grain, monotone, bounded waste."""
    from sapling_tpu.align.aligner import _shape_bucket
    from sapling_tpu.ops.sw import _pad_bucket

    for n in (1, 7, 1023, 1024, 1025, 82_591, 114_688, 164_000, 1 << 20):
        sb, pb = _shape_bucket(n), _pad_bucket(n)
        assert sb >= n and pb >= n
        assert sb < 2 * max(n, 1024) and pb < 2 * max(n, 256)
        assert pb % 256 == 0
        # 4-significant-bit grain: pad stays under one step
        step = 1 << max(n.bit_length() - 4, 0)
        if n > 1024:
            assert sb - n < step
        if n > 256:
            assert pb - n < max(256, step)
