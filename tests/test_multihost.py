"""Multi-host orchestration tests (single-process degradation + shard
merge determinism: concatenated shard output must be byte-identical to a
single-stream run)."""

import os

import numpy as np

from sapling_tpu.align.aligner import SeedExtendAligner
from sapling_tpu.align.sam import sam_header
from sapling_tpu.config import AlignerConfig, IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.parallel.multihost import (
    align_shard, merge_sam, shard_bounds, split_fastq)
from sapling_tpu.sim.genomes import simulate_reads, uniform_genome, write_fastq


def test_shard_bounds_cover_exactly():
    for n in (0, 1, 7, 100, 101):
        for s in (1, 2, 3, 8):
            spans = [shard_bounds(n, s, i) for i in range(s)]
            covered = []
            for lo, hi in spans:
                covered.extend(range(lo, hi))
            assert covered == list(range(n)), (n, s)


def test_sharded_sam_equals_single_stream(tmp_path):
    g = uniform_genome(60_000, seed=13)
    idx = SaplingIndex.build(g, IndexConfig(k=16))
    idx.chr_ends = [(60_000, "chr1")]
    reads, _, _ = simulate_reads(g, 60, 100, sub_rate=0.02, seed=5)
    fq = str(tmp_path / "reads.fq")
    write_fastq(fq, reads)

    single = str(tmp_path / "single.sam")
    SeedExtendAligner(idx, AlignerConfig()).align_fastq(fq, single, cl="x")

    shards = split_fastq(fq, 4, str(tmp_path / "sh"))
    bodies = []
    for s, sf in enumerate(shards):
        body = str(tmp_path / f"body{s}.sam")
        align_shard(idx, sf, body, AlignerConfig())
        bodies.append(body)
    merged = str(tmp_path / "merged.sam")
    merge_sam(sam_header(idx.chr_ends, "x"), bodies, merged)
    assert open(merged).read() == open(single).read()
