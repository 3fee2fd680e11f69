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


def test_split_fastq_single_shard_streaming(tmp_path):
    """shard=s writes ONLY that shard's file (each host materializes just
    its slice), byte-identical to the full split's file."""
    g = uniform_genome(20_000, seed=3)
    reads, _, _ = simulate_reads(g, 23, 80, sub_rate=0.01, seed=9)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads)

    full = split_fastq(fq, 4, str(tmp_path / "all"))
    for s in range(4):
        only = split_fastq(fq, 4, str(tmp_path / f"one{s}"), shard=s)
        present = sorted(os.listdir(tmp_path / f"one{s}"))
        assert present == [os.path.basename(only[s])]
        assert open(only[s], "rb").read() == open(full[s], "rb").read()
    # shards concatenate back to the record stream
    cat = b"".join(open(p, "rb").read() for p in full)
    assert cat == open(fq, "rb").read()


def test_two_process_distributed_sam(tmp_path):
    """REAL 2-process jax.distributed run: coordinator + two CPU worker
    processes drive initialize_distributed -> per-shard align -> psum
    barrier -> rank-0 merge; the merged SAM is byte-identical to a
    single-process run (SURVEY.md §4's multi-host test recipe)."""
    import socket
    import subprocess
    import sys

    g = uniform_genome(60_000, seed=13)
    idx = SaplingIndex.build(g, IndexConfig(k=16))
    idx.chr_ends = [(60_000, "chr1")]
    reads, _, _ = simulate_reads(g, 40, 100, sub_rate=0.02, seed=5)
    fq = str(tmp_path / "reads.fq")
    write_fastq(fq, reads)

    single = str(tmp_path / "single.sam")
    SeedExtendAligner(idx, AlignerConfig()).align_fastq(fq, single, cl="x")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out = str(tmp_path / "merged.sam")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), fq, out,
             str(tmp_path / "work")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    assert open(out).read() == open(single).read()
