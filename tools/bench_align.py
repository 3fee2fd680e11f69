#!/usr/bin/env python
"""End-to-end aligner throughput benchmark.

Simulated reads against a cached benchmark genome, full FASTQ -> SAM
pipeline (seeding + SW extension + traceback + emission), reads/sec
measured wall-clock with results materialized, plus simulation-truth
quality (AlignmentQuality semantics, eval/Aligner/AlignmentQuality.java).

    python tools/bench_align.py [n=230000000] [reads=50000] [len=100]
        [sub=0.01] [block=8192]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np


def main(argv):
    from sapling_tpu.align.aligner import SeedExtendAligner
    from sapling_tpu.config import AlignerConfig, IndexConfig, parse_keyval_args
    from sapling_tpu.index.sapling import SaplingIndex
    from sapling_tpu.io.fastq import Read
    from sapling_tpu.sim.genomes import benchmark_genome, simulate_reads

    kv = parse_keyval_args(argv[1:])
    n = int(kv.get("n", 230_000_000))
    n_reads = int(kv.get("reads", 50_000))
    rlen = int(kv.get("len", 100))
    sub = float(kv.get("sub", 0.01))
    block = int(kv.get("block", 8192))

    cache = os.path.join(_ROOT, ".bench_cache", f"align_{n}_k16.stpu.npz")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    t0 = time.time()
    if os.path.exists(cache):
        idx = SaplingIndex.load(cache)
        genome = None
    else:
        genome = benchmark_genome(n)
        idx = SaplingIndex.build(genome, IndexConfig(k=16))
        idx.save(cache)
    print(f"index ready ({time.time()-t0:.0f}s, n={idx.n})", flush=True)

    from sapling_tpu.ops.pack import decode_bases

    g_ascii = decode_bases(idx.codes)
    reads_arr, pos, is_rc = simulate_reads(g_ascii, n_reads, rlen,
                                           sub_rate=sub, seed=42)
    reads = [Read(name=f"r{i}", seq=reads_arr[i].tobytes(), qual="I" * rlen)
             for i in range(n_reads)]
    aligner = SeedExtendAligner(idx, AlignerConfig())

    # warm compiles on the first block
    aligner.align_block(reads[: min(block, n_reads)])
    aligner.phase_seconds.clear()
    workers = int(kv.get("workers", 2))
    t0 = time.time()
    n_aligned = n_good = 0
    blocks = (reads[lo : lo + block] for lo in range(0, n_reads, block))
    ri = 0
    for out in aligner.align_blocks(blocks, workers=workers):
        for ar in out:
            if ar.aligned:
                n_aligned += 1
                if abs((ar.alignment.ref_begin) - pos[ri]) <= 10:
                    n_good += 1
            ri += 1
    dt = time.time() - t0
    print(f"aligned {n_reads} reads in {dt:.2f}s -> {n_reads/dt:,.0f} reads/s")
    print(f"aligned: {n_aligned}/{n_reads}; within 10bp of truth: {n_good}")
    tot = sum(aligner.phase_seconds.values()) or 1.0
    print("phases: " + "  ".join(
        f"{k}={v:.2f}s({100*v/tot:.0f}%)"
        for k, v in sorted(aligner.phase_seconds.items(),
                           key=lambda kv: -kv[1])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
