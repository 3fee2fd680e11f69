"""Subprocess body for the REAL 2-process `jax.distributed` test
(tests/test_multihost.py::test_two_process_distributed_sam).

Each process connects to the coordinator, builds the same deterministic
index, and runs align_fastq_multihost — exercising the actual
initialize/align/barrier/merge path across process boundaries (the
reference has nothing distributed to test; SURVEY.md §4 calls for
multi-host tests runnable on CPU via jax.distributed).

Not a pytest module (no test_ prefix): invoked as
    python multihost_worker.py <coord> <nproc> <pid> <fastq> <out_sam> <work>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
os.environ["XLA_FLAGS"] = ""  # one local CPU device per process

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main() -> int:
    coord, nproc, pid, fastq, out_sam, work = sys.argv[1:7]
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sapling_tpu.config import AlignerConfig, IndexConfig
    from sapling_tpu.index.sapling import SaplingIndex
    from sapling_tpu.parallel.multihost import (
        align_fastq_multihost, initialize_distributed)
    from sapling_tpu.sim.genomes import uniform_genome

    p, n = initialize_distributed(coord, int(nproc), int(pid))
    assert (p, n) == (int(pid), int(nproc)), (p, n)

    g = uniform_genome(60_000, seed=13)
    idx = SaplingIndex.build(g, IndexConfig(k=16))
    idx.chr_ends = [(60_000, "chr1")]
    align_fastq_multihost(idx, fastq, out_sam, cl="x", cfg=AlignerConfig(),
                          work_dir=work)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
