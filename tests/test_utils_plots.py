"""Smoke tests for plotting + profiling utilities."""

import os

import numpy as np

from sapling_tpu.evalx import plots
from sapling_tpu.utils.profiling import bench_fn, device_timer, log_event


def test_plots_produce_pngs(tmp_path):
    d = str(tmp_path)
    p1 = plots.timing_plot(
        [4.6e6, 1e8, 3e9],
        {"sapling-tpu": [1e7, 9e6, 8e6], "binary search": [6e5, 5e5, 4e5]},
        os.path.join(d, "timing.png"))
    p2 = plots.memory_plot(["ours", "bowtie"], [1.2, 12.3],
                           os.path.join(d, "mem.png"))
    rng = np.random.default_rng(0)
    p3 = plots.sa_shape_plot(rng.integers(0, 1 << 30, 5000),
                             rng.integers(0, 5000, 5000),
                             os.path.join(d, "sa.png"))
    p4 = plots.error_histogram_plot(rng.normal(0, 5, 10000).astype(int),
                                    os.path.join(d, "err.png"))
    p5 = plots.query_length_plot([11, 21, 31], {"x": [1e6, 2e6, 3e6]},
                                 os.path.join(d, "ql.png"))
    xl = np.array([0, 100, 200], dtype=np.int64)
    yl = np.array([0, 50, 100], dtype=np.int64)
    p6 = plots.bin_scatter_plot(rng.integers(0, 100, 200),
                                rng.integers(0, 50, 200), xl, yl, 0, 21, 1,
                                os.path.join(d, "bin.png"))
    for p in (p1, p2, p3, p4, p5, p6):
        assert os.path.getsize(p) > 1000


def test_profiling_helpers():
    import jax.numpy as jnp

    with device_timer("t1") as out:
        out["result"] = jnp.arange(10).sum()
    assert out["seconds"] >= 0
    secs, res = bench_fn(lambda x: x * 2, jnp.ones(8), warmup=1, iters=2)
    assert secs >= 0 and float(res.sum()) == 16
    log_event("test", foo=1)
