"""Tests for the stacked residual-MLP learned-index family
(parity targets: NN/preprocess.py scaling + NN/fit.py training +
NN/test.py row-space evaluation)."""

import jax
import numpy as np

from sapling_tpu.config import IndexConfig
from sapling_tpu.index.sapling import SaplingIndex
from sapling_tpu.models import residual
from sapling_tpu.ops.pack import kmers_scan
from sapling_tpu.sim.genomes import uniform_genome


def _dataset(n=8000, k=11, chunks=4):
    genome = uniform_genome(n, seed=5)
    idx = SaplingIndex.build(genome, IndexConfig(k=k, buckets=6))
    kmers = kmers_scan(idx.codes, k)
    ranks = np.asarray(idx.inv[: kmers.shape[0]])
    return idx, kmers, ranks, residual.prepare_dataset(kmers, ranks, chunks)


def test_prepare_dataset_scaling_roundtrip():
    _, kmers, ranks, ds = _dataset()
    # un-scaling the TRUE scaled residual must reproduce the true ranks
    order = np.argsort(kmers, kind="stable")
    ys = ranks[order].astype(np.float64)
    rows = ds.unscale_to_rows(ds.res[..., 0], ds.x[..., 0])[ds.valid]
    # res/x are stored float32; roundtrip error scales with res_ptp * eps.
    # Rows are integers, so well under 0.5 is lossless.
    np.testing.assert_allclose(rows, ys, atol=0.05)
    assert ds.x.min() >= 0 and ds.x.max() <= 1
    assert ds.res.min() >= 0 and ds.res.max() <= 1 + 1e-7


def test_training_reduces_loss_and_beats_line():
    _, kmers, ranks, ds = _dataset()
    trainer = residual.Trainer.create(
        jax.random.PRNGKey(0), num_chunks=ds.x.shape[0], layer_size=8
    )
    losses = trainer.fit(ds, epochs=200, convergence_window=60)
    assert losses[-1] < losses[0] * 0.9, "training did not reduce loss"
    rows = trainer.predict_rows(ds)
    order = np.argsort(kmers, kind="stable")
    true_rows = ranks[order].astype(np.float64)
    metrics = residual.error_percentiles(rows, true_rows)
    # the straight-line-only model corresponds to predicting scaled
    # residual = const; the MLP must do better than the line itself
    line_rows = ds.x[..., 0][ds.valid] * ds.line_m + ds.line_c
    line_err = np.abs(line_rows - true_rows).mean()
    assert metrics["mean"] < line_err


def test_sharded_training_step_runs():
    from sapling_tpu.parallel.mesh import make_mesh

    _, _, _, ds = _dataset(chunks=8)
    mesh = make_mesh(8, tp=2)
    trainer = residual.Trainer.create(
        jax.random.PRNGKey(1), num_chunks=ds.x.shape[0], layer_size=4
    )
    x, y, v = residual.shard_for_mesh(trainer, ds, mesh)
    step = trainer.train_step()
    params, _, loss = step(trainer.params, trainer.opt_state, x, y, v)
    assert np.isfinite(float(loss))
