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
    assert losses.ndim == 2 and losses.shape[1] == ds.x.shape[0]
    assert losses[-1].mean() < losses[0].mean() * 0.9, \
        "training did not reduce loss"
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


def test_per_chunk_convergence_matches_scalar_reruns():
    """Each chunk's early-stop epoch (and best loss) in the one vmapped
    program equals a standalone single-chunk training run — the
    reference's actual execution model (one process per chunk,
    fit.py:259-277)."""
    import jax.numpy as jnp

    _, _, _, ds = _dataset(n=4000, chunks=3)
    trainer = residual.Trainer.create(
        jax.random.PRNGKey(3), num_chunks=ds.x.shape[0], layer_size=6)
    init_params = jax.tree.map(lambda a: np.asarray(a), trainer.params)
    losses = trainer.fit(ds, epochs=150, convergence_window=25)
    stops = trainer.stop_epochs.copy()

    for c in range(ds.x.shape[0]):
        sub = residual.ResidualDataset(
            x=ds.x[c : c + 1], res=ds.res[c : c + 1],
            valid=ds.valid[c : c + 1], res_min=ds.res_min,
            res_ptp=ds.res_ptp, line_m=ds.line_m, line_c=ds.line_c,
            x_max=ds.x_max)
        sp = [{k: jnp.asarray(v[c : c + 1]) for k, v in layer.items()}
              for layer in init_params]
        solo = residual.Trainer(params=sp, opt=trainer.opt,
                                opt_state=trainer.opt.init(sp))
        solo_losses = solo.fit(sub, epochs=150, convergence_window=25)
        assert solo.stop_epochs[0] == stops[c], (
            f"chunk {c}: stacked stop {stops[c]} vs solo "
            f"{solo.stop_epochs[0]}")
        np.testing.assert_allclose(solo_losses[:, 0],
                                   losses[: len(solo_losses), c],
                                   rtol=1e-5, atol=1e-7)


def test_per_chunk_batch_sampling_is_independent():
    """Minibatch indices differ across chunks within an epoch (the
    reference's per-process DataLoader shuffles independently)."""
    _, _, _, ds = _dataset(n=4000, chunks=3)
    trainer = residual.Trainer.create(
        jax.random.PRNGKey(4), num_chunks=ds.x.shape[0], layer_size=4)
    sel = np.stack([
        np.random.default_rng([0, 0, ci]).choice(ds.x.shape[1], size=16,
                                                 replace=False)
        for ci in range(3)])
    assert not np.array_equal(sel[0], sel[1])
    # and the loop accepts batch= without shape errors
    losses = trainer.fit(ds, epochs=5, batch=16)
    assert losses.shape == (5, 3)
