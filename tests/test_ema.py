"""Weight-EMA extension: jitted update math, checkpoint schema, --use_ema.

The reference trains without a weight EMA; this framework adds one as an
opt-in (`train_ddpm.py --ema_decay`, `reconstruct.py --use_ema`). The EMA is
updated inside the jitted train step and rides the checkpoint as
`ema_model_state_dict`; EMA-off runs keep the reference's exact checkpoint
schema (src/trainers/base.py:166-187).
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.data.csv_splits import write_split_csv
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_ema_update_matches_recurrence():
    """state.ema_params after N jitted steps == the host-side recurrence
    ema <- d*ema + (1-d)*params applied to the observed params sequence."""
    decay = 0.75
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    state = make_ddpm_state(
        unet, jax.random.PRNGKey(0), (8, 8, 1), learning_rate=1e-3, with_ema=True
    )
    # EMA starts as a copy of the init params
    for e, p in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step = DDPMTrainStep(sched=sched, ema_decay=decay).make_train_step()
    expected = jax.tree_util.tree_map(np.asarray, state.params)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, key = jax.random.split(rng)
        images = jax.random.uniform(key, (4, 8, 8, 1))
        state, _ = step(state, images, key)
        expected = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            expected,
            state.params,
        )
    for e, want in zip(_leaves(state.ema_params), _leaves(expected)):
        np.testing.assert_allclose(np.asarray(e), want, rtol=2e-6, atol=2e-7)
    # EMA lags the raw weights (they moved; the average must differ)
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(_leaves(state.ema_params), _leaves(state.params))
    ]
    assert max(diffs) > 0


def test_ema_disabled_keeps_reference_schema():
    state = make_ddpm_state(
        make_unet("tiny", 2, 1, 1), jax.random.PRNGKey(0), (8, 8, 1)
    )
    assert state.ema_params is None


def _dataset(root: Path, name: str, n: int):
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n):
        p = d / f"{name}_{i}.npy"
        np.save(p, rng.uniform(size=(1, 16, 16)).astype(np.float32))
        paths.append(str(p))
    csv = root / f"{name}.csv"
    write_split_csv(paths, str(csv))
    return str(csv)


def _args(root, train_csv, val_csv, **over):
    ns = argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="ema_run",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=16, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=4, n_epochs=1,
        eval_freq=10, augmentation=0, num_workers=2, cache_data=1,
        checkpoint_every=10, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0, ema_decay=0.5,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def ema_run(tmp_path_factory):
    """One short EMA training run shared by the checkpoint-consumer tests."""
    from ddpm_ood_tpu.trainers import DDPMTrainer

    root = tmp_path_factory.mktemp("ema")
    train_csv = _dataset(root, "train", 8)
    val_csv = _dataset(root, "val", 4)
    args = _args(root, train_csv, val_csv)
    trainer = DDPMTrainer(args)
    trainer.train(args)
    ema_host = jax.tree_util.tree_map(np.asarray, trainer.state.ema_params)
    raw_host = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    return root, train_csv, val_csv, ema_host, raw_host


def test_ema_checkpointed_and_resumed(ema_run):
    from ddpm_ood_tpu.trainers import DDPMTrainer
    from ddpm_ood_tpu.utils import checkpoint as ckpt

    root, train_csv, val_csv, ema_host, _ = ema_run
    run_dir = root / "output" / "ema_run"
    assert "ema_model_state_dict" in ckpt.checkpoint_keys(run_dir / "checkpoint")

    # resume restores the averaged weights, not a fresh copy of the raw ones
    t2 = DDPMTrainer(_args(root, train_csv, val_csv))
    assert t2.found_checkpoint
    got = _leaves(t2.state.ema_params)
    want = _leaves(ema_host)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6)


def test_reconstruct_use_ema_swaps_weights(ema_run):
    from ddpm_ood_tpu.trainers import Reconstruct

    root, train_csv, val_csv, ema_host, raw_host = ema_run

    def rargs(use_ema):
        return _args(
            root, train_csv, val_csv,
            in_ids=val_csv, out_ids=val_csv, first_n=None, first_n_val=None,
            run_val=0, run_in=0, run_out=0, num_inference_steps=5,
            inference_skip_factor=2, drop_last=False, eval_checkpoint=None,
            use_ema=use_ema, ema_decay=0.0,
        )

    recon = Reconstruct(rargs(use_ema=1))
    for g, w in zip(_leaves(recon.state.params), _leaves(ema_host)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6)

    # default path on the same (EMA-carrying) checkpoint: raw weights
    recon_raw = Reconstruct(rargs(use_ema=0))
    for g, w in zip(_leaves(recon_raw.state.params), _leaves(raw_host)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6)


def test_use_ema_without_ema_checkpoint_raises(tmp_path):
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    train_csv = _dataset(tmp_path, "train", 8)
    val_csv = _dataset(tmp_path, "val", 4)
    args = _args(tmp_path, train_csv, val_csv, ema_decay=0.0,
                 model_name="no_ema_run")
    DDPMTrainer(args).train(args)
    rargs = _args(
        tmp_path, train_csv, val_csv, model_name="no_ema_run",
        in_ids=val_csv, out_ids=val_csv, first_n=None, first_n_val=None,
        run_val=0, run_in=0, run_out=0, num_inference_steps=5,
        inference_skip_factor=2, drop_last=False, eval_checkpoint=None,
        use_ema=1, ema_decay=0.0,
    )
    with pytest.raises(RuntimeError, match="use_ema"):
        Reconstruct(rargs)
