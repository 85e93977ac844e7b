"""BaseTrainer unit helpers: shape derivation, layout transpose, tuple parsing."""

import numpy as np

from ddpm_ood_tpu.trainers.base import _as_tuple, channels_last


def test_as_tuple_parsing():
    assert _as_tuple(None) is None
    assert _as_tuple("") is None
    assert _as_tuple("(2, 2, 0, 0)") == (2, 2, 0, 0)
    assert _as_tuple([1, 2]) == (1, 2)
    assert _as_tuple((3,)) == (3,)


def test_channels_last_roundtrip():
    x = np.random.default_rng(0).uniform(size=(2, 3, 8, 9)).astype(np.float32)
    y = channels_last(x)
    assert y.shape == (2, 8, 9, 3)
    np.testing.assert_array_equal(y[..., 1], x[:, 1])


def test_latent_sample_shape_with_pad():
    # exercise the pad arithmetic without instantiating a full trainer
    from types import SimpleNamespace

    from ddpm_ood_tpu.trainers.base import BaseTrainer

    self = SimpleNamespace(
        image_size=32, image_roi=None, spatial_dimension=2,
        vqvae_vars={"x": 1},  # truthy -> latent path
        vqvae_config={"downsample_parameters": [(2, 4, 1, 1), (2, 4, 1, 1)]},
        do_latent_pad=True, latent_pad=(1, 1, 2, 2), ddpm_channels=4,
    )
    shape = BaseTrainer._latent_sample_shape(self)
    # 32 / (2*2) = 8 per axis; torch pad order: last dim gets (1,1), first (2,2)
    assert shape == (8 + 4, 8 + 2, 4)


def test_lr_warmup_schedule():
    """--lr_warmup_steps: step 1 runs at lr 0 (params unchanged), later steps
    at ramped lr (params move); warmup off keeps the reference-era optimizer
    state tree (no schedule count leaf)."""
    import jax
    import jax.numpy as jnp

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    state = make_ddpm_state(
        unet, jax.random.PRNGKey(0), (8, 8, 1), learning_rate=1e-3,
        lr_warmup_steps=4,
    )
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    step = DDPMTrainStep(sched=sched).make_train_step()
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(4, 8, 8, 1)).astype(np.float32)
    )
    state, _ = step(state, images, jax.random.PRNGKey(1))
    # first optimizer step sees schedule(0) = 0.0 -> no movement
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    state, _ = step(state, images, jax.random.PRNGKey(2))
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state.params))
    )
    assert moved

    # warmup off: opt_state tree identical to the plain-Adam reference schema
    plain = make_ddpm_state(unet, jax.random.PRNGKey(0), (8, 8, 1))
    warm = make_ddpm_state(
        unet, jax.random.PRNGKey(0), (8, 8, 1), lr_warmup_steps=4
    )
    plain_tree = jax.tree_util.tree_structure(plain.opt_state)
    warm_tree = jax.tree_util.tree_structure(warm.opt_state)
    assert plain_tree != warm_tree  # schedule adds state (documented)
    again = make_ddpm_state(unet, jax.random.PRNGKey(0), (8, 8, 1))
    assert jax.tree_util.tree_structure(again.opt_state) == plain_tree
