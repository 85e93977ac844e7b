"""Simplex-noise training path: external (t, noise) train step + host generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.noise import _native
from ddpm_ood_tpu.noise.simplex import Simplex, generate_simplex_noise
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state


def test_external_noise_train_step():
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 1000)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    step = DDPMTrainStep(sched=sched, external_noise=True).make_train_step()
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    )
    t = jnp.asarray([10, 200, 500, 900], dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(1), images.shape)
    state2, loss = step(state, images, t, noise)
    assert np.isfinite(float(loss))
    a = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(a)).all()


@pytest.mark.skipif(not _native.available(), reason="native opensimplex unavailable")
def test_simplex_noise_feeds_train_step():
    np.random.seed(0)
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 1000)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    step = DDPMTrainStep(sched=sched, external_noise=True).make_train_step()
    simplex = Simplex()
    t = np.random.randint(0, 1000, size=(4,))
    noise = generate_simplex_noise(simplex, (4, 16, 16, 1), t)
    images = np.random.default_rng(1).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    _, loss = step(state, jnp.asarray(images), jnp.asarray(t, dtype=jnp.int32),
                   jnp.asarray(noise))
    assert np.isfinite(float(loss))
