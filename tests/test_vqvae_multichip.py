"""VQ-VAE EMA codebook sync under a data-sharded mesh.

The reference syncs EMA cluster statistics across ranks with an explicit
all-reduce (monai ddp_sync, reference train_vqvae.py:50). Here the EMA update is
computed from the global batch inside the jitted G step, so GSPMD compiles the
cross-chip reduction in. This test proves the claim: a G step on a batch sharded
over 8 devices produces the same codebook and losses as the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
from ddpm_ood_tpu.models.vqvae import VQVAE
from ddpm_ood_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, make_vqvae_states

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TINY = dict(
    spatial_dims=2, in_channels=1, out_channels=1, num_res_layers=1,
    downsample_parameters=((2, 4, 1, 1),), upsample_parameters=((2, 4, 1, 1, 0),),
    num_channels=(8,), num_res_channels=(8,), num_embeddings=8, embedding_dim=4,
)


def _states():
    vq = VQVAE(**TINY)
    disc = PatchDiscriminator(spatial_dims=2, num_layers_d=3, num_channels=8,
                              in_channels=1)
    return make_vqvae_states(vq, disc, jax.random.PRNGKey(0), (16, 16, 1))


def test_ema_sync_matches_unsharded():
    mesh = make_mesh()
    steps = VQVAETrainSteps(spatial_dims=2, perceptual_fn=None)
    g_step = steps.make_generator_step()
    images = np.random.default_rng(0).uniform(size=(16, 16, 16, 1)).astype(np.float32)
    adv_w = jnp.float32(0.01)

    g1, d1 = _states()
    ref_g, ref_metrics = g_step(g1, d1, jnp.asarray(images), adv_w)

    g2, d2 = _states()
    g2 = jax.device_put(g2, replicate(mesh))
    d2 = jax.device_put(d2, replicate(mesh))
    with mesh:
        new_g, metrics = g_step(g2, d2, shard_batch(mesh, images), adv_w)

    np.testing.assert_allclose(
        float(metrics["generator_loss"]), float(ref_metrics["generator_loss"]),
        rtol=1e-5,
    )
    # the EMA codebook (cluster counts reduced across chips) must match exactly
    np.testing.assert_allclose(
        np.asarray(new_g.ema["quantizer"]["cluster_size"]),
        np.asarray(ref_g.ema["quantizer"]["cluster_size"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_g.ema["quantizer"]["embedding"]),
        np.asarray(ref_g.ema["quantizer"]["embedding"]),
        atol=1e-5,
    )
