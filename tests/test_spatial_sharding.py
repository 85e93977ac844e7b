"""Spatial (sample-dimension) sharding over the `model` mesh axis.

The reference never shards a sample across devices (SURVEY.md §5 long-context:
3D scale is handled algorithmically via the latent space). The mesh here keeps a
`model` axis available; GSPMD supports spatially-partitioned convolutions (halo
exchange inserted automatically), so a 3D volume too large for one chip can be
split along a spatial dim with NO changes to model code — only input sharding
annotations. This test proves the path: train-step numerics on a (data=4,
model=2) mesh with images sharded (batch, H) match the replicated result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.parallel.mesh import MeshConfig, make_mesh
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_spatially_sharded_train_step_matches():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 1000)
    step = DDPMTrainStep(sched=sched).make_train_step()
    images = np.random.default_rng(0).uniform(size=(8, 16, 16, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(7)

    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    ref_state, ref_loss = step(state, jnp.asarray(images), rng)

    state2 = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    # batch sharded over data AND height sharded over model
    sharded = jax.device_put(
        jnp.asarray(images), NamedSharding(mesh, P("data", "model"))
    )
    with mesh:
        new_state, loss = step(state2, sharded, rng)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatially_sharded_3d_vqvae_generator_step_matches():
    """The production 3D pixel-space regime (128³ VQVAE, BASELINE.md) scales
    past per-chip batch limits by sharding the VOLUME depth over the `model`
    axis — GSPMD inserts halo exchange for the conv3d/ConvTranspose stacks and
    the global-batch EMA codebook update stays exact. Numerics on a
    (data=2, model=4) mesh must match the replicated step."""
    from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
    from ddpm_ood_tpu.models.vqvae import VQVAE
    from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, make_vqvae_states

    mesh = make_mesh(MeshConfig(data=2, model=4))
    vq = VQVAE(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_layers=1,
        downsample_parameters=((2, 4, 1, 1),),
        upsample_parameters=((2, 4, 1, 1, 0),),
        num_channels=(8,), num_res_channels=(8,),
        num_embeddings=16, embedding_dim=4,
    )
    disc = PatchDiscriminator(
        spatial_dims=3, num_layers_d=1, num_channels=8, in_channels=1
    )
    step = VQVAETrainSteps(spatial_dims=3, perceptual_fn=None).make_generator_step()
    images = np.random.default_rng(1).uniform(size=(4, 16, 16, 16, 1)).astype(
        np.float32
    )
    adv_w = jnp.float32(0.01)

    g0, d0 = make_vqvae_states(vq, disc, jax.random.PRNGKey(0), (16, 16, 16, 1))
    ref_g, ref_metrics = step(g0, d0, jnp.asarray(images), adv_w)

    g1, d1 = make_vqvae_states(vq, disc, jax.random.PRNGKey(0), (16, 16, 16, 1))
    g1 = jax.device_put(g1, NamedSharding(mesh, P()))
    d1 = jax.device_put(d1, NamedSharding(mesh, P()))
    # batch over data AND volume depth over model (halo exchange by GSPMD)
    sharded = jax.device_put(
        jnp.asarray(images), NamedSharding(mesh, P("data", "model"))
    )
    with mesh:
        new_g, metrics = step(g1, d1, sharded, adv_w)

    np.testing.assert_allclose(
        float(metrics["generator_loss"]), float(ref_metrics["generator_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_g.params),
        jax.tree_util.tree_leaves(ref_g.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # EMA codebook (global-batch update) identical under spatial sharding
    for a, b in zip(
        jax.tree_util.tree_leaves(new_g.ema),
        jax.tree_util.tree_leaves(ref_g.ema),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
