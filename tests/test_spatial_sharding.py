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
