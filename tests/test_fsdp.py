"""FSDP param sharding: same numerics as replicated DP, params actually sharded."""

import jax
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.parallel.fsdp import apply_fsdp, fsdp_shardings
from ddpm_ood_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_fsdp_step_matches_replicated():
    mesh = make_mesh()
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 1000)
    step = DDPMTrainStep(sched=sched).make_train_step()
    images = np.random.default_rng(0).uniform(size=(16, 16, 16, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    state_rep = jax.device_put(
        make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1)), replicate(mesh)
    )
    state_fsdp = apply_fsdp(mesh, make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1)))

    # at least one large leaf is genuinely sharded
    shardings = fsdp_shardings(mesh, state_fsdp.params)
    assert any(
        not s.is_fully_replicated for s in jax.tree_util.tree_leaves(shardings)
    )

    batch = shard_batch(mesh, images)
    with mesh:
        new_rep, loss_rep = step(state_rep, batch, rng)
        new_fsdp, loss_fsdp = step(state_fsdp, shard_batch(mesh, images), rng)

    np.testing.assert_allclose(float(loss_rep), float(loss_fsdp), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_rep.params),
        jax.tree_util.tree_leaves(new_fsdp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
