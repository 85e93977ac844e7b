"""Multi-device (8 virtual CPU chips) sharding tests: the TPU-world fake backend.

Validates that the jitted train/sweep programs compile and execute with batches
sharded over a `data` mesh axis and replicated params — the GSPMD replacement for
the reference's DDP/NCCL runtime (SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_train_step_matches_single_device(mesh):
    unet = make_unet("tiny", 2, 1, 1)
    sched = make_schedule("linear_beta", 1000)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    step = DDPMTrainStep(sched=sched).make_train_step()

    images = np.random.default_rng(0).uniform(size=(16, 16, 16, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(42)

    # sharded execution
    state_sh = jax.device_put(state, replicate(mesh))
    batch_sh = shard_batch(mesh, images)
    with mesh:
        new_sh, loss_sh = step(state_sh, batch_sh, rng)

    # single-device execution of the SAME program
    state2 = make_ddpm_state(unet, jax.random.PRNGKey(0), (16, 16, 1))
    new_1, loss_1 = step(state2, jnp.asarray(images), rng)

    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-5)
    leaves_sh = jax.tree_util.tree_leaves(new_sh.params)
    leaves_1 = jax.tree_util.tree_leaves(new_1.params)
    for a, b in zip(leaves_sh, leaves_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_sharding_layout(mesh):
    images = np.zeros((16, 8, 8, 1), dtype=np.float32)
    arr = shard_batch(mesh, images)
    assert arr.sharding == NamedSharding(mesh, P("data"))
    # each device holds 1/8 of the batch
    assert arr.addressable_shards[0].data.shape[0] == 2


def test_graft_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
