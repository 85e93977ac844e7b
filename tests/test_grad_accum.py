"""Gradient accumulation (--grad_accum_steps, framework extension).

The reference has no accumulation; this framework adds an exact one for the
memory-bound 3D regimes: the jitted step scans equal microbatches (one
fwd/bwd's activations live at a time) and applies ONE optimizer update whose
gradients equal the full-batch gradients (mean of equal-microbatch means).
For the VQ-VAE the EMA codebook update is also exact: per-microbatch
(counts, sums) are additive, so the decay blend + Laplace smoothing
(models/vqvae.py:218-232) is re-applied once on the combined stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.config import parse_args_train_ddpm, parse_args_train_vqvae
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.models.vqvae import VQVAE
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state
from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, make_vqvae_states

TINY_VQ = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_res_layers=1,
    downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
    upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
    num_channels=(8, 8),
    num_res_channels=(8, 8),
    num_embeddings=16,
    embedding_dim=4,
)


def _ddpm_state():
    unet = make_unet("tiny", 2, 1, 1)
    return make_ddpm_state(
        unet, jax.random.PRNGKey(0), (8, 8, 1), learning_rate=1e-3
    )


def _assert_trees_close(a, b, atol=1e-6, rtol=1e-5):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


def _ddpm_inputs(b=8):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(b, 8, 8, 1)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(b,)).astype(np.int32))
    noise = jnp.asarray(rng.normal(size=(b, 8, 8, 1)).astype(np.float32))
    return images, t, noise


@pytest.mark.parametrize("k", [2, 4])
def test_ddpm_accum_matches_full_batch(k):
    """Accumulated update == full-batch update on the SAME (images, t, noise)."""
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    images, t, noise = _ddpm_inputs(8)

    results = []
    for accum in (1, k):
        step = DDPMTrainStep(
            sched=sched, external_noise=True, grad_accum=accum
        ).make_train_step()
        state, loss = step(_ddpm_state(), images, t, noise)
        results.append((state.params, loss))
    _assert_trees_close(results[0][0], results[1][0])
    np.testing.assert_allclose(
        float(results[0][1]), float(results[1][1]), rtol=1e-6
    )


def test_ddpm_accum_internal_noise_matches():
    """The internal-noise path draws t/noise on the FULL batch before the
    microbatch split, so accumulation changes nothing about the draw."""
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    images, _, _ = _ddpm_inputs(8)
    key = jax.random.PRNGKey(7)

    params = []
    for accum in (1, 2):
        step = DDPMTrainStep(sched=sched, grad_accum=accum).make_train_step()
        state, _ = step(_ddpm_state(), images, key)
        params.append(state.params)
    _assert_trees_close(params[0], params[1])


def test_effective_accum_tail_microbatching():
    """Ragged tails split into the most microbatches that divide them evenly,
    keeping the tail's activation footprint at or below the nominal
    microbatch; prime tails are the unavoidable worst case."""
    from ddpm_ood_tpu.train.ddpm import _effective_accum

    assert _effective_accum(4, 8) == 4   # nominal
    assert _effective_accum(4, 6) == 3   # tail: microbatch 2 == nominal 2
    assert _effective_accum(4, 7) == 1   # prime tail: full batch
    assert _effective_accum(1, 8) == 1
    assert _effective_accum(8, 4) == 4   # accum > batch clamps to batch


def test_ddpm_accum_ragged_tail_matches():
    """A batch not divisible by grad_accum (ragged loader tail) still matches
    grad_accum=1 numerics (it re-splits into 3 microbatches of 2 here)."""
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    images, t, noise = _ddpm_inputs(6)  # 6 % 4 != 0 -> k_eff = 3

    params = []
    for accum in (1, 4):
        step = DDPMTrainStep(
            sched=sched, external_noise=True, grad_accum=accum
        ).make_train_step()
        state, _ = step(_ddpm_state(), images, t, noise)
        params.append(state.params)
    _assert_trees_close(params[0], params[1])


def test_vqvae_generator_accum_exact():
    """Accumulated G step == full-batch G step: params, scalar metrics, recon,
    and the EMA codebook (cluster_size/embed_avg/embedding) all match."""
    vq = VQVAE(**TINY_VQ)
    disc = PatchDiscriminator(
        spatial_dims=2, num_layers_d=3, num_channels=8, in_channels=1
    )
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    )
    adv_w = jnp.float32(0.01)

    out = []
    for accum in (1, 2):
        g_state, d_state = make_vqvae_states(
            vq, disc, jax.random.PRNGKey(0), (16, 16, 1)
        )
        steps = VQVAETrainSteps(
            spatial_dims=2, perceptual_fn=None, grad_accum=accum,
            quant_decay=0.99, quant_epsilon=1e-5,
        )
        g_state, metrics = steps.make_generator_step()(
            g_state, d_state, images, adv_w
        )
        out.append((g_state.params, g_state.ema, metrics))

    _assert_trees_close(out[0][0], out[1][0])
    _assert_trees_close(out[0][1], out[1][1], atol=1e-5, rtol=1e-4)
    for tag in ("l1_loss", "quantization_loss", "jukebox_loss",
                "adversarial_loss", "generator_loss"):
        np.testing.assert_allclose(
            float(out[0][2][tag]), float(out[1][2][tag]), rtol=1e-5,
            err_msg=tag,
        )
    # recon order is preserved (D step and the figure path index by image)
    np.testing.assert_allclose(
        np.asarray(out[0][2]["recon"]), np.asarray(out[1][2]["recon"]),
        atol=1e-5, rtol=1e-4,
    )


def test_vqvae_accum_ema_differs_from_sequential():
    """Sanity: the exact combine is NOT the same as naively chaining k EMA
    updates (which would apply decay twice) — guard against regressing to a
    sequential-EMA implementation."""
    vq = VQVAE(**TINY_VQ)
    disc = PatchDiscriminator(
        spatial_dims=2, num_layers_d=3, num_channels=8, in_channels=1
    )
    images = jnp.asarray(
        np.random.default_rng(2).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    )
    adv_w = jnp.float32(0.0)

    # chain two half-batch steps (decay applied twice)
    g_state, d_state = make_vqvae_states(
        vq, disc, jax.random.PRNGKey(0), (16, 16, 1)
    )
    steps = VQVAETrainSteps(spatial_dims=2, perceptual_fn=None)
    g_step = steps.make_generator_step()
    g_seq, _ = g_step(g_state, d_state, images[:2], adv_w)
    g_seq, _ = g_step(g_seq, d_state, images[2:], adv_w)

    # one accumulated step (decay applied once, on summed stats)
    g_state2, d_state2 = make_vqvae_states(
        vq, disc, jax.random.PRNGKey(0), (16, 16, 1)
    )
    steps2 = VQVAETrainSteps(spatial_dims=2, perceptual_fn=None, grad_accum=2)
    g_acc, _ = steps2.make_generator_step()(g_state2, d_state2, images, adv_w)

    seq_cs = np.asarray(g_seq.ema["quantizer"]["cluster_size"])
    acc_cs = np.asarray(g_acc.ema["quantizer"]["cluster_size"])
    assert not np.allclose(seq_cs, acc_cs)


def test_cli_flags_parse_and_trainer_validates():
    args = parse_args_train_ddpm(
        ["--training_ids", "x", "--validation_ids", "y", "--grad_accum_steps", "4"]
    )
    assert args.grad_accum_steps == 4
    vargs = parse_args_train_vqvae(
        ["--training_ids", "x", "--validation_ids", "y", "--grad_accum_steps", "2"]
    )
    assert vargs.grad_accum_steps == 2


def test_ddpm_accum_ldm_encoder_path():
    """Accumulation composes with the LDM path (encode_fn threaded as a traced
    Partial; x0 becomes the latent after _prepare, split happens after)."""
    sched = make_schedule("linear_beta", 50, 1e-4, 2e-2, "epsilon")
    images, _, _ = _ddpm_inputs(8)
    # stand-in frozen encoder: 1->1 channel avg-pool halving spatial dims
    encode = jax.tree_util.Partial(
        lambda x: jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    )
    key = jax.random.PRNGKey(3)

    def make_state():
        unet = make_unet("tiny", 2, 1, 1)
        return make_ddpm_state(
            unet, jax.random.PRNGKey(0), (4, 4, 1), learning_rate=1e-3
        )

    params = []
    for accum in (1, 2):
        step = DDPMTrainStep(
            sched=sched, has_encoder=True, grad_accum=accum
        ).make_train_step()
        state, loss = step(make_state(), images, key, encode)
        assert np.isfinite(float(loss))
        params.append(state.params)
    _assert_trees_close(params[0], params[1])
