"""VQ-VAE + PatchGAN jitted train steps: smoke + EMA/batch-stats state flow."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
from ddpm_ood_tpu.models.vqvae import VQVAE
from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, adversarial_weight, make_vqvae_states

TINY = dict(
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


def test_generator_and_discriminator_steps():
    vq = VQVAE(**TINY)
    disc = PatchDiscriminator(spatial_dims=2, num_layers_d=3, num_channels=8,
                              in_channels=1)
    g_state, d_state = make_vqvae_states(
        vq, disc, jax.random.PRNGKey(0), (16, 16, 1)
    )
    steps = VQVAETrainSteps(spatial_dims=2, perceptual_fn=None)
    g_step = steps.make_generator_step()
    d_step = steps.make_discriminator_step()

    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    )
    ema_before = np.asarray(g_state.ema["quantizer"]["embedding"])
    g_state, metrics = g_step(g_state, d_state, images, jnp.float32(0.01))
    assert np.isfinite(float(metrics["generator_loss"]))
    assert float(metrics["l1_loss"]) > 0
    # EMA codebook must move during training
    assert not np.allclose(ema_before, np.asarray(g_state.ema["quantizer"]["embedding"]))

    # copy stats to host BEFORE the step: the jitted step donates d_state buffers
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(d_state.batch_stats)]
    d_state2, d_loss = d_step(d_state, metrics["recon"], images, jnp.float32(0.01))
    assert np.isfinite(float(d_loss))
    # BatchNorm running stats updated
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(d_state2.batch_stats)]
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_discriminator_feature_list():
    disc = PatchDiscriminator(spatial_dims=2, num_layers_d=3, num_channels=8,
                              in_channels=1)
    x = jnp.zeros((2, 32, 32, 1))
    feats, _ = disc.init_with_output(jax.random.PRNGKey(0), x, False)
    assert len(feats) == 4  # 3 layers + logits
    assert feats[-1].shape[-1] == 1  # logits map


def test_adversarial_warmup_schedule():
    assert adversarial_weight(0.01, 0, True) == 0.0
    assert np.isclose(adversarial_weight(0.01, 25, True), 0.005)
    assert adversarial_weight(0.01, 50, True) == 0.01
    assert adversarial_weight(0.01, 500, True) == 0.01
    assert adversarial_weight(0.01, 0, False) == 0.01


def test_vqvae_stage2_roundtrip_shapes():
    vq = VQVAE(**TINY)
    x = jnp.zeros((2, 16, 16, 1))
    variables = vq.init(jax.random.PRNGKey(0), x, False)
    z = vq.apply(variables, x, method=VQVAE.encode_stage_2_inputs)
    assert z.shape == (2, 4, 4, 4)  # two stride-2 stages, embedding_dim 4
    recon = vq.apply(variables, z, method=VQVAE.decode_stage_2_outputs)
    assert recon.shape == x.shape
