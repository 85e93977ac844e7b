"""Patch-adversarial (LSGAN) losses.

Parity with monai-generative's PatchAdversarialLoss(criterion="least_squares") as
driven by the reference VQ-VAE trainer (vqvae_trainer.py:99, generator use at
:243-249, discriminator use at :254-266): least-squares against real/fake targets,
mean-reduced; the discriminator loss halves the sum of the real and fake terms.

Pure jnp functions — they fuse into the jitted G/D train steps (train/vqvae.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def _ls(logits: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(jnp.square(logits.astype(jnp.float32) - target))


def adversarial_loss(
    logits: jnp.ndarray, target_is_real: bool, for_discriminator: bool
) -> jnp.ndarray:
    """One-sided term, matching PatchAdversarialLoss.forward semantics.

    Generator call sites pass (logits_fake, target_is_real=True,
    for_discriminator=False). Discriminator terms are combined by
    `discriminator_loss`.
    """
    del for_discriminator  # criterion identical for both sides under LSGAN
    return _ls(logits, target_is_real)


def generator_adversarial_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """G wants D(fake) -> real (reference vqvae_trainer.py:243-245)."""
    return _ls(logits_fake, True)


def discriminator_loss(
    logits_fake: jnp.ndarray, logits_real: jnp.ndarray
) -> jnp.ndarray:
    """0.5 * (LS(fake->0) + LS(real->1)) (reference vqvae_trainer.py:256-261)."""
    return 0.5 * (_ls(logits_fake, False) + _ls(logits_real, True))
