"""Structured (simplex-family) noise for diffusion training/reconstruction.

Capability parity with the reference's AnoDDPM-style simplex noise option
(`--simplex_noise`, reference train_ddpm.py:77-82; generation at
ddpm_trainer.py:93-98 and src/trainers/reconstruct.py:134-141 via
src/utils/simplex_noise.py):

  - `Simplex` mirrors Simplex_CLASS (simplex_noise.py:82-159): per-call reseeding
    with numpy's global RNG, `rand_3d_fixed_T_octaves` / `rand_2d_octaves` /
    `rand_3d_octaves` fractal compositions (octaves, persistence, frequency) — the
    point evaluation runs in the native C++/OpenMP OpenSimplex kernel
    (csrc/opensimplex.cpp, the rebuild of the reference's numba-JIT kernels,
    including the int64-LCG permutation init at simplex_noise.py:559-577).
  - `generate_simplex_noise` reproduces the driver loop (simplex_noise.py:15-79):
    one freshly-seeded z=t[j] OpenSimplex plane per (batch item j, channel i) —
    channel-LAST here: x shape (B, *spatial, C).

TPU-native fast path: `simplex_noise_device` generates multi-octave gradient
("Perlin-simplex family") noise fully ON DEVICE with a counter-based hash — no
host->device copy, jit/vmap-safe, usable inside the reconstruction sweep. It is
statistically matched (band-limited multi-octave spectrum, ~zero mean) but NOT
bit-identical to OpenSimplex; the host path is the bit-reproducibility anchor.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import _native


class Simplex:
    """Host-side OpenSimplex fractal noise source (native C++ kernel)."""

    def __init__(self, seed: Optional[int] = None):
        self.newSeed(seed)

    def newSeed(self, seed: Optional[int] = None) -> None:
        if seed is None:
            # reference: np.random.randint(-1e10, 1e10) via the global numpy RNG
            seed = int(np.random.randint(-10000000000, 10000000000))
        self.seed = int(seed)

    def rand_3d_fixed_T_octaves(
        self, shape: Sequence[int], T, octaves: int = 1,
        persistence: float = 0.5, frequency: float = 32,
    ) -> np.ndarray:
        """(1, H, W) fractal noise on the z=T plane (simplex_noise.py:141-159)."""
        assert len(shape) == 2
        t = float(np.asarray(T).reshape(-1)[0])
        out = _native.noise3_fixed_t_grid(
            self.seed, t, (int(shape[0]), int(shape[1])), octaves, persistence, frequency
        )
        return out[None]

    def rand_2d_octaves(
        self, shape: Sequence[int], octaves: int = 1,
        persistence: float = 0.5, frequency: float = 32,
    ) -> np.ndarray:
        assert len(shape) == 2
        return _native.noise2_grid(
            self.seed, (int(shape[0]), int(shape[1])), octaves, persistence, frequency
        )

    def rand_3d_octaves(
        self, shape: Sequence[int], octaves: int = 1,
        persistence: float = 0.5, frequency: float = 32,
    ) -> np.ndarray:
        assert len(shape) == 3
        return _native.noise3_grid(
            self.seed, tuple(int(s) for s in shape), octaves, persistence, frequency
        )


# random_param octave/persistence/frequency table (reference
# simplex_noise.py:29-55); drawn with python's `random` like the reference
_RANDOM_PARAMS = [
    (2, 0.6, 16), (6, 0.6, 32), (7, 0.7, 32), (10, 0.8, 64), (5, 0.8, 16),
    (4, 0.6, 16), (1, 0.6, 64), (7, 0.8, 128), (6, 0.9, 64), (2, 0.85, 128),
    (2, 0.85, 64), (2, 0.85, 32), (2, 0.85, 16), (2, 0.85, 8), (2, 0.85, 4),
    (2, 0.85, 2), (1, 0.85, 128), (1, 0.85, 64), (1, 0.85, 32), (1, 0.85, 16),
    (1, 0.85, 8), (1, 0.85, 4), (1, 0.85, 2),
]


def generate_simplex_noise(
    simplex: Simplex,
    x_shape: Sequence[int],
    t: np.ndarray,
    random_param: bool = False,
    octave: int = 6,
    persistence: float = 0.8,
    frequency: float = 64,
) -> np.ndarray:
    """Per-(sample, channel) reseeded fixed-T noise planes.

    x_shape: (B, *spatial, C) channel-last (2D spatial only, like the reference
    driver which slices x.shape[-2:]); t: (B,) timesteps. Returns f32 noise of
    x_shape. Mirrors reference generate_simplex_noise (simplex_noise.py:15-79)
    with the channel axis moved last.
    """
    b = int(x_shape[0])
    c = int(x_shape[-1])
    spatial = tuple(int(s) for s in x_shape[1:-1])
    if len(spatial) != 2:
        # 3D volumes: use the last two spatial dims per-slice like the reference
        # would (x.shape[-2:]) and broadcast over leading spatial dims.
        plane = spatial[-2:]
    else:
        plane = spatial
    t = np.asarray(t).reshape(-1)
    noise = np.empty((b,) + spatial + (c,), dtype=np.float32)

    # Fixed-parameter fast path: per-plane seeds MUST be drawn serially in the
    # reference's (channel, batch) order (each comes from the global numpy RNG
    # stream), but plane GENERATION is independent — one OpenMP call renders
    # all b*c planes in parallel, bit-identical to the sequential loop.
    if not random_param and b * c > 1 and _native.available():
        seeds = np.empty(c * b, dtype=np.int64)
        ts = np.empty(c * b, dtype=np.float64)
        for i in range(c):
            for j in range(b):
                simplex.newSeed()
                seeds[i * b + j] = simplex.seed
                ts[i * b + j] = float(t[j])
        planes = _native.noise3_fixed_t_grid_batch(
            seeds, ts, (int(plane[0]), int(plane[1])), octave, persistence, frequency
        ).astype(np.float32)
        for i in range(c):
            for j in range(b):
                pn = planes[i * b + j]
                noise[j, ..., i] = (
                    np.broadcast_to(pn, spatial) if len(spatial) != 2 else pn
                )
        return noise

    for i in range(c):
        for j in range(b):
            simplex.newSeed()
            if random_param:
                import random

                octave, persistence, frequency = random.choice(_RANDOM_PARAMS)
            plane_noise = simplex.rand_3d_fixed_T_octaves(
                plane, t[j], octave, persistence, frequency
            )[0].astype(np.float32)
            noise[j, ..., i] = np.broadcast_to(
                plane_noise, spatial
            ) if len(spatial) != 2 else plane_noise
    return noise


# ----------------------------------------------------------------------------------
# On-device path: counter-based multi-octave gradient noise (jit/vmap-safe).
# ----------------------------------------------------------------------------------

def _hash3(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray, seed: jnp.ndarray):
    """Integer mix of lattice coords -> uint32 (murmur3-finalizer style)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
        ^ iy.astype(jnp.uint32) * jnp.uint32(0xD8163841)
        ^ iz.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
        ^ seed.astype(jnp.uint32)
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


# 12 Perlin gradient directions (edges of a cube).
_GRADS = np.array(
    [[1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
     [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
     [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1]],
    dtype=np.float32,
)


def _gradient_noise3(p: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Classic gradient lattice noise at points p (..., 3) -> (...)."""
    grads = jnp.asarray(_GRADS)
    pi = jnp.floor(p)
    pf = p - pi
    pi = pi.astype(jnp.int32)

    def corner(dx, dy, dz):
        off = jnp.array([dx, dy, dz], dtype=jnp.int32)
        h = _hash3(pi[..., 0] + dx, pi[..., 1] + dy, pi[..., 2] + dz, seed) % 12
        g = grads[h]  # (..., 3)
        d = pf - off.astype(jnp.float32)
        return jnp.sum(g * d, axis=-1)

    u = pf * pf * pf * (pf * (pf * 6.0 - 15.0) + 10.0)  # quintic fade

    def lerp(a, b, w):
        return a + w * (b - a)

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = lerp(c000, c100, u[..., 0])
    x10 = lerp(c010, c110, u[..., 0])
    x01 = lerp(c001, c101, u[..., 0])
    x11 = lerp(c011, c111, u[..., 0])
    y0 = lerp(x00, x10, u[..., 1])
    y1 = lerp(x01, x11, u[..., 1])
    return lerp(y0, y1, u[..., 2])


def simplex_noise_device(
    rng: jax.Array,
    shape: Sequence[int],
    t: jnp.ndarray,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jnp.ndarray:
    """Multi-octave structured noise, generated on device.

    shape: (B, *spatial, C) (or any leading dims, spatial inferred as dims 1..-2);
    t: (B,) int timesteps selecting the z-plane (fixed-T parity with the host
    path's rand_3d_fixed_T_octaves). Per-(sample, channel) decorrelation comes
    from folding the batch/channel indices into the hash seed. Output is
    normalised to ~unit variance so it can stand in for N(0,1) like the
    reference's usage.
    """
    shape = tuple(int(s) for s in shape)
    b, c = shape[0], shape[-1]
    spatial = shape[1:-1]
    plane = spatial[-2:] if len(spatial) >= 2 else spatial
    seed0 = jax.random.randint(rng, (), 0, 2**31 - 1, dtype=jnp.int32)

    ys = jnp.arange(plane[0], dtype=jnp.float32)
    xs = jnp.arange(plane[1], dtype=jnp.float32) if len(plane) == 2 else ys

    def one_plane(sample_idx, chan_idx, tj):
        # accumulate octaves with halving frequency
        total = jnp.zeros(plane, dtype=jnp.float32)
        freq = frequency
        amp = 1.0
        seed = (
            seed0.astype(jnp.uint32)
            + sample_idx.astype(jnp.uint32) * jnp.uint32(7919)
            + chan_idx.astype(jnp.uint32) * jnp.uint32(104729)
        )
        for o in range(octaves):
            gy, gx = jnp.meshgrid(ys / freq, xs / freq, indexing="ij")
            gz = jnp.full_like(gy, tj.astype(jnp.float32) / freq)
            p = jnp.stack([gx, gy, gz], axis=-1)
            total = total + amp * _gradient_noise3(p, seed + jnp.uint32(o))
            freq = freq / 2.0
            amp = amp * persistence
        return total

    bi = jnp.arange(b, dtype=jnp.int32)
    ci = jnp.arange(c, dtype=jnp.int32)
    planes = jax.vmap(
        lambda j, tj: jax.vmap(lambda i: one_plane(j, i, tj))(ci)
    )(bi, t.astype(jnp.int32))  # (B, C, *plane)
    planes = jnp.moveaxis(planes, 1, -1)  # (B, *plane, C)
    if len(spatial) > 2:  # broadcast over leading spatial dims (3D volumes)
        planes = jnp.broadcast_to(
            planes.reshape((b,) + (1,) * (len(spatial) - 2) + plane + (c,)),
            (b,) + spatial + (c,),
        )
    # standardise per sample (fractal amplitude depends on persistence/octaves and
    # low-frequency octaves leave a nonzero plane mean) so it can stand in for
    # N(0,1) in add_noise
    axes = tuple(range(1, planes.ndim))
    mean = jnp.mean(planes, axis=axes, keepdims=True)
    std = jnp.std(planes, axis=axes, keepdims=True)
    return (planes - mean) / (std + 1e-8)
