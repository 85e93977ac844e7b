"""LPIPS perceptual distance (AlexNet backbone) in JAX/Flax, with the reference's
2D / 2.5D ("fake 3D") wrapper semantics.

Capability parity:
  - lpips.LPIPS(net="alex", version="0.1", lpips=True, spatial=False) as constructed by
    the reference's first-party wrapper (reference src/losses/perceptual_loss.py:68-102)
    and by monai-generative's PerceptualLoss used in VQVAE training
    (reference vqvae_trainer.py:87-90).
  - the 2.5D slicing wrapper: each spatial axis is permuted into the batch dim and
    scored as 2D slices (reference perceptual_loss.py:131-186). The reference's view
    loop OVERWRITES the loss each iteration so only the LAST view (axis 4) contributes
    (perceptual_loss.py:110-122) — replicated by default (`average_views=False`),
    fixable via `average_views=True`.
  - the 28->32 zero-pad rule for MNIST-sized inputs lives with the caller
    (reference src/trainers/reconstruct.py:170-178); helper `pad_28_to_32` here.

Weights: the published LPIPS v0.1 calibration + torchvision AlexNet features are
licensed artifacts fetched at runtime by the reference's deps. This environment has no
network egress, so `load_lpips_params` loads them from a local `.npz` (converted once
with `convert_torch_state_dict`, offline) and falls back to a DETERMINISTIC seeded
init when absent. Random-feature LPIPS is still a valid perceptual metric family
(pnet_rand=True in the lpips package), and the reference pipeline's headline OOD
score uses the MSE Z-score (plot_target="mse", reference ood_detection.py:73), so
AUROC parity does not depend on the calibrated weights.

TPU-first: all convs channel-last NHWC on the MXU; the whole metric jits and fuses
into the reconstruction-sweep program (recon/sweep.py) instead of running as a
separate host-driven pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# AlexNet feature taps: channels after each of the five ReLU stages.
ALEX_CHANNELS = (64, 192, 384, 256, 256)

# lpips ScalingLayer constants (applied to inputs in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class AlexNetFeatures(nn.Module):
    """torchvision-AlexNet `features` trunk, returning the five ReLU taps.

    Channel-last. MaxPool uses the torch kernel-3/stride-2 (floor) geometry.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []

        def conv(x, ch, k, s, p, name):
            return nn.Conv(
                ch,
                (k, k),
                strides=(s, s),
                padding=[(p, p), (p, p)],
                dtype=self.dtype,
                name=name,
            )(x)

        def pool(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2))

        x = nn.relu(conv(x, 64, 11, 4, 2, "conv0"))
        taps.append(x)
        x = pool(x)
        x = nn.relu(conv(x, 192, 5, 1, 2, "conv3"))
        taps.append(x)
        x = pool(x)
        x = nn.relu(conv(x, 384, 3, 1, 1, "conv6"))
        taps.append(x)
        x = nn.relu(conv(x, 256, 3, 1, 1, "conv8"))
        taps.append(x)
        x = nn.relu(conv(x, 256, 3, 1, 1, "conv10"))
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='alex') forward: unit-normalize taps, squared diff, learned
    1x1 'lin' calibration, spatial mean, sum over taps. Returns (B,) distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, y: jnp.ndarray, normalize: bool = True
    ) -> jnp.ndarray:
        # x, y: (B, H, W, C) channel-last, C in {1, 3}. Grayscale is tiled to RGB
        # (the lpips package receives 1-channel MNIST tensors via broadcasting against
        # its 3-channel scaling constants; explicit tiling is the equivalent here).
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
            y = jnp.tile(y, (1, 1, 1, 3))
        if normalize:  # [0,1] -> [-1,1] (lpips_normalize=True in the reference)
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(_SHIFT, dtype=x.dtype)
        scale = jnp.asarray(_SCALE, dtype=x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale

        net = AlexNetFeatures(dtype=self.dtype, name="net")
        fx = net(x)
        fy = net(y)

        total = jnp.zeros((x.shape[0],), dtype=jnp.float32)
        for i, (ax, ay) in enumerate(zip(fx, fy)):
            # published lpips v0.1 normalize_tensor: x / (||x||_2 + 1e-10) with
            # the epsilon OUTSIDE the sqrt (parity matters for golden tests)
            ax = ax / (
                jnp.sqrt(jnp.sum(jnp.square(ax), axis=-1, keepdims=True)) + 1e-10
            )
            ay = ay / (
                jnp.sqrt(jnp.sum(jnp.square(ay), axis=-1, keepdims=True)) + 1e-10
            )
            diff = jnp.square(ax - ay)
            w = self.param(
                f"lin{i}",
                nn.initializers.variance_scaling(0.2, "fan_in", "truncated_normal"),
                (ALEX_CHANNELS[i], 1),
                jnp.float32,
            )
            # 1x1 conv == matmul over the channel dim; clamp like lpips' relu-weights.
            lin = jnp.einsum(
                "bhwc,co->bhwo", diff, jnp.maximum(w, 0.0),
                preferred_element_type=jnp.float32,
            )
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def pad_28_to_32(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad 28x28 channel-last images to 32x32 (reference
    src/trainers/reconstruct.py:170-178 pads with torch pad (2,2,2,2))."""
    return jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))


def pad_to_min_32(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad (B, H, W, C) up to at least 32x32 — AlexNet's conv/pool chain
    collapses to zero-size (NaN LPIPS) below that. Generalizes the reference's
    28->32 rule (which this reproduces exactly for 28x28) to any small input;
    larger inputs pass through unchanged."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = max(0, 32 - h), max(0, 32 - w)
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
    )


def init_lpips_params(rng: jax.Array, image_hw: int = 64) -> dict:
    """Deterministic fallback init (no pretrained weights available offline)."""
    model = LPIPS()
    dummy = jnp.zeros((1, image_hw, image_hw, 3), dtype=jnp.float32)
    return model.init(rng, dummy, dummy)


def convert_torch_state_dict(alex_sd: dict, lpips_sd: dict) -> dict:
    """Convert torchvision AlexNet `features` + lpips v0.1 `lin` state dicts
    (as numpy arrays) into this module's param pytree. Run offline where the
    published weights are available; persist with `save_lpips_npz`."""
    def cw(w):  # torch OIHW -> flax HWIO
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    conv_map = {"conv0": 0, "conv3": 3, "conv6": 6, "conv8": 8, "conv10": 10}
    net = {}
    for name, idx in conv_map.items():
        net[name] = {
            "kernel": cw(alex_sd[f"features.{idx}.weight"]),
            "bias": np.asarray(alex_sd[f"features.{idx}.bias"]),
        }
    params = {"net": net}
    for i in range(5):
        # lpips lin layers: 1x1 conv weight (1, C, 1, 1) -> (C, 1)
        w = np.asarray(lpips_sd[f"lin{i}.model.1.weight"])
        params[f"lin{i}"] = w.reshape(w.shape[1], 1)
    return {"params": params}


def save_lpips_npz(params: dict, path: str) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
        for kp, v in flat
    }
    np.savez(path, **arrays)


def load_lpips_npz(path: str) -> dict:
    data = np.load(path)
    out: dict = {}
    for key, val in data.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return out


def load_lpips_params(
    weights_path: Optional[str] = None, rng_seed: int = 0
) -> dict:
    """Load converted LPIPS weights, else the documented deterministic fallback."""
    if weights_path:
        return load_lpips_npz(weights_path)
    import os

    default = os.environ.get("LPIPS_WEIGHTS_NPZ")
    if default and os.path.exists(default):
        return load_lpips_npz(default)
    return init_lpips_params(jax.random.PRNGKey(rng_seed))


class PerceptualLoss:
    """The reference wrapper (src/losses/perceptual_loss.py:8-197) re-stated in JAX.

    dimensions=2: direct LPIPS on (B, H, W, C) channel-last batches -> (B,).
    dimensions=3 (fake 3D): each spatial axis batchified into 2D slices; by default
    only the LAST view contributes (the reference's loop-overwrite quirk);
    `average_views=True` averages all three. Returns (B,) PER-IMAGE scores —
    each image's value is the mean over its own slices, exactly the number the
    reference produces by looping LPIPS over batch items one at a time at
    scoring time (src/trainers/reconstruct.py:181-187). Callers that want the
    reference's scalar *training* loss take the batch mean (train/vqvae.py does).
    """

    def __init__(
        self,
        dimensions: int,
        params: Optional[dict] = None,
        is_fake_3d: bool = True,
        drop_ratio: float = 0.0,
        lpips_normalize: bool = True,
        average_views: bool = False,
        weights_path: Optional[str] = None,
        dtype: jnp.dtype = jnp.float32,
    ):
        if dimensions not in (2, 3):
            raise NotImplementedError("Perceptual loss is implemented only in 2D and 3D.")
        if dimensions == 3 and not is_fake_3d:
            raise NotImplementedError("True 3D perceptual loss is not implemented yet.")
        self.dimensions = dimensions
        self.is_fake_3d = is_fake_3d
        self.keep_ratio = 1.0 - drop_ratio
        self.lpips_normalize = lpips_normalize
        self.average_views = average_views
        self.module = LPIPS(dtype=dtype)
        self.params = params if params is not None else load_lpips_params(weights_path)

    def _lpips2d(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # sub-32px slices would collapse AlexNet's pool chain to zero-size (NaN);
        # zero-pad up to 32 (identical to the reference's 28->32 rule where both
        # apply, a no-op for >=32 inputs)
        x = pad_to_min_32(x)
        y = pad_to_min_32(y)
        return self.module.apply(self.params, x, y, normalize=self.lpips_normalize)

    def __call__(self, y: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        """y, y_pred: (B, *spatial, C) channel-last. Returns (B,) per-image."""
        if self.dimensions == 2:
            return self._lpips2d(y, y_pred)

        # 3D fake-3d: channel-last (B, X, Y, Z, C). Views batchify each spatial axis.
        # Reference permutes axis 2/3/4 of NCXYZ; view results overwrite unless
        # average_views. Slices stay grouped by item — (B, axis, h, w, C) — so the
        # per-view score is a per-item mean over that item's own slices, matching
        # the reference's per-item scoring loop (reconstruct.py:181-187).
        views = []
        b, X, Y, Z, C = y.shape
        specs = [
            ((0, 1, 2, 3, 4), (Y, Z)),  # slice along X
            ((0, 2, 1, 3, 4), (X, Z)),  # slice along Y
            ((0, 3, 1, 2, 4), (X, Y)),  # slice along Z
        ]
        for perm, (h, w) in specs:
            ys = jnp.transpose(y, perm)  # (B, axis, h, w, C)
            ps = jnp.transpose(y_pred, perm)
            n_slices = ys.shape[1]
            if self.keep_ratio < 1.0:
                # memory/speed compromise like the reference's drop_ratio slice
                # subsampling (perceptual_loss.py:168-176) — strided (static,
                # jit-safe) instead of randperm, applied per item
                keep = max(1, int(n_slices * self.keep_ratio))
                stride = max(1, n_slices // keep)
                ys = ys[:, ::stride][:, :keep]
                ps = ps[:, ::stride][:, :keep]
                n_slices = ys.shape[1]
            d = self._lpips2d(
                ys.reshape(-1, h, w, C), ps.reshape(-1, h, w, C)
            ).reshape(b, n_slices)
            views.append(jnp.mean(d, axis=1))  # (B,)
        if self.average_views:
            return jnp.mean(jnp.stack(views), axis=0)
        return views[-1]  # reference quirk: only the last view survives
