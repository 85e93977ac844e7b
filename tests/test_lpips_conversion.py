"""Prove the torch->flax LPIPS weight-conversion path end to end.

The published lpips v0.1 weights are licensed artifacts unavailable offline, so a
transposition/shape bug in `convert_torch_state_dict` would otherwise only surface
when someone runs the converter with real weights. Here the golden is an
INDEPENDENT torch-functional implementation of lpips.LPIPS(net='alex',
spatial=False, lpips=True) (reference src/losses/perceptual_loss.py:68-102)
evaluated with synthetic torch-layout state dicts: if the conversion mangled any
kernel layout, the outputs would diverge.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ddpm_ood_tpu.losses.lpips import (  # noqa: E402
    ALEX_CHANNELS,
    LPIPS,
    convert_torch_state_dict,
    load_lpips_npz,
    save_lpips_npz,
)

# torchvision AlexNet `features` conv geometry: (layer idx, out, in, kernel)
_ALEX_CONVS = [
    (0, 64, 3, 11),
    (3, 192, 64, 5),
    (6, 384, 192, 3),
    (8, 256, 384, 3),
    (10, 256, 256, 3),
]


def _make_torch_state_dicts(rng):
    alex_sd = {}
    for idx, o, i, k in _ALEX_CONVS:
        alex_sd[f"features.{idx}.weight"] = rng.normal(
            scale=0.05, size=(o, i, k, k)
        ).astype(np.float32)
        alex_sd[f"features.{idx}.bias"] = rng.normal(scale=0.05, size=(o,)).astype(
            np.float32
        )
    # lpips lin layers: non-negative 1x1 conv weights of shape (1, C, 1, 1)
    lpips_sd = {
        f"lin{i}.model.1.weight": rng.uniform(size=(1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(ALEX_CHANNELS)
    }
    return alex_sd, lpips_sd


def _torch_lpips_golden(alex_sd, lpips_sd, x_np, y_np):
    """lpips v0.1 forward, written directly against torch.nn.functional.

    Pipeline per the published algorithm: [0,1]->[-1,1], ScalingLayer, AlexNet
    relu taps (pools after taps 1 and 2), unit-normalize each tap over channels
    (eps OUTSIDE the sqrt), squared diff, 1x1 'lin' conv, spatial mean, sum.
    """

    def features(z):
        taps = []
        strides_pads = {0: (4, 2), 3: (1, 2), 6: (1, 1), 8: (1, 1), 10: (1, 1)}
        for idx, _, _, _ in _ALEX_CONVS:
            s, p = strides_pads[idx]
            w = torch.from_numpy(alex_sd[f"features.{idx}.weight"])
            b = torch.from_numpy(alex_sd[f"features.{idx}.bias"])
            z = F.relu(F.conv2d(z, w, b, stride=s, padding=p))
            taps.append(z)
            if idx in (0, 3):  # MaxPool2d(3, 2) after relu1 and relu2
                z = F.max_pool2d(z, 3, 2)
        return taps

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    x = (2.0 * torch.from_numpy(x_np) - 1.0 - shift) / scale
    y = (2.0 * torch.from_numpy(y_np) - 1.0 - shift) / scale
    total = None
    for i, (ax, ay) in enumerate(zip(features(x), features(y))):
        ax = ax / (torch.sqrt((ax**2).sum(dim=1, keepdim=True)) + 1e-10)
        ay = ay / (torch.sqrt((ay**2).sum(dim=1, keepdim=True)) + 1e-10)
        diff = (ax - ay) ** 2
        w = torch.from_numpy(lpips_sd[f"lin{i}.model.1.weight"])
        lin = F.conv2d(diff, w)
        val = lin.mean(dim=(1, 2, 3))
        total = val if total is None else total + val
    return total.numpy()


def test_convert_matches_independent_torch_golden():
    rng = np.random.default_rng(11)
    alex_sd, lpips_sd = _make_torch_state_dicts(rng)
    params = convert_torch_state_dict(alex_sd, lpips_sd)

    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)  # NCHW for torch
    y = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    golden = _torch_lpips_golden(alex_sd, lpips_sd, x, y)

    ours = LPIPS().apply(
        params,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),  # NHWC for flax
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-4, atol=1e-7)


def test_convert_kernel_transposition_exact():
    """OIHW -> HWIO must be an exact transpose, element by element."""
    rng = np.random.default_rng(3)
    alex_sd, lpips_sd = _make_torch_state_dicts(rng)
    params = convert_torch_state_dict(alex_sd, lpips_sd)["params"]
    w_torch = alex_sd["features.0.weight"]  # (64, 3, 11, 11) OIHW
    w_flax = params["net"]["conv0"]["kernel"]  # (11, 11, 3, 64) HWIO
    assert w_flax.shape == (11, 11, 3, 64)
    np.testing.assert_array_equal(w_flax, np.transpose(w_torch, (2, 3, 1, 0)))
    # lin: (1, C, 1, 1) -> (C, 1)
    np.testing.assert_array_equal(
        params["lin2"], lpips_sd["lin2.model.1.weight"].reshape(-1, 1)
    )


def test_npz_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    alex_sd, lpips_sd = _make_torch_state_dicts(rng)
    params = convert_torch_state_dict(alex_sd, lpips_sd)
    path = str(tmp_path / "lpips.npz")
    save_lpips_npz(params, path)
    loaded = load_lpips_npz(path)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loaded params drive the module identically
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    a = LPIPS().apply(params, x, y)
    b = LPIPS().apply(loaded, x, y)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
