"""Reference-checkpoint conversion: layout transforms, round-trip, CLI e2e.

Covers ddpm_ood_tpu/utils/convert_torch.py + scripts/convert_reference_checkpoint.py.
torch (CPU) is available in this environment, so the layout claims (conv
OIHW<->HWIO, linear transpose, GroupNorm channel grouping, and the
Downsample stride-2 window alignment vs torch padding=1) are verified against
torch numerics, not just asserted.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ddpm_ood_tpu.models.unet import Downsample, make_unet  # noqa: E402
from ddpm_ood_tpu.utils.convert_torch import (  # noqa: E402
    flax_to_torch_unet,
    torch_to_flax_unet,
)

REPO = Path(__file__).resolve().parent.parent


def _tiny_params(seed=0, in_ch=1):
    unet = make_unet("tiny", 2, in_ch, in_ch)
    params = unet.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 16, 16, in_ch)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    return unet, jax.tree_util.tree_map(np.asarray, params)


def test_roundtrip_exact():
    _, params = _tiny_params()
    sd = flax_to_torch_unet(params)
    back, report = torch_to_flax_unet(sd, params)
    assert report["missing"] == []
    assert report["unused"] == []
    assert report["matched"] == len(jax.tree_util.tree_leaves(params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_alternative_torch_namings_accepted():
    """Older monai-generative variants (query/key/value, downsampler.op) must
    resolve through the candidate lists."""
    _, params = _tiny_params()
    sd = flax_to_torch_unet(params)
    renames = {
        ".to_q.": ".query.",
        ".to_k.": ".key.",
        ".to_v.": ".value.",
        ".proj_attn.": ".proj_out.",
        ".downsampler.op.conv.": ".downsampler.op.",
    }
    sd2 = {}
    for k, v in sd.items():
        for old, new in renames.items():
            if old in k:
                k = k.replace(old, new)
                break
        sd2[k] = v
    back, report = torch_to_flax_unet(sd2, params)
    assert report["missing"] == []
    assert report["unused"] == []
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_wrong_architecture_fails_loudly():
    _, params = _tiny_params()
    sd = flax_to_torch_unet(params)
    key = "conv_in.conv.weight"
    sd[key] = np.zeros((7, 7, 3, 3), np.float32)  # wrong channel counts
    with pytest.raises(ValueError, match="converted shape"):
        torch_to_flax_unet(sd, params)


def test_downsample_matches_torch_conv_s2_p1():
    """The UNet Downsample must reproduce torch Conv2d(k3, s2, padding=1)
    windows exactly — XLA 'SAME' would shift them by one pixel."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)  # NHWC
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # OIHW
    b = rng.normal(size=(6,)).astype(np.float32)

    t = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
        torch.tensor(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)

    mod = Downsample(out_channels=6)
    variables = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        }
    }
    f = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(t, f, atol=1e-4)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)

    gn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(w))
        gn.bias.copy_(torch.tensor(b))
    t = gn(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)

    import flax.linen as nn

    mod = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    f = np.asarray(
        mod.apply({"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}},
                  jnp.asarray(x))
    )
    np.testing.assert_allclose(t, f, atol=1e-4)


def test_converter_cli_end_to_end(tmp_path):
    """Craft a reference-schema .pth from exported flax params, run the CLI,
    and assert the written Orbax checkpoint restores to the original tree and
    is discovered by the trainers' checkpoint lookup."""
    _, params = _tiny_params(seed=3)
    sd = {k: torch.tensor(v) for k, v in flax_to_torch_unet(params).items()}
    pth = tmp_path / "checkpoint_7.pth"
    torch.save(
        {
            "epoch": 8,
            "global_step": 1234,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
            "best_loss": 0.125,
        },
        pth,
    )

    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "convert_reference_checkpoint.py"),
            "--torch_checkpoint", str(pth),
            "--output_dir", str(tmp_path / "out"),
            "--model_name", "converted",
            "--model_type", "tiny",
            "--spatial_dimension", "2",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    report = json.loads(out.stdout[: out.stdout.rindex("}") + 1])
    assert report["missing"] == []
    # the reference's real checkpoints also carry no extra model keys; the
    # crafted one shouldn't either
    assert report["unused"] == []

    from ddpm_ood_tpu.utils import checkpoint as ckpt

    run_dir = tmp_path / "out" / "converted"
    found = ckpt.find_checkpoint(run_dir)
    assert found is not None
    payload = ckpt.restore_checkpoint(found)
    assert int(payload["epoch"]) == 8
    assert int(payload["global_step"]) == 1234
    assert float(payload["best_loss"]) == 0.125
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        payload["model_state_dict"],
    )


# ---------------------------------------------------------------------------
# VQVAE conversion
# ---------------------------------------------------------------------------

VQ_CFG = dict(
    spatial_dims=2, in_channels=1, out_channels=1, num_res_layers=2,
    downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
    upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
    num_channels=(8, 16), num_res_channels=(8, 16),
    num_embeddings=32, embedding_dim=4,
)


def _tiny_vqvae(seed=0):
    from ddpm_ood_tpu.models.vqvae import VQVAE

    m = VQVAE(**VQ_CFG)
    vs = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 1)))
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
    return m, to_np(vs["params"]), to_np(vs["ema"])


def test_vqvae_roundtrip_exact():
    from ddpm_ood_tpu.utils.convert_torch import (
        flax_to_torch_vqvae,
        torch_to_flax_vqvae,
    )

    _, params, ema = _tiny_vqvae()
    sd = flax_to_torch_vqvae(params, ema)
    p2, e2, report = torch_to_flax_vqvae(sd, params, ema)
    assert report["missing"] == []
    assert report["unused"] == []
    for a, b in ((params, p2), (ema, e2)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            a, b,
        )


def test_convtranspose_matches_torch():
    """ConvTransposeTorchLike + the converter's transpose+flip must reproduce
    torch conv_transpose2d exactly (transpose without the spatial flip is
    numerically wrong — this is the regression test for that)."""
    from ddpm_ood_tpu.models.vqvae import ConvTransposeTorchLike
    from ddpm_ood_tpu.utils.convert_torch import _to_flax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5, 4, 4)).astype(np.float32)  # torch (I, O, k, k)
    b = rng.normal(size=(5,)).astype(np.float32)

    t = torch.nn.functional.conv_transpose2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w), torch.tensor(b),
        stride=2, padding=1, output_padding=0,
    ).numpy().transpose(0, 2, 3, 1)

    mod = ConvTransposeTorchLike(out_channels=5, kernel_size=4, stride=2, padding=1)
    f = np.asarray(mod.apply(
        {"params": {"kernel": jnp.asarray(_to_flax(w, "convtranspose")),
                    "bias": jnp.asarray(b)}},
        jnp.asarray(x)))
    np.testing.assert_allclose(t, f, atol=1e-4)


def test_vqvae_converter_cli_end_to_end(tmp_path):
    from ddpm_ood_tpu.utils.convert_torch import flax_to_torch_vqvae

    _, params, ema = _tiny_vqvae(seed=5)
    sd = {k: torch.tensor(v) for k, v in flax_to_torch_vqvae(params, ema).items()}
    pth = tmp_path / "checkpoint_9.pth"
    torch.save({"epoch": 9, "global_step": 77, "model_state_dict": sd,
                "optimizer_state_dict": {}, "best_loss": 0.5}, pth)
    cfg_path = tmp_path / "vqvae_config.json"
    cfg_path.write_text(json.dumps(
        {k: list(v) if isinstance(v, tuple) else v for k, v in VQ_CFG.items()}
    ))

    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "convert_reference_checkpoint.py"),
            "--torch_checkpoint", str(pth),
            "--component", "vqvae",
            "--vqvae_config", str(cfg_path),
            "--output_dir", str(tmp_path / "out"),
            "--model_name", "vq_converted",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr

    from ddpm_ood_tpu.utils import checkpoint as ckpt

    run_dir = tmp_path / "out" / "vq_converted"
    payload = ckpt.restore_checkpoint(run_dir / "checkpoint")
    assert (run_dir / "vqvae_config.json").exists()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, payload["model_state_dict"]["params"],
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ema, payload["model_state_dict"]["ema"],
    )


def test_export_cli_round_trip(tmp_path):
    """Import a reference-schema .pth, export it back with --export, and
    assert the torch state dicts match exactly — the bidirectional contract."""
    _, params = _tiny_params(seed=11)
    sd = {k: torch.tensor(v) for k, v in flax_to_torch_unet(params).items()}
    src = tmp_path / "ref.pth"
    torch.save({"epoch": 3, "global_step": 42, "model_state_dict": sd,
                "optimizer_state_dict": {}, "best_loss": 0.25}, src)

    def run(*extra):
        out = subprocess.run(
            [sys.executable,
             str(REPO / "scripts" / "convert_reference_checkpoint.py"), *extra],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr
        return out

    run("--torch_checkpoint", str(src),
        "--output_dir", str(tmp_path / "out"), "--model_name", "m",
        "--model_type", "tiny", "--spatial_dimension", "2")
    dst = tmp_path / "roundtrip.pth"
    run("--torch_checkpoint", str(dst), "--model_type", "tiny",
        "--export", str(tmp_path / "out" / "m" / "checkpoint"))

    a = torch.load(src, map_location="cpu", weights_only=True)
    b = torch.load(dst, map_location="cpu", weights_only=True)
    assert b["epoch"] == 3 and b["global_step"] == 42 and b["best_loss"] == 0.25
    assert set(a["model_state_dict"]) == set(b["model_state_dict"])
    for k in a["model_state_dict"]:
        np.testing.assert_array_equal(
            a["model_state_dict"][k].numpy(), b["model_state_dict"][k].numpy()
        )
