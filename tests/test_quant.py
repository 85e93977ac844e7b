"""int8 post-training quantization of the scoring UNet (ops/quant.py,
models/unet.py:QuantConv, reconstruct/serve --quantize=int8).

The contract under test: the quantized model shares the standard model's param
tree bit-for-bit (any checkpoint scores quantized with zero calibration), the
int8 conv/dense primitives track their f32 counterparts within quantization
error, and the full sweep under int8 stays close enough that the z-scored OOD
statistic is preserved."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.ops.quant import qconv, qdot, quantize_int8
from ddpm_ood_tpu.recon.sweep import ReconProgram


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32)) * 3.0
    q, scale = quantize_int8(x)
    assert q.dtype == jnp.int8
    x_hat = np.asarray(q, np.float32) * float(scale)
    # absmax symmetric: error bounded by half a quantization step
    assert np.abs(x_hat - np.asarray(x)).max() <= float(scale) * 0.5 + 1e-7


def test_quantize_int8_per_channel_and_zero_guard():
    w = jnp.stack(
        [jnp.zeros((3, 3)), jnp.full((3, 3), 10.0), jnp.full((3, 3), 0.01)],
        axis=-1,
    )
    q, scale = quantize_int8(w, axes=(0, 1))
    assert scale.shape == (3,)
    assert float(scale[0]) == 1.0  # zero channel -> guard scale, q stays 0
    assert np.asarray(q[..., 0]).max() == 0
    np.testing.assert_allclose(
        np.asarray(q[..., 1], np.float32) * float(scale[1]), 10.0, rtol=1e-6
    )


@pytest.mark.parametrize("spatial", [2, 3])
def test_qconv_tracks_f32_conv(spatial):
    rng = np.random.default_rng(1)
    shape = (2,) + (6,) * spatial + (4,)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    kernel = jnp.asarray(
        rng.normal(size=(3,) * spatial + (4, 8)).astype(np.float32) * 0.2
    )
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    out_q = qconv(x, kernel, bias, None, "SAME")
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC") if spatial == 2 else ("NDHWC", "DHWIO", "NDHWC")
    out_f = (
        lax.conv_general_dilated(
            x, kernel, (1,) * spatial, "SAME",
            dimension_numbers=lax.conv_dimension_numbers(x.shape, kernel.shape, dn),
        )
        + bias
    )
    assert out_q.shape == out_f.shape
    denom = np.abs(np.asarray(out_f)).max()
    assert np.abs(np.asarray(out_q) - np.asarray(out_f)).max() < 0.02 * denom


def test_qdot_tracks_f32_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    out_q = np.asarray(qdot(x, w, b))
    out_f = np.asarray(x @ w + b)
    assert np.abs(out_q - out_f).max() < 0.02 * np.abs(out_f).max()


def _random_params(unet, x, t, seed=3, scale=0.05):
    """init then re-randomize (conv_out is zero-init, which would make the
    output trivially zero)."""
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [scale * jax.random.normal(k, l.shape) for k, l in zip(keys, leaves)],
    )


def test_quant_unet_param_tree_identical_and_output_close():
    u0 = make_unet("tiny", 2, 1, 1)
    uq = make_unet("tiny", 2, 1, 1, quant="int8")
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 16, 16, 1)).astype(np.float32)
    )
    t = jnp.asarray([10, 500])
    p0 = u0.init(jax.random.PRNGKey(0), x, t)["params"]
    pq = uq.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(pq)
    assert jax.tree_util.tree_map(lambda a: a.shape, p0) == jax.tree_util.tree_map(
        lambda a: a.shape, pq
    )
    params = _random_params(u0, x, t)
    y0 = u0.apply({"params": params}, x, t)
    yq = uq.apply({"params": params}, x, t)
    cos = float(
        (y0 * yq).sum() / (jnp.linalg.norm(y0) * jnp.linalg.norm(yq) + 1e-12)
    )
    assert cos > 0.995, cos


def test_quantized_sweep_scores_track_f32():
    """The product path: same ReconProgram, quantized vs f32 model_fn — the
    per-(lane, image) MSE columns must stay strongly rank-correlated (the OOD
    score is a z-scored relative statistic)."""
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    u0 = make_unet("tiny", 2, 1, 1)
    uq = make_unet("tiny", 2, 1, 1, quant="int8")
    x = jnp.asarray(
        np.random.default_rng(5).uniform(size=(4, 16, 16, 1)).astype(np.float32)
    )
    params = _random_params(u0, x[:1], jnp.asarray([0]))

    def make_prog(unet):
        fn = jax.tree_util.Partial(
            lambda p, xx, tt: unet.apply({"params": p}, xx, tt), params
        )
        return ReconProgram(
            sched=sched, model_fn=fn, num_inference_steps=10,
            inference_skip_factor=3, num_groups=2,
        )

    _, mse0, _ = make_prog(u0)(x, jax.random.PRNGKey(0))
    _, mseq, _ = make_prog(uq)(x, jax.random.PRNGKey(0))
    mse0, mseq = np.asarray(mse0).ravel(), np.asarray(mseq).ravel()
    assert np.isfinite(mseq).all()
    rel = np.abs(mseq - mse0) / (np.abs(mse0) + 1e-9)
    assert np.median(rel) < 0.05, rel
    corr = np.corrcoef(mse0, mseq)[0, 1]
    assert corr > 0.999, corr


def test_reconstruct_cli_accepts_quantize():
    """--quantize=int8 parses and reaches BaseTrainer's make_unet."""
    from ddpm_ood_tpu.config import parse_args_reconstruct

    args = parse_args_reconstruct(
        ["--output_dir=/tmp/x", "--model_name=m", "--quantize=int8"]
    )
    assert args.quantize == "int8"
    args = parse_args_reconstruct(["--output_dir=/tmp/x", "--model_name=m"])
    assert args.quantize == "none"


@pytest.mark.parametrize("spatial", [2, 3])
def test_wconv_tracks_f32_conv(spatial):
    """Weight-only int8 (ops/quant.py:wconv): bf16/f32 activations, per-
    output-channel s8 weights — must track the f32 conv within quantization
    error (weights quantized, activations exact)."""
    from ddpm_ood_tpu.ops.quant import wconv

    rng = np.random.default_rng(11)
    shape = (2,) + (6,) * spatial + (4,)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    kernel = jnp.asarray(
        rng.normal(size=(3,) * spatial + (4, 8)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    from ddpm_ood_tpu.ops.quant import _channel_last_dn
    from jax import lax

    ref = lax.conv_general_dilated(
        x, kernel, (1,) * spatial, "SAME",
        dimension_numbers=_channel_last_dn(x.ndim),
    ) + bias
    got = wconv(x, kernel, bias, dtype=jnp.float32)
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-6
    )
    # only the weights are quantized: tighter than the qconv tolerance
    assert np.median(rel) < 0.01, np.median(rel)


def test_mixed_quant_picks_per_conv_shape():
    """--quantize=mixed: s8 x s8 only where min(cin, cout) >= the measured
    threshold; narrow convs stay on the standard path."""
    import flax.linen as nn

    from ddpm_ood_tpu.models.unet import (
        MIXED_QUANT_MIN_CH,
        QuantConv,
        QuantDense,
        WeightOnlyQuantConv,
        _pick_conv,
        _pick_dense,
    )

    wide = MIXED_QUANT_MIN_CH
    assert _pick_conv("mixed", wide, wide) is QuantConv
    assert _pick_conv("mixed", wide - 1, wide) is nn.Conv
    assert _pick_conv("mixed", 128, 256) is nn.Conv
    assert _pick_conv("int8", 4, 4) is QuantConv
    assert _pick_conv("w8", 4, 4) is WeightOnlyQuantConv
    assert _pick_conv(None, wide, wide) is nn.Conv
    assert _pick_dense("mixed", wide) is QuantDense
    assert _pick_dense("mixed", 256) is nn.Dense
    assert _pick_dense("w8", wide) is nn.Dense


@pytest.mark.parametrize("mode", ["w8", "mixed"])
def test_quant_modes_share_param_tree_and_track_f32(mode):
    """w8/mixed load any standard checkpoint unchanged and track f32 output."""
    u0 = make_unet("tiny", 2, 1, 1)
    uq = make_unet("tiny", 2, 1, 1, quant=mode)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 16, 16, 1)).astype(np.float32)
    )
    t = jnp.asarray([10, 500])
    p0 = u0.init(jax.random.PRNGKey(0), x, t)["params"]
    pq = uq.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(pq)
    params = _random_params(u0, x, t)
    y0 = u0.apply({"params": params}, x, t)
    yq = uq.apply({"params": params}, x, t)
    cos = float(
        (y0 * yq).sum() / (jnp.linalg.norm(y0) * jnp.linalg.norm(yq) + 1e-12)
    )
    # tiny preset is all-narrow: "mixed" quantizes nothing -> bit-identical
    if mode == "mixed":
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(yq))
    else:
        assert cos > 0.999, cos
