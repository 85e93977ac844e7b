import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.models.unet import DiffusionModelUNet, make_unet, param_count, timestep_embedding


def test_timestep_embedding_shape_and_values():
    emb = timestep_embedding(jnp.asarray([0, 1, 999]), 128)
    assert emb.shape == (3, 128)
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(emb[0, :64], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 64:], 1.0, atol=1e-7)


def test_small_unet_2d_shapes_params_and_zero_init():
    """Shape preservation, EXACT param-count parity vs the monai-generative
    formula (the reference prints this at base.py:89), zero-init output conv."""
    model = make_unet("small", spatial_dims=2, in_channels=1, out_channels=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    t = jnp.asarray([0, 500])
    params = model.init(jax.random.PRNGKey(0), x, t)
    n = param_count(params)
    assert n == _monai_unet_param_count(
        2, 1, 1, (128, 256, 256), (False, False, True), 1
    ), n
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _monai_unet_param_count(
    spatial_dims, in_ch, out_ch, channels, attention_levels, num_res_blocks
):
    """Parameter count of monai-generative's DiffusionModelUNet, derived
    independently from its architecture spec (SURVEY.md §2.2): sinusoidal
    t-embedding -> 2-layer MLP(4*ch0); per level `num_res_blocks` resnets
    (GroupNorm+conv3 x2, time Dense, 1x1 skip on channel change) each followed
    by attention (GroupNorm + q/k/v/proj Dense) where enabled; strided-conv
    downsample between levels; mid res-attn-res; up path with skip concat and
    num_res_blocks+1 resnets per level + conv3 after nearest upsample; GroupNorm
    + zero-init conv3 head. All convs/denses carry biases.
    """
    k = 3**spatial_dims
    ch0 = channels[0]
    temb = 4 * ch0

    def conv(ci, co, kk=k):
        return ci * co * kk + co

    def dense(ci, co):
        return ci * co + co

    def resnet(ci, co):
        n = 2 * ci + conv(ci, co) + dense(temb, co) + 2 * co + conv(co, co)
        if ci != co:
            n += conv(ci, co, 1)
        return n

    def attn(c):
        return 2 * c + 4 * dense(c, c)

    total = dense(ch0, temb) + dense(temb, temb)  # time MLP
    total += conv(in_ch, ch0)  # conv_in

    skips = [ch0]
    c = ch0
    for level, co in enumerate(channels):
        for _ in range(num_res_blocks):
            total += resnet(c, co)
            c = co
            if attention_levels[level]:
                total += attn(c)
            skips.append(c)
        if level != len(channels) - 1:
            total += conv(c, c)  # strided downsample
            skips.append(c)

    total += resnet(c, c) + attn(c) + resnet(c, c)  # mid

    for level in reversed(range(len(channels))):
        co = channels[level]
        for _ in range(num_res_blocks + 1):
            total += resnet(c + skips.pop(), co)
            c = co
            if attention_levels[level]:
                total += attn(c)
        if level != 0:
            total += conv(c, c)  # post-upsample conv
    assert not skips

    total += 2 * c + conv(c, out_ch)  # norm_out + conv_out
    return total


def test_unet_param_counts_exact_all_presets():
    """Exact counts for small/big x 2D/3D vs the analytic monai formula, plus
    frozen golden numbers so any silent architecture drift fails loudly.
    Counted via eval_shape — no FLOPs, so even the 442M big-3D fits a CPU test."""
    goldens = {
        ("small", 2, 1): 17_709_953,
        ("small", 3, 1): 46_615_937,
        ("big", 2, 3): 172_573_187,  # the BASELINE.md "172.6M big" model
        ("big", 3, 1): None,  # no independently-recorded golden; formula only
    }
    presets = {
        "small": ((128, 256, 256), (False, False, True), 1),
        "big": ((256, 512, 768), (True, True, True), 2),
    }
    for (name, sd, ch_io), golden in goldens.items():
        chans, attn_lv, nrb = presets[name]
        model = make_unet(name, spatial_dims=sd, in_channels=ch_io, out_channels=ch_io)
        x = jnp.zeros((1,) + (16,) * sd + (ch_io,))
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, jnp.asarray([0]))
        n = param_count(shapes)
        expected = _monai_unet_param_count(sd, ch_io, ch_io, chans, attn_lv, nrb)
        assert n == expected, (name, sd, ch_io, n, expected)
        if golden is not None:
            assert n == golden, (name, sd, ch_io, n)


def test_unet_3d_shapes():
    model = DiffusionModelUNet(
        spatial_dims=3,
        in_channels=2,
        out_channels=2,
        num_channels=(32, 64, 64),
        attention_levels=(False, False, True),
        num_res_blocks=1,
        num_head_channels=32,
    )
    x = jnp.zeros((1, 8, 8, 8, 2))
    t = jnp.asarray([10])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape


def test_unet_bf16_compute_f32_out():
    model = DiffusionModelUNet(
        spatial_dims=2,
        in_channels=1,
        out_channels=1,
        num_channels=(32, 64, 64),
        attention_levels=(False, False, True),
        num_res_blocks=1,
        num_head_channels=32,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    t = jnp.asarray([5, 900])
    params = model.init(jax.random.PRNGKey(0), x, t)
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params))
    out = model.apply(params, x, t)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_unet_jit_and_grad():
    model = DiffusionModelUNet(
        spatial_dims=2,
        in_channels=1,
        out_channels=1,
        num_channels=(16, 32, 32),
        attention_levels=(False, False, True),
        num_res_blocks=1,
        num_head_channels=16,
        norm_num_groups=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    t = jnp.asarray([1, 2])
    params = model.init(jax.random.PRNGKey(0), x, t)

    @jax.jit
    def loss_fn(p):
        return jnp.mean((model.apply(p, x, t) - 1.0) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    # some gradient must be nonzero (zero-init conv_out bias still gets grads)
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in leaves)
