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
    """Shape preservation, param-count family check vs the reference's printed count
    (base.py:89; monai-generative small 2D UNet is ~27M), and zero-init output conv."""
    model = make_unet("small", spatial_dims=2, in_channels=1, out_channels=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    t = jnp.asarray([0, 500])
    params = model.init(jax.random.PRNGKey(0), x, t)
    n = param_count(params)
    assert 15e6 < n < 45e6, n
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


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
