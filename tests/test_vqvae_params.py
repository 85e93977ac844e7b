"""Exact VQVAE parameter-count parity vs the monai-generative formula.

The reference prints `sum(p.numel() for p in self.model.parameters())`
(vqvae_trainer.py:71). torch counts the EMA codebook embedding (a
requires_grad=False Parameter) but NOT the cluster_size/embed_avg EMA buffers;
here the embedding lives in the flax "ema" collection alongside those buffers,
so the comparison is params + num_embeddings*embedding_dim.
"""

import jax
import jax.numpy as jnp

from ddpm_ood_tpu.models.vqvae import VQVAE


def _monai_vqvae_param_count(
    spatial_dims,
    in_channels,
    out_channels,
    num_res_layers,
    downsample_parameters,
    upsample_parameters,
    num_channels,
    num_res_channels,
    num_embeddings,
    embedding_dim,
):
    """Derived independently from monai-generative's VQVAE spec (SURVEY.md §2.2):
    encoder = per-level strided conv(kernel=down[i][1]) + num_res_layers residual
    units (conv3 ch->res_ch, conv3 res_ch->ch) + final conv3 -> embedding_dim;
    decoder mirrors it with a leading conv3 and per-level ConvTranspose
    (kernel=up[i][1]); plus the codebook embedding. All convs carry biases.
    """

    def conv(ci, co, kernel):
        return ci * co * kernel**spatial_dims + co

    def res_unit(ch, res_ch):
        return conv(ch, res_ch, 3) + conv(res_ch, ch, 3)

    total = 0
    prev = in_channels
    for i, ch in enumerate(num_channels):
        total += conv(prev, ch, downsample_parameters[i][1])
        total += num_res_layers * res_unit(ch, num_res_channels[i])
        prev = ch
    total += conv(prev, embedding_dim, 3)  # encoder head

    rev_ch = list(reversed(num_channels))
    rev_res = list(reversed(num_res_channels))
    rev_up = list(reversed(upsample_parameters))
    total += conv(embedding_dim, rev_ch[0], 3)  # decoder stem
    for i in range(len(rev_ch)):
        total += num_res_layers * res_unit(rev_ch[i], rev_res[i])
        nxt = out_channels if i == len(rev_ch) - 1 else rev_ch[i + 1]
        total += conv(rev_ch[i], nxt, rev_up[i][1])

    total += num_embeddings * embedding_dim  # codebook (torch: frozen Parameter)
    return total


def _count(variables):
    return sum(p.size for p in jax.tree_util.tree_leaves(variables))


def _check(spatial_dims, cfg):
    model = VQVAE(spatial_dims=spatial_dims, **cfg)
    x = jnp.zeros((1,) + (16,) * spatial_dims + (cfg["in_channels"],))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, False)
    )
    n = _count(shapes["params"]) + cfg["num_embeddings"] * cfg["embedding_dim"]
    expected = _monai_vqvae_param_count(
        spatial_dims,
        cfg["in_channels"],
        cfg["out_channels"],
        cfg["num_res_layers"],
        cfg["downsample_parameters"],
        cfg["upsample_parameters"],
        cfg["num_channels"],
        cfg["num_res_channels"],
        cfg["num_embeddings"],
        cfg["embedding_dim"],
    )
    assert n == expected, (spatial_dims, n, expected)
    return n


def test_vqvae_param_count_reference_default_2d():
    """The reference CLI's default VQVAE config (train_vqvae.py:30-51)."""
    cfg = dict(
        in_channels=1,
        out_channels=1,
        num_res_layers=3,
        downsample_parameters=((2, 4, 1, 1),) * 4,
        upsample_parameters=((2, 4, 1, 1, 0),) * 4,
        num_channels=(128, 128, 128, 256),
        num_res_channels=(128, 128, 128, 256),
        num_embeddings=256,
        embedding_dim=256,
    )
    n = _check(2, cfg)
    assert n == 15_741_953, n  # frozen golden: silent drift fails loudly


def test_vqvae_param_count_miccai_3d():
    """The 3D MICCAI config (reference README.md:141-190: 2048x128 codebook)."""
    cfg = dict(
        in_channels=1,
        out_channels=1,
        num_res_layers=3,
        downsample_parameters=((2, 4, 1, 1),) * 3,
        upsample_parameters=((2, 4, 1, 1, 0),) * 3,
        num_channels=(128, 128, 256),
        num_res_channels=(128, 128, 256),
        num_embeddings=2048,
        embedding_dim=128,
    )
    _check(3, cfg)
