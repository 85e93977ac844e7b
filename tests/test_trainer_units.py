"""BaseTrainer unit helpers: shape derivation, layout transpose, tuple parsing."""

import numpy as np

from ddpm_ood_tpu.trainers.base import _as_tuple, channels_last


def test_as_tuple_parsing():
    assert _as_tuple(None) is None
    assert _as_tuple("") is None
    assert _as_tuple("(2, 2, 0, 0)") == (2, 2, 0, 0)
    assert _as_tuple([1, 2]) == (1, 2)
    assert _as_tuple((3,)) == (3,)


def test_channels_last_roundtrip():
    x = np.random.default_rng(0).uniform(size=(2, 3, 8, 9)).astype(np.float32)
    y = channels_last(x)
    assert y.shape == (2, 8, 9, 3)
    np.testing.assert_array_equal(y[..., 1], x[:, 1])


def test_latent_sample_shape_with_pad():
    # exercise the pad arithmetic without instantiating a full trainer
    from types import SimpleNamespace

    from ddpm_ood_tpu.trainers.base import BaseTrainer

    self = SimpleNamespace(
        image_size=32, image_roi=None, spatial_dimension=2,
        vqvae_vars={"x": 1},  # truthy -> latent path
        vqvae_config={"downsample_parameters": [(2, 4, 1, 1), (2, 4, 1, 1)]},
        do_latent_pad=True, latent_pad=(1, 1, 2, 2), ddpm_channels=4,
    )
    shape = BaseTrainer._latent_sample_shape(self)
    # 32 / (2*2) = 8 per axis; torch pad order: last dim gets (1,1), first (2,2)
    assert shape == (8 + 4, 8 + 2, 4)
