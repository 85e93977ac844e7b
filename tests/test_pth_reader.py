"""Torch-free .pth reader parity: load_pth must byte-match torch.load on
crafted checkpoints in BOTH on-disk formats (zip, torch >= 1.6; legacy stream,
the lpips-0.1.4-era format), so weight conversion and reference-checkpoint
migration run on hosts without torch (reference checkpoints:
src/trainers/base.py:166-187; lpips weights: src/losses/perceptual_loss.py:100-102).
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ddpm_ood_tpu.utils.pth_reader import load_pth  # noqa: E402


def _crafted_state_dict():
    g = torch.Generator().manual_seed(0)
    return {
        "conv.weight": torch.randn(8, 3, 3, 3, generator=g),
        "conv.bias": torch.randn(8, generator=g),
        "norm.weight": torch.randn(8, generator=g, dtype=torch.float64),
        "step": torch.tensor(7, dtype=torch.int64),
        "flags": torch.tensor([True, False]),
        "half": torch.randn(4, 4, generator=g).half(),
    }


def _assert_matches_torch(loaded, reference):
    assert set(loaded) == set(reference)
    for k, ref in reference.items():
        got = loaded[k]
        assert isinstance(got, np.ndarray), k
        np.testing.assert_array_equal(got, ref.numpy(), err_msg=k)
        assert got.dtype == ref.numpy().dtype, k


@pytest.mark.parametrize("zip_format", [True, False], ids=["zip", "legacy"])
def test_load_pth_matches_torch(tmp_path, zip_format):
    sd = _crafted_state_dict()
    path = tmp_path / "ckpt.pth"
    torch.save(sd, path, _use_new_zipfile_serialization=zip_format)
    _assert_matches_torch(load_pth(str(path)), sd)


@pytest.mark.parametrize("zip_format", [True, False], ids=["zip", "legacy"])
def test_load_pth_nested_tree_and_views(tmp_path, zip_format):
    """Reference checkpoints nest dicts and share storage via views
    (non-contiguous slices must materialize to the right values)."""
    g = torch.Generator().manual_seed(1)
    base = torch.randn(6, 4, generator=g)
    ckpt = {
        "epoch": 3,
        "model_state_dict": {"w": base.t(), "row": base[2]},  # transposed view
        "best_loss": 0.25,
    }
    path = tmp_path / "nested.pth"
    torch.save(ckpt, path, _use_new_zipfile_serialization=zip_format)
    got = load_pth(str(path))
    assert got["epoch"] == 3 and got["best_loss"] == 0.25
    np.testing.assert_array_equal(got["model_state_dict"]["w"], base.t().numpy())
    np.testing.assert_array_equal(got["model_state_dict"]["row"], base[2].numpy())
    assert got["model_state_dict"]["w"].flags["C_CONTIGUOUS"]


def test_load_pth_blocks_arbitrary_globals(tmp_path):
    """A pickle that smuggles a non-tensor global must be rejected, not run."""
    path = tmp_path / "evil.pth"
    payload = pickle.dumps({"x": __import__("os").system})
    path.write_bytes(payload)
    with pytest.raises(Exception, match="blocked global|bad magic|not a legacy"):
        load_pth(str(path))


def test_load_pth_real_unet_checkpoint_shape(tmp_path):
    """A reference-schema checkpoint (base.py:166-187) round-trips whole."""
    sd = {f"layer{i}.weight": torch.randn(2, 2) for i in range(3)}
    ckpt = {
        "epoch": 11,
        "global_step": 4096,
        "model_state_dict": sd,
        "best_loss": 0.125,
    }
    path = tmp_path / "reference.pth"
    torch.save(ckpt, path)
    got = load_pth(str(path))
    assert got["global_step"] == 4096
    _assert_matches_torch(got["model_state_dict"], sd)
