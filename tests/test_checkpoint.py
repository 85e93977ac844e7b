"""Checkpoint save/restore/discovery with the reference's logical schema."""

import numpy as np

from ddpm_ood_tpu.utils import checkpoint as ckpt


def _payload():
    return {
        "epoch": 5,
        "global_step": 1234,
        "best_loss": 0.25,
        "model_state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "optimizer_state_dict": {"m": np.zeros((2, 3), dtype=np.float32)},
    }


def test_roundtrip(tmp_path):
    # saves are async (overlap the train loop); flush before reading — the
    # trainers do this at the end of train()
    ckpt.save_checkpoint(tmp_path, "checkpoint", _payload())
    ckpt.wait_for_checkpoints()
    out = ckpt.restore_checkpoint(tmp_path / "checkpoint", _payload())
    assert int(out["epoch"]) == 5
    assert int(out["global_step"]) == 1234
    np.testing.assert_array_equal(
        out["model_state_dict"]["w"], _payload()["model_state_dict"]["w"]
    )


def test_find_checkpoint_order(tmp_path):
    assert ckpt.find_checkpoint(tmp_path) is None
    ckpt.save_checkpoint(tmp_path, "checkpoint_10", _payload())
    ckpt.save_checkpoint(tmp_path, "checkpoint_2", _payload())
    ckpt.wait_for_checkpoints()
    found = ckpt.find_checkpoint(tmp_path)
    assert found.name == "checkpoint_10"  # newest periodic when no rolling best
    ckpt.save_checkpoint(tmp_path, "checkpoint", _payload())
    ckpt.wait_for_checkpoints()
    assert ckpt.find_checkpoint(tmp_path).name == "checkpoint"  # rolling wins
    assert ckpt.find_checkpoint(tmp_path, epoch=2).name == "checkpoint_2"
    assert ckpt.find_checkpoint(tmp_path, epoch=99) is None


def test_config_json_roundtrip(tmp_path):
    cfg = {"embedding_dim": 64, "num_channels": [8, 8]}
    ckpt.save_config_json(tmp_path, "vqvae_config.json", cfg)
    out = ckpt.load_config_json(tmp_path / "vqvae_config.json")
    assert out["embedding_dim"] == 64
