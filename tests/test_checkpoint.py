"""Checkpoint save/restore/discovery with the reference's logical schema."""

from pathlib import Path

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


def test_cross_topology_restore(tmp_path):
    """A checkpoint saved from DEVICE arrays on the 8-device mesh must restore
    on a 1-device backend (train on a pod slice -> reconstruct/serve on one
    chip). The trainers save live jax.Arrays (base.py:save_checkpoint), so the
    checkpoint records the saving topology's shardings; both fixed restore
    paths (restore_checkpoint_replicated, replicated_restore_template) rebuild
    shardings over the CURRENT mesh instead of replaying the dead ones."""
    import json
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from ddpm_ood_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    w = jax.device_put(
        jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        NamedSharding(mesh, PartitionSpec()),
    )
    ckpt.save_checkpoint(tmp_path, "checkpoint", {
        "epoch": 7, "model_state_dict": {"w": w},
    })
    ckpt.wait_for_checkpoints()

    out_json = tmp_path / "restored.json"
    worker = Path(__file__).parent / "topology_restore_worker.py"
    proc = subprocess.run(
        [sys.executable, str(worker), str(tmp_path / "checkpoint"), str(out_json)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(out_json.read_text())
    for path in ("templateless", "templated"):
        assert out[path]["epoch"] == 7
        np.testing.assert_array_equal(
            np.asarray(out[path]["w"], np.float32), np.asarray(w)
        )


def test_config_json_roundtrip(tmp_path):
    cfg = {"embedding_dim": 64, "num_channels": [8, 8]}
    ckpt.save_config_json(tmp_path, "vqvae_config.json", cfg)
    out = ckpt.load_config_json(tmp_path / "vqvae_config.json")
    assert out["embedding_dim"] == 64


def test_numerics_version_stamp_and_guard(tmp_path, monkeypatch):
    """save_checkpoint stamps the run dir; resume-time check raises on a
    mismatched stamp (override env), warns when no stamp exists (pre-stamp
    runs whose conv-window numerics are unknown) — ADVICE r2: old checkpoints
    must fail loudly instead of silently reconstructing differently."""
    import warnings

    import pytest as _pytest

    from ddpm_ood_tpu.utils import checkpoint as ckpt

    run = tmp_path / "run"
    run.mkdir()
    # no stamp -> loud warning, no error
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ckpt.check_numerics_version(run)
    assert any("numerics" in str(x.message) for x in w)

    ckpt.save_checkpoint(run, "checkpoint", {"epoch": 1, "x": np.zeros(2)})
    ckpt.wait_for_checkpoints()
    assert (run / "numerics_version.json").exists()
    ckpt.check_numerics_version(run)  # matching stamp passes silently

    ckpt.save_config_json(run, "numerics_version.json", {"numerics_version": 1})
    with _pytest.raises(RuntimeError, match="numerics_version=1"):
        ckpt.check_numerics_version(run)
    monkeypatch.setenv("DDPM_OOD_TPU_ALLOW_NUMERICS_MISMATCH", "1")
    ckpt.check_numerics_version(run)  # override honored
