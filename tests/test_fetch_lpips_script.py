"""The egress-gated LPIPS fetch+convert script must complete unattended once
artifacts exist: exercised here with pre-placed synthetic .pth files (the
--alexnet_pth/--lpips_pth path), which drives the same convert -> save ->
re-load -> verify-against-torch-golden sequence the real download path runs.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_lpips_conversion import _make_torch_state_dicts  # noqa: E402


def _load_script():
    path = Path(__file__).parent.parent / "scripts" / "fetch_lpips_weights.py"
    spec = importlib.util.spec_from_file_location("fetch_lpips_weights", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fetch_script_converts_and_verifies(tmp_path):
    rng = np.random.default_rng(21)
    alex_sd, lpips_sd = _make_torch_state_dicts(rng)
    alex_pth = tmp_path / "alexnet.pth"
    lpips_pth = tmp_path / "alex.pth"
    torch.save({k: torch.from_numpy(v) for k, v in alex_sd.items()}, alex_pth)
    torch.save({k: torch.from_numpy(v) for k, v in lpips_sd.items()}, lpips_pth)

    mod = _load_script()
    out = tmp_path / "lpips.npz"
    mod.main([
        "--out", str(out),
        "--alexnet_pth", str(alex_pth),
        "--lpips_pth", str(lpips_pth),
    ])
    assert out.exists()

    # the written npz round-trips into the loader everything else uses
    from ddpm_ood_tpu.losses.lpips import load_lpips_params

    params = load_lpips_params(str(out))
    assert params["params"]["net"]["conv0"]["kernel"].shape == (11, 11, 3, 64)


def test_fetch_script_works_without_torch(tmp_path, monkeypatch):
    """The conversion path is torch-free (utils/pth_reader.py): with torch
    import blocked, the script still converts and writes the npz, skipping
    only the optional torch-functional verification."""
    import builtins

    rng = np.random.default_rng(22)
    alex_sd, lpips_sd = _make_torch_state_dicts(rng)
    alex_pth = tmp_path / "alexnet.pth"
    lpips_pth = tmp_path / "alex.pth"
    torch.save({k: torch.from_numpy(v) for k, v in alex_sd.items()}, alex_pth)
    # the real lpips v0.1 weights predate the zip container — use legacy format
    torch.save({k: torch.from_numpy(v) for k, v in lpips_sd.items()}, lpips_pth,
               _use_new_zipfile_serialization=False)

    mod = _load_script()
    real_import = builtins.__import__

    def block_torch(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch disabled for this test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block_torch)
    out = tmp_path / "lpips_notorch.npz"
    mod.main([
        "--out", str(out),
        "--alexnet_pth", str(alex_pth),
        "--lpips_pth", str(lpips_pth),
    ])
    monkeypatch.undo()
    assert out.exists()

    from ddpm_ood_tpu.losses.lpips import load_lpips_params

    params = load_lpips_params(str(out))
    assert params["params"]["net"]["conv0"]["kernel"].shape == (11, 11, 3, 64)


def test_fetch_script_fails_cleanly_without_egress(tmp_path, monkeypatch):
    mod = _load_script()

    def no_net(url, dest):
        raise OSError("no route to host")

    monkeypatch.setattr(mod.urllib.request, "urlretrieve", no_net)
    with pytest.raises(SystemExit, match="egress"):
        mod.main(["--out", str(tmp_path / "x.npz"),
                  "--cache_dir", str(tmp_path)])
