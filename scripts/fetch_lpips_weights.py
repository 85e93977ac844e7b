#!/usr/bin/env python
"""One-command LPIPS calibrated-weight fetch + convert + verify (egress-gated).

The reference's perceptual metric is lpips.LPIPS(net='alex', v0.1, pretrained)
(reference src/losses/perceptual_loss.py:100-102): torchvision's ImageNet
AlexNet features plus the published LPIPS linear calibration weights. Both are
licensed downloads, unreachable from an egress-less environment — so this
script packages the whole completion path for the first machine WITH egress:

    python scripts/fetch_lpips_weights.py --out /path/lpips_alex_v01.npz
    export LPIPS_WEIGHTS_NPZ=/path/lpips_alex_v01.npz   # picked up everywhere

It (1) downloads the two .pth artifacts (or consumes pre-placed local copies
via --alexnet_pth/--lpips_pth), (2) converts them with the fixture-proven
convert_torch_state_dict (tests/test_lpips_conversion.py), (3) VERIFIES the
converted JAX forward against an independent torch-functional LPIPS evaluated
with the real weights, and (4) writes the .npz that load_lpips_params consumes.

torch is NOT required: the .pth files are read with the framework's own
restricted-unpickler reader (ddpm_ood_tpu/utils/pth_reader.py, byte-parity
tested vs torch.load). When torch IS importable, step (3) additionally runs
the independent torch-functional verification; without torch that step is
skipped with a notice (the conversion itself is already golden-tested).
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ALEXNET_URL = "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth"
LPIPS_URL = (
    "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
    "lpips/weights/v0.1/alex.pth"
)


def _download(url: str, dest: Path) -> Path:
    if dest.exists():
        print(f"using cached {dest}")
        return dest
    print(f"downloading {url} -> {dest}")
    try:
        urllib.request.urlretrieve(url, dest)  # noqa: S310 — pinned https URLs
    except Exception as e:
        raise SystemExit(
            f"download failed ({e}); this environment may have no egress. "
            f"Fetch {url} elsewhere and pass it via --alexnet_pth/--lpips_pth."
        )
    return dest


def _load_state_dict(path: Path) -> dict:
    # torch-free: the restricted .pth reader returns numpy arrays directly
    from ddpm_ood_tpu.utils.pth_reader import load_pth

    sd = load_pth(str(path))
    return {k: np.asarray(v) for k, v in sd.items()}


def _torch_functional_lpips(alex_sd, lpips_sd, x_np, y_np):
    """Independent lpips v0.1 forward straight against torch.nn.functional
    (same golden as tests/test_lpips_conversion.py, run here with the REAL
    weights): ScalingLayer, AlexNet relu taps (maxpool after taps 1-2),
    channel-unit-normalize, squared diff, 1x1 lin conv, spatial mean, sum."""
    import torch
    import torch.nn.functional as F

    convs = [(0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1)]

    def features(z):
        taps = []
        for idx, s, p in convs:
            w = torch.from_numpy(alex_sd[f"features.{idx}.weight"])
            b = torch.from_numpy(alex_sd[f"features.{idx}.bias"])
            z = F.relu(F.conv2d(z, w, b, stride=s, padding=p))
            taps.append(z)
            if idx in (0, 3):
                z = F.max_pool2d(z, 3, 2)
        return taps

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    x = (2.0 * torch.from_numpy(x_np) - 1.0 - shift) / scale
    y = (2.0 * torch.from_numpy(y_np) - 1.0 - shift) / scale
    total = None
    for i, (ax, ay) in enumerate(zip(features(x), features(y))):
        ax = ax / (torch.sqrt((ax**2).sum(dim=1, keepdim=True)) + 1e-10)
        ay = ay / (torch.sqrt((ay**2).sum(dim=1, keepdim=True)) + 1e-10)
        diff = (ax - ay) ** 2
        w = torch.from_numpy(lpips_sd[f"lin{i}.model.1.weight"])
        val = F.conv2d(diff, w).mean(dim=(1, 2, 3))
        total = val if total is None else total + val
    return total.numpy()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--out", required=True, help="Output .npz path.")
    parser.add_argument(
        "--cache_dir", default="/tmp/lpips_artifacts",
        help="Where the downloaded .pth files land (reused on re-run).",
    )
    parser.add_argument(
        "--alexnet_pth", default=None,
        help="Pre-placed torchvision alexnet-owt .pth (skips download).",
    )
    parser.add_argument(
        "--lpips_pth", default=None,
        help="Pre-placed lpips v0.1 alex.pth (skips download).",
    )
    args = parser.parse_args(argv)

    cache = Path(args.cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    alex_path = (
        Path(args.alexnet_pth)
        if args.alexnet_pth
        else _download(ALEXNET_URL, cache / "alexnet-owt-7be5be79.pth")
    )
    lpips_path = (
        Path(args.lpips_pth)
        if args.lpips_pth
        else _download(LPIPS_URL, cache / "lpips_v0.1_alex.pth")
    )

    alex_sd = _load_state_dict(alex_path)
    lpips_sd = _load_state_dict(lpips_path)

    from ddpm_ood_tpu.losses.lpips import (
        LPIPS,
        convert_torch_state_dict,
        load_lpips_npz,
        save_lpips_npz,
    )

    params = convert_torch_state_dict(alex_sd, lpips_sd)
    save_lpips_npz(params, args.out)
    print(f"wrote {args.out}")

    # ---- verification with the real weights -----------------------------------
    try:
        import torch  # noqa: F401 — optional, only for the independent golden
    except ImportError:
        print(
            "torch not installed: skipping the independent torch-functional "
            "verification (conversion is golden-tested in "
            "tests/test_lpips_conversion.py); the .npz is ready to use"
        )
        print(f"export LPIPS_WEIGHTS_NPZ={args.out}")
        return

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    golden = _torch_functional_lpips(alex_sd, lpips_sd, x, y)
    ours = np.asarray(
        LPIPS().apply(
            load_lpips_npz(args.out),
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=1e-6)
    print(f"verified: max |jax - torch| = {np.abs(ours - golden).max():.2e} "
          f"on random probes")
    print(f"export LPIPS_WEIGHTS_NPZ={args.out}")


if __name__ == "__main__":
    main()
