"""scripts/parity_report.py emits the AUROC parity artifact with DeLong CIs.

Drives the script's main() on synthetic result CSVs and checks the
auroc_table.json contract: percent-scale AUROCs, a measured_ci95 interval,
and null published fields while BASELINE.json.published.tables is
untranscribed (egress-blocked).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _df(filenames, types, ts, mses):
    return pd.DataFrame(
        {
            "filename": filenames,
            "type": types,
            "t": ts,
            "perceptual_difference": mses,
            "mse": mses,
        }
    )


def test_parity_report_artifact(tmp_path):
    import parity_report

    ood = tmp_path / "fashionmnist" / "ood"
    ood.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 6
    _df([f"v{i}" for i in range(n)], ["val"] * n, [100] * n,
        rng.uniform(0.1, 0.3, n)).to_csv(ood / "results_val.csv")
    _df([f"i{i}" for i in range(n)], ["in"] * n, [100] * n,
        rng.uniform(0.1, 0.3, n)).to_csv(ood / "results_in.csv")
    for name in ("MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"):
        _df([f"o{i}" for i in range(n)], ["out"] * n, [100] * n,
            rng.uniform(0.25, 0.6, n)).to_csv(ood / f"results_{name}.csv")

    parity_report.main(
        ["--output_dir", str(tmp_path), "--model_name", "fashionmnist"]
    )

    table = json.loads((ood / "auroc_table.json").read_text())
    assert table["model"] == "fashionmnist"
    comp = table["comparison"]
    assert set(comp) == {"MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"}
    for entry in comp.values():
        lo, hi = entry["measured_ci95"]
        assert 0.0 <= lo <= entry["measured_auroc"] <= hi <= 100.0
        # paper tables not transcribed in this environment
        assert entry["published_auroc"] is None
        assert entry["delta"] is None
        assert entry["published_within_ci"] is None
