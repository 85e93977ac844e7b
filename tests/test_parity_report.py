"""scripts/parity_report.py emits the AUROC parity artifact with DeLong CIs.

Drives the script's main() on synthetic result CSVs and checks the
auroc_table.json contract: percent-scale AUROCs, a measured_ci95 interval,
and null published fields while BASELINE.json.published.tables is
untranscribed (egress-blocked).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pandas as pd


def _load_parity_report():
    # import by file path instead of a session-long sys.path insert of
    # scripts/ (which could shadow same-named modules in later tests)
    path = Path(__file__).resolve().parent.parent / "scripts" / "parity_report.py"
    spec = importlib.util.spec_from_file_location("_parity_report_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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
    parity_report = _load_parity_report()

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
