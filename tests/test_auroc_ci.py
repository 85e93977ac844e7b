"""DeLong AUROC confidence interval (--report=auroc_ci, framework extension).

The midrank implementation (ood/score.py:auroc_delong_ci, Sun & Xu
formulation) is verified against an independent O(m*n) transcription of
DeLong's structural components, against sklearn's AUROC, and against a
bootstrap interval on the same data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.ood.score import auroc, auroc_delong_ci, run_ood_detection


def _naive_delong(labels, scores, alpha=0.05):
    """Direct double-loop DeLong: psi kernel, structural components, variance."""
    import statistics

    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    m, n = len(pos), len(neg)
    psi = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            psi[i, j] = 1.0 if pos[i] > neg[j] else (0.5 if pos[i] == neg[j] else 0.0)
    # literature naming: V10 over the m positives, V01 over the n negatives
    v10 = psi.mean(axis=1)
    v01 = psi.mean(axis=0)
    auc = psi.mean()
    var = v10.var(ddof=1) / m + v01.var(ddof=1) / n
    z = statistics.NormalDist().inv_cdf(1 - alpha / 2)
    se = np.sqrt(var)
    return float(auc), max(0.0, auc - z * se), min(1.0, auc + z * se)


def test_delong_matches_naive_transcription():
    rng = np.random.default_rng(0)
    for trial in range(5):
        scores = np.concatenate(
            [rng.normal(0, 1, 17), rng.normal(1.2, 1.5, 23)]
        )
        # inject ties to exercise the midrank path
        scores = np.round(scores, 1)
        labels = np.array([0] * 17 + [1] * 23)
        got = auroc_delong_ci(labels, scores)
        want = _naive_delong(labels, scores)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_delong_point_estimate_matches_sklearn():
    rng = np.random.default_rng(1)
    scores = np.round(rng.normal(0, 1, 60), 1)
    labels = (rng.uniform(size=60) > 0.5).astype(int)
    auc, lo, hi = auroc_delong_ci(labels, scores)
    assert auc == pytest.approx(auroc(labels, scores), abs=1e-12)
    assert 0.0 <= lo <= auc <= hi <= 1.0


def test_delong_agrees_with_bootstrap():
    rng = np.random.default_rng(2)
    in_s = rng.normal(0, 1, 120)
    out_s = rng.normal(1.0, 1, 120)
    labels = np.array([0] * 120 + [1] * 120)
    scores = np.concatenate([in_s, out_s])
    _, lo, hi = auroc_delong_ci(labels, scores)
    boots = []
    for _ in range(400):
        bi = rng.choice(in_s, size=len(in_s), replace=True)
        bo = rng.choice(out_s, size=len(out_s), replace=True)
        boots.append(
            auroc([0] * len(bi) + [1] * len(bo), np.concatenate([bi, bo]))
        )
    blo, bhi = np.percentile(boots, [2.5, 97.5])
    # asymptotic and bootstrap intervals agree to ~the bootstrap's own noise
    assert lo == pytest.approx(blo, abs=0.03)
    assert hi == pytest.approx(bhi, abs=0.03)


def test_delong_perfect_separation_degenerates_to_point():
    labels = [0, 0, 0, 1, 1, 1]
    scores = [0.0, 0.1, 0.2, 5.0, 6.0, 7.0]
    with pytest.warns(UserWarning, match="zero width"):
        auc, lo, hi = auroc_delong_ci(labels, scores)
    assert auc == lo == hi == 1.0


def test_delong_requires_both_classes():
    with pytest.raises(ValueError, match="at least one"):
        auroc_delong_ci([1, 1], [0.1, 0.2])


def test_run_ood_detection_auroc_ci_report(tmp_path):
    ood = tmp_path / "ci_fashionmnist" / "ood"
    ood.mkdir(parents=True)

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

    rng = np.random.default_rng(3)
    n = 8
    _df([f"v{i}" for i in range(n)], ["val"] * n, [100] * n,
        rng.uniform(0.1, 0.3, n)).to_csv(ood / "results_val.csv")
    _df([f"i{i}" for i in range(n)], ["in"] * n, [100] * n,
        rng.uniform(0.1, 0.3, n)).to_csv(ood / "results_in.csv")
    for name in ("MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"):
        _df([f"o{i}" for i in range(n)], ["out"] * n, [100] * n,
            rng.uniform(0.2, 0.5, n)).to_csv(ood / f"results_{name}.csv")

    results = run_ood_detection(
        str(tmp_path), "ci_fashionmnist", save_plots=False,
        report="auroc,auroc_ci",
    )
    assert len(results["auroc_ci_lo"]) == 3
    for auc_val, lo, hi in zip(
        results["Zscore_mse"], results["auroc_ci_lo"], results["auroc_ci_hi"]
    ):
        assert 0.0 <= lo <= auc_val <= hi <= 1.0

    out = pd.read_csv(ood / "ood_scores_mse.csv")
    assert {"auroc_ci_lo", "auroc_ci_hi"} <= set(out.columns)
