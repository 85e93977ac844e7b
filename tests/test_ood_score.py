"""OOD analytics: z-score math, AUROC, registry, eval accounting."""

import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.ood.score import (
    auroc,
    compute_ood_scores,
    dedup,
    model_evaluations,
    out_datasets_for_model,
    zscore_against_val,
)


def _df(filenames, types, ts, mses, percs=None):
    percs = percs if percs is not None else [0.0] * len(mses)
    return pd.DataFrame(
        {
            "filename": filenames,
            "type": types,
            "t": ts,
            "mse": mses,
            "perceptual_difference": percs,
        }
    )


def test_zscore_hand_computed():
    val = _df(["a", "b", "a", "b"], ["val"] * 4, [10, 10, 20, 20], [1.0, 3.0, 2.0, 6.0])
    rows = _df(["x", "y"], ["in", "out"], [10, 20], [3.0, 8.0])
    out = zscore_against_val(rows, val, targets=("mse",))
    # t=10: mean 2, std sqrt(2) (pandas ddof=1): z = (3-2)/1.41421 = 0.7071
    np.testing.assert_allclose(out["z_score_mse"].iloc[0], 1.0 / np.sqrt(2.0))
    # t=20: mean 4, std 2*sqrt(2): z = (8-4)/2.8284 = sqrt(2)
    np.testing.assert_allclose(out["z_score_mse"].iloc[1], np.sqrt(2.0))


def test_dedup_keeps_first():
    df = _df(["a", "a", "a"], ["in"] * 3, [10, 10, 20], [1.0, 9.0, 2.0])
    out = dedup(df)
    assert len(out) == 2
    assert out.iloc[0]["mse"] == 1.0


def test_auroc_perfect_separation():
    assert auroc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert auroc([0, 0, 1, 1], [0.9, 0.8, 0.1, 0.2]) == 0.0


def test_compute_ood_scores_end_to_end():
    rng = np.random.default_rng(0)
    ts = [100, 300, 500]
    val_rows = []
    for i in range(20):
        for t in ts:
            val_rows.append((f"v{i}", "val", t, rng.normal(1.0, 0.1), 0.0))
    in_rows = [
        (f"i{i}", "in", t, rng.normal(1.0, 0.1), 0.0)
        for i in range(10) for t in ts
    ]
    out_rows = [
        (f"o{i}", "out", t, rng.normal(3.0, 0.1), 0.0)
        for i in range(10) for t in ts
    ]

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["filename", "type", "t", "mse", "perceptual_difference"]
        )

    result = compute_ood_scores(mk(val_rows), mk(in_rows), mk(out_rows))
    assert result["auroc"] == 1.0  # 20-sigma separation
    assert result["n_in"] == 10 and result["n_out"] == 10 and result["n_val"] == 20


def test_max_t_filter():
    ts = [100, 900]
    val = _df(["a", "a", "b", "b"], ["val"] * 4, ts * 2, [1.0, 1.0, 1.5, 1.5])
    inn = _df(["i"] * 2, ["in"] * 2, ts, [1.0, 1.0])
    out = _df(["o"] * 2, ["out"] * 2, ts, [2.0, 2.0])
    res = compute_ood_scores(val, inn, out, max_t=500)
    assert list(res["t_values"]) == [100]


def test_registry_precedence_and_contents():
    assert out_datasets_for_model("fashionmnist_run")[0] == "MNIST"
    assert out_datasets_for_model("mnist_run")[0] == "FashionMNIST"
    assert "CelebA" in out_datasets_for_model("cifar10_big")
    assert len(out_datasets_for_model("decathlon_task01")) == 9
    assert "AbdomenCT" not in out_datasets_for_model("abdomenct_x")
    with pytest.raises(ValueError):
        out_datasets_for_model("unknown_model")


def test_model_evaluations_counting():
    # single start point t=990 -> all 100 PLMS grid entries <= 990 (incl. dup 980)
    assert model_evaluations([990]) == 101
    assert model_evaluations([0]) == 1
    assert model_evaluations([10]) == 2


def test_aupr_and_fpr95_hand_computed():
    """AUPR/FPR@95TPR extension (the reference reports AUROC only)."""
    from ddpm_ood_tpu.ood.score import aupr, fpr_at_95_tpr

    # perfect separation: AUPR 1, no false positives needed for full TPR
    labels = [0, 0, 0, 1, 1, 1]
    assert aupr(labels, [0.1, 0.2, 0.3, 0.7, 0.8, 0.9]) == 1.0
    assert fpr_at_95_tpr(labels, [0.1, 0.2, 0.3, 0.7, 0.8, 0.9]) == 0.0

    # one OOD sample scored below every in-dist sample: reaching 95% TPR
    # (= all 2 of 2 positives at this size) forces all negatives positive
    labels2 = [0, 0, 1, 1]
    scores2 = [0.5, 0.6, 0.9, 0.1]
    assert fpr_at_95_tpr(labels2, scores2) == 1.0
    # AUPR with precision@k checkpoints: P=1 at rank1, P=0.5 at rank4
    # average_precision = (1*1 + 0.25*... ) hand value from sklearn's step sum
    np.testing.assert_allclose(aupr(labels2, scores2), 0.75)


def test_compute_ood_scores_includes_extended_metrics():
    val = _df(
        ["v1", "v1", "v2", "v2"], ["val"] * 4, [100, 200, 100, 200],
        [0.1, 0.2, 0.3, 0.4],
    )
    in_df = _df(
        ["i1", "i1", "i2", "i2"], ["in"] * 4, [100, 200, 100, 200],
        [0.1, 0.2, 0.3, 0.4],
    )
    out_df = _df(
        ["o1", "o1", "o2", "o2"], ["out"] * 4, [100, 200, 100, 200],
        [0.9, 1.0, 1.1, 1.2],
    )
    scored = compute_ood_scores(val, in_df, out_df)
    assert scored["auroc"] == 1.0
    assert scored["aupr"] == 1.0
    assert scored["fpr95"] == 0.0


def test_run_ood_detection_report_flag(tmp_path):
    """--report=auroc,aupr,fpr95 prints and returns the extra metrics;
    an unknown metric fails loudly."""
    from ddpm_ood_tpu.ood.score import run_ood_detection

    ood = tmp_path / "m_fashionmnist" / "ood"
    ood.mkdir(parents=True)
    _df(
        ["v1", "v2"], ["val"] * 2, [100, 100], [0.1, 0.2]
    ).to_csv(ood / "results_val.csv")
    _df(["i1", "i2"], ["in"] * 2, [100, 100], [0.1, 0.2]).to_csv(
        ood / "results_in.csv"
    )
    for name in ("MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"):
        _df(["o1", "o2"], ["out"] * 2, [100, 100], [0.9, 1.0]).to_csv(
            ood / f"results_{name}.csv"
        )
    results = run_ood_detection(
        str(tmp_path), "m_fashionmnist", save_plots=False,
        report="auroc,aupr,fpr95",
    )
    assert results["aupr"] == [1.0] * 3
    assert results["fpr95"] == [0.0] * 3
    assert results["Zscore_mse"] == [1.0] * 3

    with pytest.raises(ValueError, match="unknown --report"):
        run_ood_detection(
            str(tmp_path), "m_fashionmnist", save_plots=False, report="f1",
        )


def test_run_ood_detection_writes_summary_csv(tmp_path):
    ood = tmp_path / "s_fashionmnist" / "ood"
    ood.mkdir(parents=True)
    _df(["v1", "v2"], ["val"] * 2, [100, 100], [0.1, 0.2]).to_csv(
        ood / "results_val.csv"
    )
    _df(["i1", "i2"], ["in"] * 2, [100, 100], [0.1, 0.2]).to_csv(
        ood / "results_in.csv"
    )
    for name in ("MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"):
        _df(["o1", "o2"], ["out"] * 2, [100, 100], [0.9, 1.0]).to_csv(
            ood / f"results_{name}.csv"
        )
    from ddpm_ood_tpu.ood.score import run_ood_detection

    run_ood_detection(str(tmp_path), "s_fashionmnist", save_plots=False,
                      report="auroc,fpr95")
    out = pd.read_csv(ood / "ood_scores_mse.csv")
    assert list(out["ood_data"]) == [
        "MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"
    ]
    assert (out["Zscore_mse"] == 1.0).all()
    assert "fpr95" in out.columns


def test_thin_validation_t_group_warns(capsys):
    from ddpm_ood_tpu.ood.score import zscore_against_val

    val = _df(["v1", "v2", "v3"], ["val"] * 3, [100, 100, 200], [0.1, 0.2, 0.15])
    rows = _df(["i1"], ["in"], [200], [0.5])
    out = zscore_against_val(rows, val, targets=("mse",))
    captured = capsys.readouterr().out
    assert "t=[200]" in captured and "WARNING" in captured
    # the thin group's z is NaN (reference-parity ddof=1), the rest well-defined
    assert out["z_score_mse"].isna().all()
