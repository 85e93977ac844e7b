"""OOD scoring analytics: Z-score aggregation + AUROC over reconstruction CSVs.

Capability parity with the reference's host-side scorer (ood_detection.py:40-223):
  - reads `ood/results_{val,in,<name>}.csv` produced by the reconstruction stage
    (columns: filename, type, t, perceptual_difference, mse);
  - dedups (filename, t) rows — kept for compatibility with even-divisible
    sharding duplicates (reference :53-54, 143-145);
  - filters start timesteps by (min_t, max_t) (:56-61) and reports the PLMS model-
    evaluation count for the configuration (:64-79, via diffusion/plms.py instead
    of instantiating a scheduler);
  - per-t validation mean/std -> per-row Z-scores for BOTH mse and
    perceptual_difference (:150-161); per-image mean Z over t (:174);
  - AUROC with in=0 / out=1 via sklearn (:193-206); per-model OOD dataset registry
    (:92-135); headline plot target is "mse" (:73);
  - optional z-vs-t curve plot saved to the run dir (the reference calls
    plt.show(), :177-192 — headless here).

This layer is deliberately host-side pandas/numpy: it is I/O-bound analytics over
a few thousand scalar rows, not device work.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..diffusion.plms import pndm_timesteps

_MEDNIST = ("AbdomenCT", "BreastMRI", "ChestCT", "CXR", "Hand", "HeadCT")

# model-name substring -> held-out OOD datasets (reference ood_detection.py:92-135)
OOD_DATASET_REGISTRY: Dict[str, Tuple[str, ...]] = {
    "fashionmnist": ("MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"),
    "mnist": ("FashionMNIST", "MNIST_vflip", "MNIST_hflip"),
    "cifar10": ("SVHN", "CelebA", "CIFAR10_vflip", "CIFAR10_hflip"),
    "celeba": ("CIFAR10", "SVHN", "CelebA_vflip", "CelebA_hflip"),
    "svhn": ("CIFAR10", "CelebA", "SVHN_vflip", "SVHN_hflip"),
    "abdomenct": tuple(d for d in _MEDNIST if d != "AbdomenCT"),
    "breastmri": tuple(d for d in _MEDNIST if d != "BreastMRI"),
    "cxr": tuple(d for d in _MEDNIST if d != "CXR"),
    "chestct": tuple(d for d in _MEDNIST if d != "ChestCT"),
    "hand": tuple(d for d in _MEDNIST if d != "Hand"),
    "headct": tuple(d for d in _MEDNIST if d != "HeadCT"),
    "decathlon": tuple(f"Task{i:02d}" for i in range(2, 11)),
}


def out_datasets_for_model(model_name: str) -> Tuple[str, ...]:
    """Registry lookup by substring; 'fashionmnist' must win over 'mnist'
    (reference's if/elif ordering, ood_detection.py:95-135)."""
    name = model_name.lower()
    order = [
        "fashionmnist", "mnist", "cifar10", "celeba", "svhn",
        "abdomenct", "breastmri", "cxr", "chestct", "hand", "headct",
    ]
    for key in order:
        if key in name:
            return OOD_DATASET_REGISTRY[key]
    if "decathlon" in name or "Task01" in model_name:
        return OOD_DATASET_REGISTRY["decathlon"]
    raise ValueError(f"Unknown dataset to select for run_dir {model_name}")


def auroc(labels: Sequence[int], scores: Sequence[float]) -> float:
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(labels, scores))


def aupr(labels: Sequence[int], scores: Sequence[float]) -> float:
    """Area under precision-recall with OOD (label 1) as the positive class
    (framework extension; the reference reports AUROC only)."""
    from sklearn.metrics import average_precision_score

    return float(average_precision_score(labels, scores))


def fpr_at_95_tpr(labels: Sequence[int], scores: Sequence[float]) -> float:
    """False-positive rate at the lowest threshold reaching 95% true-positive
    rate on OOD (label 1) — the standard OOD-detection operating point
    (framework extension)."""
    from sklearn.metrics import roc_curve

    fpr, tpr, _ = roc_curve(labels, scores)
    idx = np.argmax(tpr >= 0.95)
    return float(fpr[idx])


def _midrank(x: np.ndarray) -> np.ndarray:
    """Midranks (average rank over ties), 1-based — the DeLong building block."""
    order = np.argsort(x, kind="mergesort")
    z = x[order]
    n = len(x)
    ranks = np.zeros(n)
    i = 0
    while i < n:
        j = i
        while j < n and z[j] == z[i]:
            j += 1
        ranks[i:j] = 0.5 * (i + j - 1) + 1.0
        i = j
    out = np.empty(n)
    out[order] = ranks
    return out


def auroc_delong_ci(
    labels: Sequence[int], scores: Sequence[float], alpha: float = 0.05
) -> Tuple[float, float, float]:
    """AUROC with a DeLong (1988) asymptotic confidence interval, computed via
    the Sun & Xu midrank formulation (framework extension; the reference prints
    point AUROCs only, ood_detection.py:193-206).

    Returns (auc, lo, hi) with the interval clipped to [0, 1]. Structural
    components follow the literature's naming: V10_i = mean_j psi(out_i, in_j)
    over the m OOD (positive) scores, and V01_j = mean_i psi(out_i, in_j) over
    the n in-distribution (negative) scores, with psi the Mann-Whitney kernel
    (ties = 1/2); the AUROC variance estimate is var(V10)/m + var(V01)/n.

    Known DeLong limitation: with perfect separation (or a single-sample
    class) both component variances are 0 and the interval degenerates to
    zero width (e.g. [1.0, 1.0]). At small n this overstates certainty — a
    warning is emitted so a zero-width CI is not read as zero uncertainty;
    treat it as "no overlap observed", not "no sampling error".
    """
    import statistics
    import warnings

    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    pos = scores[labels == 1]  # OOD
    neg = scores[labels == 0]  # in-distribution
    m, n = len(pos), len(neg)
    if m == 0 or n == 0:
        raise ValueError("DeLong CI needs at least one in and one out score")
    tz = _midrank(np.concatenate([pos, neg]))
    v10 = (tz[:m] - _midrank(pos)) / n
    v01 = 1.0 - (tz[m:] - _midrank(neg)) / m
    auc = float(v10.mean())
    s10 = float(v10.var(ddof=1)) if m > 1 else 0.0
    s01 = float(v01.var(ddof=1)) if n > 1 else 0.0
    se = float(np.sqrt(s10 / m + s01 / n))
    if se == 0.0:
        warnings.warn(
            "DeLong variance is 0 (perfect separation or single-sample class):"
            f" the CI degenerates to zero width at m={m}, n={n} and understates"
            " uncertainty — do not read it as exact",
            stacklevel=2,
        )
    z = statistics.NormalDist().inv_cdf(1.0 - alpha / 2.0)
    return auc, max(0.0, auc - z * se), min(1.0, auc + z * se)


OOD_METRICS = {"auroc": auroc, "aupr": aupr, "fpr95": fpr_at_95_tpr}
# report keys with non-scalar outputs, handled specially by run_ood_detection
EXTENDED_REPORTS = ("auroc_ci",)


def dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Drop duplicate (filename, t) rows (DDP even-divisible padding artifact)."""
    return df.drop_duplicates(subset=["filename", "t"], keep="first")


def select_t(df: pd.DataFrame, t_values: Iterable[int]) -> pd.DataFrame:
    return df[df["t"].isin(list(t_values))]


def model_evaluations(t_values: Sequence[int], num_inference_steps: int = 100) -> int:
    """Total UNet evaluations implied by the start points (reference :64-79)."""
    ts = pndm_timesteps(1000, num_inference_steps)
    return int(sum(int((ts <= t).sum()) for t in t_values))


def zscore_against_val(
    results_df: pd.DataFrame,
    val_df: pd.DataFrame,
    targets: Sequence[str] = ("perceptual_difference", "mse"),
) -> pd.DataFrame:
    """Per-t val mean/std -> z_score_<target> columns (reference :150-161)."""
    df = results_df.copy()
    # ddof=1 std is NaN for single-row t-groups (the reference behaves the
    # same); downstream AUROCs then silently degrade — warn loudly instead
    thin = val_df.groupby("t").size()
    thin = thin[thin < 2]
    if len(thin):
        print(
            "WARNING: validation has <2 rows for t="
            f"{sorted(int(t) for t in thin.index)} — per-t std is undefined "
            "(NaN z-scores); add validation images or widen t filters"
        )
    for target in targets:
        agg = (
            val_df.groupby("t")[target]
            .agg(["mean", "std"])
            .reset_index()
            .rename(columns={"mean": f"val_mean_{target}", "std": f"val_std_{target}"})
        )
        df = df.merge(agg, on="t", how="left")
        df[f"z_score_{target}"] = (
            df[target] - df[f"val_mean_{target}"]
        ) / df[f"val_std_{target}"]
    return df


def compute_ood_scores(
    val_df: pd.DataFrame,
    in_df: pd.DataFrame,
    out_df: pd.DataFrame,
    plot_target: str = "mse",
    min_t: int = 0,
    max_t: int = 1000,
) -> Dict[str, object]:
    """Full scoring for one (in, out) pair. Returns the AUROC plus the per-image
    mean-Z table (z-scored rows available for plotting)."""
    val_df = dedup(val_df)
    t_values = np.asarray(sorted(val_df["t"].unique()))
    t_values = t_values[(t_values < max_t) & (t_values > min_t)]
    val_df = select_t(val_df, t_values)

    in_df = select_t(dedup(in_df), t_values)
    out_df = select_t(dedup(out_df), t_values)
    combined = pd.concat((in_df, out_df))
    # the optional likelihood column (reconstruct.py --score_elbo=1) rides the
    # same per-t z-score machinery when present in both val and test CSVs
    targets = ["perceptual_difference", "mse"]
    if "elbo" in combined.columns and "elbo" in val_df.columns:
        targets.append("elbo")
    elif plot_target in ("elbo", "mse+elbo"):
        raise ValueError(
            f"plot_target={plot_target!r} needs an 'elbo' column in the result "
            "CSVs — rerun reconstruct.py with --score_elbo=1"
        )
    if "ssim_distance" in combined.columns and "ssim_distance" in val_df.columns:
        targets.append("ssim_distance")
    elif plot_target in ("ssim_distance", "mse+ssim"):
        raise ValueError(
            f"plot_target={plot_target!r} needs an 'ssim_distance' column in "
            "the result CSVs — rerun reconstruct.py with --score_ssim=1"
        )
    combined = zscore_against_val(combined, val_df, targets=targets)

    target = f"z_score_{plot_target}"
    if plot_target == "mse+perceptual":
        combined["z_score_mse+perceptual"] = (
            combined["z_score_mse"] + combined["z_score_perceptual_difference"]
        )
    elif plot_target == "mse+elbo":
        combined["z_score_mse+elbo"] = (
            combined["z_score_mse"] + combined["z_score_elbo"]
        )
    elif plot_target == "mse+ssim":
        combined["z_score_mse+ssim"] = (
            combined["z_score_mse"] + combined["z_score_ssim_distance"]
        )
    per_image = (
        combined.groupby(["filename", "type"]).mean(numeric_only=True).reset_index()
    )
    in_scores = per_image.loc[per_image["type"] == "in", target].to_numpy()
    out_scores = per_image.loc[per_image["type"] == "out", target].to_numpy()
    labels = [0] * len(in_scores) + [1] * len(out_scores)
    scores = np.concatenate([in_scores, out_scores])
    return {
        "auroc": auroc(labels, scores),
        "aupr": aupr(labels, scores),
        "fpr95": fpr_at_95_tpr(labels, scores),
        "labels": np.asarray(labels),
        "scores": scores,
        "per_image": per_image,
        "rows": combined,
        "t_values": t_values,
        "n_in": int(in_df["filename"].nunique()),
        "n_out": int(out_df["filename"].nunique()),
        "n_val": int(val_df["filename"].nunique()),
    }


def _plot_curves(rows: pd.DataFrame, plot_target: str, path: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    colors = {"in": "b", "out": "r"}
    for typ in ("in", "out"):
        sub = rows.loc[rows["type"] == typ]
        for fid in sub["filename"].unique()[:50]:
            rec = sub.loc[sub["filename"] == fid]
            plt.plot(rec["t"], rec[f"z_score_{plot_target}"],
                     color=colors[typ], alpha=0.3)
    plt.xlabel("t")
    plt.ylabel(f"z_score_{plot_target}")
    plt.savefig(path, dpi=100)
    plt.close()


def run_ood_detection(
    output_dir: str,
    model_name: str,
    max_t: int = 1000,
    min_t: int = 0,
    plot_target: str = "mse",
    save_plots: bool = True,
    out_datasets: Optional[Sequence[str]] = None,
    report: str = "auroc",
) -> Dict[str, List]:
    """Driver for one model: mirrors reference main() (ood_detection.py:40-223)."""
    run_dir = Path(output_dir) / model_name
    out_dir = run_dir / "ood"
    out_dir.mkdir(exist_ok=True, parents=True)
    print(f"Run directory: {run_dir}")

    val_df = dedup(pd.read_csv(out_dir / "results_val.csv"))
    t_values = np.asarray(sorted(val_df["t"].unique()))
    t_sel = t_values[(t_values < max_t) & (t_values > min_t)]
    total_evals = model_evaluations(t_sel)
    print(
        f"SETTING MAX_T to {max_t} with a total of {len(t_sel)} starting points "
        f"{total_evals} model evaluations"
    )
    print(f"Plot target is {plot_target}")

    if out_datasets is None:
        out_datasets = out_datasets_for_model(model_name)
    metrics = [m.strip() for m in report.split(",") if m.strip()]
    unknown = [
        m for m in metrics if m not in OOD_METRICS and m not in EXTENDED_REPORTS
    ]
    if unknown:
        raise ValueError(
            f"unknown --report metric(s) {unknown}; choose from "
            f"{sorted(OOD_METRICS) + list(EXTENDED_REPORTS)}"
        )
    with_ci = "auroc_ci" in metrics
    extra = [m for m in metrics if m != "auroc" and m in OOD_METRICS]
    results = {"ood_data": [], f"Zscore_{plot_target}": []}
    for m in extra:
        results[m] = []
    if with_ci:
        results["auroc_ci_lo"] = []
        results["auroc_ci_hi"] = []
    for out_name in out_datasets:
        in_df = pd.read_csv(out_dir / "results_in.csv")
        out_df = pd.read_csv(out_dir / f"results_{out_name}.csv")
        scored = compute_ood_scores(
            val_df, in_df, out_df, plot_target=plot_target,
            min_t=min_t, max_t=max_t,
        )
        print(
            f"n_val={scored['n_val']} n_in={scored['n_in']} n_out={scored['n_out']}"
        )
        if save_plots:
            _plot_curves(
                scored["rows"], plot_target,
                out_dir / f"zscore_curves_{out_name}.png",
            )
        results["ood_data"].append(out_name)
        results[f"Zscore_{plot_target}"].append(scored["auroc"])
        for m in extra:
            results[m].append(scored[m])
        if with_ci:
            _, lo, hi = auroc_delong_ci(scored["labels"], scored["scores"])
            results["auroc_ci_lo"].append(lo)
            results["auroc_ci_hi"].append(hi)

    for i, o in enumerate(results["ood_data"]):
        ci = (
            f" (95% CI [{results['auroc_ci_lo'][i] * 100:.1f}, "
            f"{results['auroc_ci_hi'][i] * 100:.1f}])"
            if with_ci
            else ""
        )
        print(
            f"AUC for {model_name} vs {o}: "
            f"{results[f'Zscore_{plot_target}'][i] * 100:.1f}{ci}"
        )
        for m in extra:
            label = {"aupr": "AUPR", "fpr95": "FPR@95TPR"}[m]
            print(f"{label} for {model_name} vs {o}: {results[m][i] * 100:.1f}")
    print(
        f"Average AUC: {np.mean(results[f'Zscore_{plot_target}']) * 100:.1f}"
    )
    for m in extra:
        label = {"aupr": "AUPR", "fpr95": "FPR@95TPR"}[m]
        print(f"Average {label}: {np.mean(results[m]) * 100:.1f}")
    # persist the score table beside the plots (framework extension; the
    # reference only prints) so sweeps over models/targets are comparable
    # without scraping stdout
    pd.DataFrame(results).to_csv(
        out_dir / f"ood_scores_{plot_target}.csv", index=False
    )
    return results
