from .score import (
    OOD_DATASET_REGISTRY,
    auroc,
    auroc_delong_ci,
    compute_ood_scores,
    out_datasets_for_model,
    run_ood_detection,
    zscore_against_val,
)

__all__ = [
    "OOD_DATASET_REGISTRY",
    "auroc",
    "auroc_delong_ci",
    "compute_ood_scores",
    "out_datasets_for_model",
    "run_ood_detection",
    "zscore_against_val",
]
