#!/usr/bin/env python
"""Z-score OOD AUROCs from reconstruction CSVs — CLI parity with reference
ood_detection.py (incl. the comma-separated multi-model loop, :226-232)."""

import numpy as np

from ddpm_ood_tpu.config import parse_args_ood_detection
from ddpm_ood_tpu.ood import run_ood_detection

if __name__ == "__main__":
    args = parse_args_ood_detection()
    np.random.seed(args.seed)
    for model in args.model_name.split(","):
        run_ood_detection(
            output_dir=args.output_dir,
            model_name=model,
            max_t=args.max_t,
            min_t=args.min_t,
            plot_target=args.plot_target,
            report=args.report,
        )
