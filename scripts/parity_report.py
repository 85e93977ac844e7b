#!/usr/bin/env python
"""Emit the AUROC parity table for a completed reconstruction run and compare
it against `BASELINE.json.published` (when the paper tables have been
transcribed — see transcription_status there).

Writes <output_dir>/<model>/ood/auroc_table.json and prints a table; exits 0
either way so the unattended parity pipeline (scripts/parity_run.sh) completes
and leaves the comparison artifact for the first human to read.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name", default="fashionmnist")
    args = p.parse_args(argv)

    from ddpm_ood_tpu.ood.score import run_ood_detection

    # structured results, not stdout scraping; auroc_ci adds the DeLong 95%
    # interval so the 0.5-pt gate can be read against sampling uncertainty
    results = run_ood_detection(
        output_dir=args.output_dir, model_name=args.model_name,
        report="auroc,auroc_ci",
    )

    baseline_path = pathlib.Path(__file__).resolve().parent.parent / "BASELINE.json"
    published = json.load(open(baseline_path)).get("published", {})
    table = published.get("tables", {})  # absent until transcribed from PDFs

    comparison = {}
    for i, dataset in enumerate(results["ood_data"]):
        measured = round(results["Zscore_mse"][i] * 100, 1)  # percent, as printed
        ref = table.get(dataset)
        # containment is judged on the UNROUNDED interval; rounding is display-only
        lo_exact = results["auroc_ci_lo"][i] * 100
        hi_exact = results["auroc_ci_hi"][i] * 100
        comparison[dataset] = {
            "measured_auroc": measured,
            "measured_ci95": [round(lo_exact, 1), round(hi_exact, 1)],
            "published_auroc": ref,
            "delta": None if ref is None else round(measured - float(ref), 2),
            "published_within_ci": (
                None if ref is None else bool(lo_exact <= float(ref) <= hi_exact)
            ),
        }

    out_path = (
        pathlib.Path(args.output_dir) / args.model_name / "ood" / "auroc_table.json"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "model": args.model_name,
                "comparison": comparison,
                "published_status": published.get("transcription_status"),
            },
            f, indent=2,
        )
    print(f"wrote {out_path}")
    if not table:
        print(
            "published paper tables not yet transcribed "
            "(BASELINE.json.published.transcription_status) — add them under "
            "published.tables as {dataset: auroc} to gate on the 0.5-pt rule"
        )
    else:
        worst = max(
            (abs(c["delta"]) for c in comparison.values() if c["delta"] is not None),
            default=None,
        )
        if worst is not None:
            verdict = "PASS" if worst <= 0.5 else "FAIL"
            print(f"parity gate (0.5 AUROC pts): worst |delta| = {worst} -> {verdict}")


if __name__ == "__main__":
    main()
