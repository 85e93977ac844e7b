"""The pinned quality gate's regression rule (scripts/quality_check.py
compare_quality): at the r5 pinned config (n_eval=512, DeLong half-width
~1 pt) an artificially injected 2-pt AUROC drop MUST trip the gate, and
within-noise jitter must not (VERDICT r4 #1 'demonstrably trips').
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_compare():
    spec = importlib.util.spec_from_file_location(
        "quality_check_under_test", REPO / "scripts" / "quality_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.compare_quality


def _entry(auroc: float, half: float) -> dict:
    return {"auroc": auroc, "auroc_ci": [auroc - half, auroc + half]}


def _payload(hard_auroc: float, half: float) -> dict:
    return {
        "per_sampler": {
            "plms": {"easy": _entry(1.0, 0.0), "hard": _entry(hard_auroc, half)}
        }
    }


def test_two_point_drop_trips_at_pinned_precision():
    compare = _load_compare()
    prev = _payload(0.96, half=0.01)
    cur = _payload(0.94, half=0.01)["per_sampler"]  # injected 2-pt drop
    lines, regressions = compare(prev, cur)
    assert regressions, lines
    assert any("hard" in r for r in regressions)


def test_within_noise_jitter_does_not_trip():
    compare = _load_compare()
    prev = _payload(0.96, half=0.01)
    cur = _payload(0.95, half=0.01)["per_sampler"]  # 1 pt < hypot(1,1)=1.41 pt
    lines, regressions = compare(prev, cur)
    assert not regressions, lines


def test_improvements_never_trip():
    compare = _load_compare()
    prev = _payload(0.90, half=0.01)
    cur = _payload(0.99, half=0.01)["per_sampler"]
    _, regressions = compare(prev, cur)
    assert not regressions


def test_old_entry_without_ci_uses_current_width():
    compare = _load_compare()
    prev = {"per_sampler": {"plms": {
        "easy": {"auroc": 1.0}, "hard": {"auroc": 0.96},
    }}}
    cur = _payload(0.93, half=0.01)["per_sampler"]  # 3-pt drop, thr ~1.41 pt
    _, regressions = compare(prev, cur)
    assert regressions


def test_legacy_wide_ci_still_gates_big_drops():
    """Against the r4 file (half-width 2.7 pt) the combined threshold is
    ~2.9 pt: a 5-pt drop must still trip on the r4->r5 comparison."""
    compare = _load_compare()
    prev = _payload(0.9658, half=0.0266)  # QUALITY_r04 plms/hard
    cur = _payload(0.9158, half=0.01)["per_sampler"]
    _, regressions = compare(prev, cur)
    assert regressions
