"""Smoke coverage for the profiling scripts' device programs.

The round-4 TPU run of profile_3d_sweep.py died on a bf16/f32 scan-carry
mismatch in the PLMS-tail phase that the f32 CPU smoke could not catch; this
test runs the script end-to-end in BOTH dtypes on tiny shapes so every carry
path the TPU exercises is covered hermetically.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest


def _run_profile(argv):
    path = Path(__file__).resolve().parent.parent / "scripts" / "profile_3d_sweep.py"
    spec = importlib.util.spec_from_file_location("_profile_3d_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import sys

    old = sys.argv
    sys.argv = ["profile_3d_sweep.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_profile_3d_sweep_quick(dtype, capsys):
    _run_profile(["--quick", "--steps", "2", "--dtype", dtype])
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert payload["bench"] == "profile_3d_sweep"
    for phase in ("fwd_3d", "fwd_3d_noattn", "fwd_2d", "plms_tail_3d"):
        assert payload["phases"][phase]["ms"] > 0
    assert "attention_share_ms" in payload
