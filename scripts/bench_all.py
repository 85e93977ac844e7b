#!/usr/bin/env python
"""One-command benchmark orchestrator: reproduce the BASELINE.md table.

Runs every benchmark script in sequence (one chip — no parallel device use),
harvests the JSON lines each prints, and writes a single combined artifact:

    python scripts/bench_all.py --out /tmp/bench_all.json [--only a,b] [--full]

Born of the round-3 tunnel outage: on-chip measurement windows are precious
and ad-hoc bench invocations don't survive them. This script is the unattended
path — point it at a live chip and every BASELINE.md "Measured" row that can
be reproduced in bounded time regenerates itself; failures are recorded, not
fatal. Suites:

  default  headline sweep (bench.py), sampler grid incl. int8 and big-model
           variants, reference-exact plms_ref, train step, serving latency,
           native loader
  --full   adds the heavy ones: 3D pixel/latent train steps (bench_3d_pixel),
           cold-start compilation (fresh cache, ~6 min), and the hermetic
           quality harness (trains a model on chip, ~20 min)

Each job's stdout JSON lines land under its name in the output file, plus
rc/seconds; a markdown summary table prints at the end.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
PY = sys.executable


def _jobs(full: bool):
    j = [
        # (name, argv, timeout_s)
        ("headline_plms", [PY, "bench.py"], 2400),
        ("sweep_ddim", [PY, "scripts/bench_ddim.py", "--sampler", "ddim"], 2400),
        ("sweep_dpm_25_1", [PY, "scripts/bench_ddim.py", "--sampler", "dpm",
                            "--steps", "25", "--skip", "1"], 2400),
        ("sweep_plms_int8", [PY, "scripts/bench_ddim.py", "--sampler", "plms",
                             "--quantize", "int8"], 2400),
        ("sweep_dpm_int8", [PY, "scripts/bench_ddim.py", "--sampler", "dpm",
                            "--steps", "25", "--skip", "1",
                            "--quantize", "int8"], 2400),
        ("sweep_big_int8", [PY, "scripts/bench_ddim.py", "--sampler", "plms",
                            "--model", "big", "--shape", "32", "32", "3",
                            "--skip", "8", "--batch", "16", "--groups", "13",
                            "--quantize", "int8"], 3600),
        ("sweep_plms_w8", [PY, "scripts/bench_ddim.py", "--sampler", "plms",
                           "--quantize", "w8"], 2400),
        ("sweep_big_mixed", [PY, "scripts/bench_ddim.py", "--sampler", "plms",
                             "--model", "big", "--shape", "32", "32", "3",
                             "--skip", "8", "--batch", "16", "--groups", "13",
                             "--quantize", "mixed"], 3600),
        ("sweep_3d_ldm_int8", [PY, "scripts/bench_ddim.py", "--sampler", "plms",
                               "--shape", "20", "20", "16", "128",
                               "--skip", "16", "--batch", "8", "--groups", "3",
                               "--quantize", "int8"], 3600),
        ("sweep_3d_dpm", [PY, "scripts/bench_ddim.py", "--sampler", "dpm",
                          "--steps", "25", "--skip", "1",
                          "--shape", "20", "20", "16", "128",
                          "--batch", "8", "--groups", "3"], 3600),
        ("sweep_3d_dpm_int8", [PY, "scripts/bench_ddim.py", "--sampler", "dpm",
                               "--steps", "25", "--skip", "1",
                               "--shape", "20", "20", "16", "128",
                               "--batch", "8", "--groups", "3",
                               "--quantize", "int8"], 3600),
        ("plms_ref", [PY, "scripts/bench_plms_ref.py"], 2400),
        ("simplex_scoring", [PY, "scripts/bench_simplex.py"], 2400),
        ("train_step", [PY, "scripts/train_bench.py"], 2400),
        ("serve_latency", [PY, "scripts/bench_serve.py"], 2400),
        ("native_loader", [PY, "scripts/bench_loader.py"], 1200),
        ("quant_micro", [PY, "scripts/bench_quant_micro.py"], 1200),
    ]
    if full:
        j += [
            ("bench_3d_pixel", [PY, "scripts/bench_3d_pixel.py"], 5400),
            ("coldstart_serial", [PY, "scripts/bench_coldstart.py",
                                  "--parallel", "0"], 1800),
            ("coldstart_parallel", [PY, "scripts/bench_coldstart.py",
                                    "--parallel", "1"], 1800),
            ("quality_harness", [PY, "scripts/quality_check.py",
                                 "--pinned"], 7200),
            ("profile_3d_sweep", [PY, "scripts/profile_3d_sweep.py"], 2400),
        ]
    return j


def _json_lines(text: str):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/bench_all.json")
    p.add_argument("--only", default=None,
                   help="comma list of job names to run (default: all)")
    p.add_argument("--full", action="store_true",
                   help="include the heavy jobs (3D pixel, cold start, "
                   "quality harness)")
    p.add_argument("--list", action="store_true", help="list jobs and exit")
    args = p.parse_args()

    jobs = _jobs(args.full)
    if args.list:
        for name, argv, t in jobs:
            print(f"{name:20s} timeout={t:5d}s  {' '.join(argv[1:])}")
        return
    if args.only:
        keep = {s.strip() for s in args.only.split(",")}
        unknown = keep - {n for n, _, _ in jobs}
        if unknown:
            sys.exit(f"unknown job(s): {sorted(unknown)} "
                     f"(use --list; heavy jobs need --full)")
        jobs = [j for j in jobs if j[0] in keep]

    results = {}
    for name, argv, timeout in jobs:
        print(f"[bench_all] {name}: {' '.join(argv[1:])}", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                argv, cwd=ROOT, capture_output=True, text=True, timeout=timeout
            )
            rc, stdout, stderr = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1
            stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            stderr = f"TIMEOUT after {timeout}s"
        secs = time.perf_counter() - t0
        rows = _json_lines(stdout)
        results[name] = {"rc": rc, "seconds": round(secs, 1), "results": rows}
        if rc != 0:
            results[name]["stderr_tail"] = stderr[-2000:]
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[bench_all] {name}: {status}, {secs:.0f}s, "
              f"{len(rows)} result line(s)", flush=True)
        # persist incrementally — a wedged tunnel mid-suite keeps prior rows
        pathlib.Path(args.out).write_text(json.dumps(results, indent=2))

    print(f"\nwrote {args.out}\n")
    print("| job | status | seconds | key result |")
    print("|---|---|---|---|")
    for name, r in results.items():
        key = ""
        for row in r["results"]:
            for field in ("recons_per_s", "value", "img_per_s", "compile_s",
                          "tflops"):
                if field in row:
                    key = f"{field}={row[field]}"
                    break
            if key:
                break
        print(f"| {name} | {'ok' if r['rc'] == 0 else 'FAIL'} | "
              f"{r['seconds']} | {key} |")


if __name__ == "__main__":
    main()
