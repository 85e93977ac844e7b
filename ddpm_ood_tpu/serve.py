"""Long-lived OOD scoring service over a trained run — a serving surface.

The reference is a batch research pipeline; this module adds the deployment
story: load a trained (possibly latent) DDPM once, keep the compiled
reconstruction-sweep program resident on the accelerator, and score incoming
images against the validation per-t statistics — the same Z-score math
`ood_detection.py` applies offline (reference ood_detection.py:150-174), but
per request instead of per CSV.

Pieces:
  - build_recon_program(trainer, args, ...): the single place a ReconProgram is
    assembled from a trainer's model/VQ-VAE/schedule state (shared with the
    batch Reconstruct pipeline so serving and offline scoring cannot diverge);
  - ScoringService: pads each request up to the compiled batch size (static
    shapes: one compile, every request reuses it), runs the sweep, z-scores
    against results_val.csv stats, returns per-image scores;
  - OODRequestHandler / serve_forever: a dependency-free stdlib HTTP front end
    (POST /score with an .npy body -> JSON; GET /healthz).

Throughput note: requests serialize on the device (one sweep in flight) —
at the measured 373 recons/s (BASELINE.md) a skip-4 request for one image
costs ~70 ms of device time; batch requests amortize exactly like the
offline sweep.
"""

from __future__ import annotations

import collections
import hmac
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import pandas as pd

from .ood.score import dedup
from .recon.sweep import ReconProgram


def resolve_recon_groups(value, spatial_dimension: int) -> int:
    """'auto' -> the autotuned lane-group count measured on v5e
    (scripts/autotune_sweep.py grids, DESIGN.md): 2D -> 16 (G=3 255.7,
    G=8 351.3, G=16 375.3, G=25 377.3 recons/s — 16 is within 0.5% of the
    best at 9 fewer compiles), 3D -> 3 (mega-batch utilization beats
    masked-eval savings: G=3 20.6 vs G=5 15.7, G=7 14.6 latent-recons/s).
    Integers pass through; the sweep clamps to the start-point count."""
    if value is None:
        value = "auto"
    s = str(value).strip().lower()
    if s == "auto":
        return 16 if int(spatial_dimension) == 2 else 3
    return int(s)


def build_recon_program(
    trainer,
    args,
    perceptual_fn=None,
    simplex_noise_fn=None,
    host_noise_fn=None,
    skip_factor: Optional[int] = None,
) -> ReconProgram:
    """Assemble the scoring program from a BaseTrainer-derived object (which
    owns model_fn / encode_fn / decode_fn / sched / b_scale / latent_pad)."""
    return ReconProgram(
        sched=trainer.sched,
        model_fn=trainer.model_fn,
        num_inference_steps=int(getattr(args, "num_inference_steps", 100)),
        inference_skip_factor=int(
            skip_factor
            if skip_factor is not None
            else getattr(args, "inference_skip_factor", 1)
        ),
        b_scale=trainer.b_scale,
        sampler=getattr(args, "sampler", "plms"),
        num_groups=resolve_recon_groups(
            getattr(args, "recon_groups", "auto"),
            getattr(args, "spatial_dimension", 2),
        ),
        latent_pad=trainer.latent_pad,
        encode_fn=trainer.encode_fn,
        decode_fn=trainer.decode_fn,
        perceptual_fn=perceptual_fn,
        simplex_noise_fn=simplex_noise_fn,
        host_noise_fn=host_noise_fn,
        latent_sample_shape=tuple(trainer._latent_sample_shape()),
        out_mesh=trainer.mesh if jax.process_count() > 1 else None,
        score_elbo=bool(getattr(args, "score_elbo", 0)),
        score_ssim=bool(getattr(args, "score_ssim", 0)),
        score_error_maps=bool(getattr(args, "save_error_maps", 0)),
    )


def serving_example(args, batch_size: int, shard_fn=None):
    """The example batch the serving geometry compiles for: `(batch,
    *spatial, C)` float32 zeros (shape is all that matters), sharded like the
    real requests when `shard_fn` is given. Returns None when the geometry
    can't be derived from args (no image_size/image_roi)."""
    from .trainers.base import _as_tuple

    spatial = None
    if getattr(args, "image_size", None):
        spatial = (int(args.image_size),) * int(
            getattr(args, "spatial_dimension", 2)
        )
    elif getattr(args, "image_roi", None):
        # the CLI leaves image_roi as a raw string like "[160,160,128]"
        # (reference ast.literal_eval convention); parse it the same way
        # BaseTrainer does
        spatial = tuple(int(s) for s in _as_tuple(args.image_roi))
    if spatial is None:
        return None
    channels = 1 if getattr(args, "is_grayscale", 0) else 3
    example = np.zeros((int(batch_size),) + spatial + (channels,), np.float32)
    if shard_fn is not None:
        example = shard_fn(example)
    return example


def warmup_program(
    program: ReconProgram, args, batch_size: int, shard_fn=None
) -> float:
    """Pre-compile every sweep group for the serving geometry. Returns
    seconds spent, or -1.0 when the geometry can't be derived from args (no
    image_size/image_roi) — the first request then pays the compiles.
    `shard_fn` must match the ScoringService's (GSPMD jit caches per input
    sharding — warming with a different placement would compile twice).
    Concurrent compilation is opt-in via DDPM_OOD_TPU_PARALLEL_COMPILE=1
    (see ReconProgram.warmup)."""
    import os

    example = serving_example(args, batch_size, shard_fn)
    if example is None:
        return -1.0
    return program.warmup(
        example,
        parallel=os.environ.get("DDPM_OOD_TPU_PARALLEL_COMPILE", "") == "1",
    )


class ScoringService:
    """Score images against a trained run's validation statistics.

    program: a ReconProgram; batch_size: the compiled batch (requests are
    wrap-padded up to it — one compile serves every request size <= batch);
    val_stats: per-t mean/std of mse and perceptual_difference, from a
    `results_val.csv` written by the reconstruction stage."""

    def __init__(
        self,
        program: ReconProgram,
        val_stats: pd.DataFrame,
        batch_size: int,
        model_name: str = "model",
        reload_fn=None,
        shard_fn=None,
        flag_fpr: float = 0.0,
        drift_window: int = 256,
    ):
        self.program = program
        # optional GSPMD placement of the request batch over a data-parallel
        # device mesh (parallel/mesh.py shard_batch bound to the trainer's
        # mesh) — on a multi-chip host the sweep then runs data-parallel
        # instead of on device 0. Must also be applied at warmup
        # (warmup_program(shard_fn=...)) so the compiled executables match.
        self.shard_fn = shard_fn
        # checkpoint hot-reload hook (POST /reload): a callable that re-reads
        # weights and swaps program.model_fn, returning a description string.
        # Weights are traced program ARGUMENTS (docs/DESIGN.md), so the swap
        # reuses every compiled sweep — zero recompiles (tested).
        self.reload_fn = reload_fn
        self.batch_size = int(batch_size)
        self.model_name = model_name
        self._lock = threading.Lock()  # one sweep in flight on the device
        self._rng = jax.random.PRNGKey(0)
        # per-t stats tables aligned to the program's start points
        self._stats: Dict[str, Dict[int, tuple]] = {}
        counts = val_stats.groupby("t")["mse"].count()
        thin = [int(t) for t, n in counts.items() if n < 2]
        if thin:
            # a single validation row makes the sample std (ddof=1) NaN, which
            # would turn EVERY response into NaN z-scores with HTTP 200
            raise ValueError(
                f"results_val.csv has fewer than 2 rows for t_start(s) {thin} "
                "— per-t z-score std is undefined; reconstruct a larger "
                "validation set"
            )
        # the likelihood column is served too when BOTH the program emits it
        # and the validation CSV carries it (reconstruct.py --score_elbo=1)
        self.serve_elbo = bool(getattr(program, "score_elbo", False)) and (
            "elbo" in val_stats.columns
        )
        self.serve_ssim = bool(getattr(program, "score_ssim", False)) and (
            "ssim_distance" in val_stats.columns
        )
        targets = (
            ("mse", "perceptual_difference")
            + (("elbo",) if self.serve_elbo else ())
            + (("ssim_distance",) if self.serve_ssim else ())
        )
        for target in targets:
            agg = val_stats.groupby("t")[target].agg(["mean", "std"])
            self._stats[target] = {
                int(t): (float(r["mean"]), float(r["std"]) + 1e-12)
                for t, r in agg.iterrows()
            }
        missing = [
            int(t) for t in program.t_starts if int(t) not in self._stats["mse"]
        ]
        if missing:
            raise ValueError(
                f"results_val.csv lacks stats for start points {missing} — "
                "the service must use the same num_inference_steps / "
                "inference_skip_factor as the validation reconstruction run"
            )
        # optional decision operating point: with flag_fpr in (0, 1), each
        # response carries is_ood / ood_flags, thresholded at the
        # (1 - flag_fpr) quantile of the VALIDATION images' own per-image
        # mean-z distribution (the same statistic ood_detection.py AUROCs).
        # The validation set is in-distribution by construction, so the
        # quantile is a direct FPR target; precision depends on having
        # enough distinct validation images (quantiles of a handful of
        # values are coarse — the threshold table is served at /statz for
        # inspection).
        self.flag_fpr = float(flag_fpr)
        self.z_thresholds: Dict[str, float] = {}
        if self.flag_fpr != 0.0:
            if not 0.0 < self.flag_fpr < 1.0:
                raise ValueError(f"flag_fpr must be in (0, 1), got {flag_fpr}")
            # restrict to the program's own start points: served scores are
            # means over exactly these t, so extra validation t rows (e.g. a
            # CSV from a finer grid) must not skew the operating point
            served_t = {int(t) for t in program.t_starts}
            rows = val_stats[val_stats["t"].astype(int).isin(served_t)]
            for target in targets:
                mu = rows["t"].map(
                    {t: v[0] for t, v in self._stats[target].items()}
                )
                sd = rows["t"].map(
                    {t: v[1] for t, v in self._stats[target].items()}
                )
                z = (rows[target] - mu) / sd
                per_image = z.groupby(rows["filename"]).mean()
                self.z_thresholds[target] = float(
                    np.quantile(per_image.to_numpy(), 1.0 - self.flag_fpr)
                )
        # request-size ceiling: the compiled batch of f64 images at a generous
        # 64 MiB/image, plus npy header slack — anything larger cannot be a
        # legitimate request and must not be buffered into host memory
        self.max_body_bytes = self.batch_size * 64 * 1024 * 1024 + 1024 * 1024
        # ops counters, served at GET /statz (sweeps/images here; request
        # count is tallied at the HTTP layer so batched coalescing is visible)
        self.stats: Dict[str, float] = {
            "requests": 0, "images": 0, "sweeps": 0, "device_seconds": 0.0,
            "reloads": 0, "z_mse_sum": 0.0,
        }
        # drift indicator state: a ring buffer of the last `drift_window`
        # served images' z_score_mse. A lifetime mean cannot show a recent
        # shift once the counter is large; the windowed mean forgets old
        # traffic at exactly the window size (tested in test_serve.py)
        if drift_window < 1:
            raise ValueError(f"drift_window must be >= 1, got {drift_window}")
        self.drift_window = int(drift_window)
        self._drift_ring: "collections.deque[float]" = collections.deque(
            maxlen=self.drift_window
        )

    def reload(self) -> str:
        """Swap in freshly-read checkpoint weights without dropping requests:
        the swap holds the sweep lock, and compiled programs are reused as-is
        (params are traced arguments, not baked into the HLO)."""
        if self.reload_fn is None:
            raise RuntimeError("service was started without a reload hook")
        with self._lock:
            desc = self.reload_fn()
            self.stats["reloads"] += 1
        return str(desc)

    @classmethod
    def from_val_csv(cls, program, val_csv: str | Path, batch_size: int,
                     model_name: str = "model", shard_fn=None) -> "ScoringService":
        df = dedup(pd.read_csv(val_csv))
        return cls(program, df, batch_size, model_name, shard_fn=shard_fn)

    def score(self, images: np.ndarray) -> list:
        """images: (B, *spatial, C) floats in [0, 1], B <= batch_size.
        Returns one dict per image: z_score_mse / z_score_perceptual (mean
        over start points, the reference's per-image aggregation) + the raw
        per-t values."""
        images = np.asarray(images, np.float32)
        b = images.shape[0]
        if b == 0:
            return []
        if b > self.batch_size:
            raise ValueError(f"batch {b} > service batch_size {self.batch_size}")
        pad = np.take(images, np.arange(self.batch_size) % b, axis=0)
        if self.shard_fn is not None:
            pad = self.shard_fn(pad)
        with self._lock:
            import time as _time

            t0 = _time.perf_counter()
            self._rng, sub = jax.random.split(self._rng)
            # [:3] tolerates a score_elbo-enabled program whose val CSV
            # predates the elbo column (serve_elbo False)
            prog_out = self.program(pad, sub)
            t_starts, mse, perc = prog_out[:3]
            self.stats["sweeps"] += 1
            self.stats["images"] += b
            self.stats["device_seconds"] += _time.perf_counter() - t0
        mse = np.asarray(mse)[:, :b]          # (K, B)
        perc = np.asarray(perc)[:, :b]
        # extras ride after (mse, perc, preview) in program-flag order —
        # elbo first, then ssim (recon/sweep.py __call__); index by what the
        # PROGRAM emits, serve only what the val CSV can normalize
        idx = 3
        elbo = ssim = None
        if getattr(self.program, "score_elbo", False):
            if self.serve_elbo:
                elbo = np.asarray(prog_out[idx])[:, :b]
            idx += 1
        if getattr(self.program, "score_ssim", False) and self.serve_ssim:
            ssim = np.asarray(prog_out[idx])[:, :b]
        out = []
        for i in range(b):
            rec: Dict[str, object] = {"per_t": {}}
            zs = {"mse": [], "perceptual_difference": [], "elbo": [],
                  "ssim_distance": []}
            for k, t in enumerate(int(t) for t in t_starts):
                m_mu, m_sd = self._stats["mse"][t]
                p_mu, p_sd = self._stats["perceptual_difference"][t]
                zs["mse"].append((float(mse[k, i]) - m_mu) / m_sd)
                zs["perceptual_difference"].append(
                    (float(perc[k, i]) - p_mu) / p_sd
                )
                rec["per_t"][t] = {
                    "mse": float(mse[k, i]),
                    "perceptual_difference": float(perc[k, i]),
                }
                if elbo is not None:
                    e_mu, e_sd = self._stats["elbo"][t]
                    zs["elbo"].append((float(elbo[k, i]) - e_mu) / e_sd)
                    rec["per_t"][t]["elbo"] = float(elbo[k, i])
                if ssim is not None:
                    s_mu, s_sd = self._stats["ssim_distance"][t]
                    zs["ssim_distance"].append((float(ssim[k, i]) - s_mu) / s_sd)
                    rec["per_t"][t]["ssim_distance"] = float(ssim[k, i])
            rec["z_score_mse"] = float(np.mean(zs["mse"]))
            rec["z_score_perceptual"] = float(np.mean(zs["perceptual_difference"]))
            if elbo is not None:
                rec["z_score_elbo"] = float(np.mean(zs["elbo"]))
            if ssim is not None:
                rec["z_score_ssim"] = float(np.mean(zs["ssim_distance"]))
            if self.z_thresholds:
                # decision at the validation-calibrated operating point;
                # is_ood follows the reference's headline statistic (mse,
                # ood_detection.py:73), ood_flags carries every served target
                flags = {
                    "mse": rec["z_score_mse"] > self.z_thresholds["mse"],
                    "perceptual_difference": rec["z_score_perceptual"]
                    > self.z_thresholds["perceptual_difference"],
                }
                if elbo is not None and "elbo" in self.z_thresholds:
                    flags["elbo"] = rec["z_score_elbo"] > self.z_thresholds["elbo"]
                if ssim is not None and "ssim_distance" in self.z_thresholds:
                    flags["ssim_distance"] = (
                        rec["z_score_ssim"] > self.z_thresholds["ssim_distance"]
                    )
                rec["ood_flags"] = {k: bool(v) for k, v in flags.items()}
                rec["is_ood"] = bool(flags["mse"])
            out.append(rec)
        # drift indicator: served-traffic mean z_score_mse should hover near
        # the validation distribution's (~0); a sustained climb means the
        # input distribution is shifting — exposed at GET /statz both as a
        # windowed mean (last drift_window images; reacts to recent shifts)
        # and a lifetime mean (kept for continuity)
        with self._lock:
            self.stats["z_mse_sum"] += float(
                sum(r["z_score_mse"] for r in out)
            )
            self._drift_ring.extend(float(r["z_score_mse"]) for r in out)
        return out


class BatchingScoringService:
    """Dynamic request batching over a ScoringService.

    Concurrent `score()` calls are coalesced into ONE device sweep: the first
    arrival opens a window of `batch_window_ms`, and every request queued by
    its close (up to the compiled batch) rides the same program invocation.
    The sweep's cost is batch-size-invariant up to the compiled batch (the
    tail is wrap-padded anyway), so under a load of single-image requests this
    multiplies serving throughput by up to `batch_size` — at the price of at
    most one window of added latency for a lone caller.

    Per-image scores are identical to unbatched scoring given the same noise:
    the sweep's metrics are independent per image (recon/sweep.py computes
    per-(lane, image) scalars), verified in tests/test_serve.py.

    Delegates everything else (stats, caps, metadata) to the wrapped service.
    """

    def __init__(self, service: ScoringService, batch_window_ms: float = 5.0):
        import collections
        import time as _time

        self.inner = service
        self.batch_window_ms = float(batch_window_ms)
        self._time = _time
        self._queue = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def __getattr__(self, name):  # model_name, batch_size, program, caps, ...
        return getattr(self.inner, name)

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=10)

    def score(self, images: np.ndarray) -> list:
        images = np.asarray(images, np.float32)
        b = images.shape[0]
        if b == 0:
            return []
        if b > self.inner.batch_size:
            raise ValueError(
                f"batch {b} > service batch_size {self.inner.batch_size}"
            )
        req = {"images": images, "event": threading.Event(),
               "result": None, "error": None}
        with self._cv:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.append(req)
            self._cv.notify()
        req["event"].wait()
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                batch = [self._queue.popleft()]
                total = batch[0]["images"].shape[0]
                # window opens at the FIRST dequeued request
                deadline = self._time.monotonic() + self.batch_window_ms / 1e3
                while total < self.inner.batch_size:
                    if not self._queue:
                        remaining = deadline - self._time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(remaining)
                        continue  # re-check queue/deadline after any wake
                    n = self._queue[0]["images"].shape[0]
                    if total + n > self.inner.batch_size:
                        break  # leave for the next sweep
                    batch.append(self._queue.popleft())
                    total += n
            try:
                stacked = np.concatenate([r["images"] for r in batch], axis=0)
                results = self.inner.score(stacked)
                off = 0
                for r in batch:
                    n = r["images"].shape[0]
                    r["result"] = results[off : off + n]
                    off += n
            except Exception as e:  # propagate to every waiting caller
                for r in batch:
                    r["error"] = e
            finally:
                for r in batch:
                    r["event"].set()


def collect_stats(service: ScoringService) -> Dict[str, object]:
    """The /statz payload: ops counters + derived rates + drift indicators."""
    s = dict(service.stats)
    sweeps = max(int(s["sweeps"]), 1)
    s["mean_sweep_seconds"] = s["device_seconds"] / sweeps
    s["coalescing_ratio"] = s["requests"] / sweeps if s["requests"] else 0.0
    # drift: windowed mean z over the LAST drift_window served images
    # (validation-calibrated traffic hovers near 0; a climb = recent input
    # shift). The lifetime mean is kept for continuity but goes inert once
    # `images` is large.
    ring = list(service._drift_ring)
    s["mean_served_z_mse"] = sum(ring) / len(ring) if ring else 0.0
    s["drift_window"] = service.drift_window
    s["drift_window_filled"] = len(ring)
    s["lifetime_mean_z_mse"] = (
        s.pop("z_mse_sum") / s["images"] if s["images"] else 0.0
    )
    thr = getattr(service, "z_thresholds", None)
    if thr:
        s["flag_fpr"] = service.flag_fpr
        s["z_thresholds"] = thr
    return s


# (metric name, /statz key, prometheus type) for the scrape endpoint
_PROM_METRICS = (
    ("ddpm_ood_requests_total", "requests", "counter"),
    ("ddpm_ood_images_total", "images", "counter"),
    ("ddpm_ood_sweeps_total", "sweeps", "counter"),
    ("ddpm_ood_reloads_total", "reloads", "counter"),
    ("ddpm_ood_device_seconds_total", "device_seconds", "counter"),
    ("ddpm_ood_mean_sweep_seconds", "mean_sweep_seconds", "gauge"),
    ("ddpm_ood_coalescing_ratio", "coalescing_ratio", "gauge"),
    ("ddpm_ood_mean_served_z_mse", "mean_served_z_mse", "gauge"),
    ("ddpm_ood_drift_window_filled", "drift_window_filled", "gauge"),
    ("ddpm_ood_lifetime_mean_z_mse", "lifetime_mean_z_mse", "gauge"),
)


def prometheus_text(service: ScoringService) -> str:
    """GET /metricz: the same stats in Prometheus exposition format (text/plain
    0.0.4) so a scraper needs no JSON glue. Framework extension — the
    reference has no serving at all."""
    s = collect_stats(service)
    lines = []
    for name, key, kind in _PROM_METRICS:
        lines.append(f"# TYPE {name} {kind}")
        lines.append(f"{name} {float(s[key]):g}")
    for target, value in (s.get("z_thresholds") or {}).items():
        name = "ddpm_ood_z_threshold"
        if not any(line.startswith(f"# TYPE {name} ") for line in lines):
            lines.append(f"# TYPE {name} gauge")
        lines.append(f'{name}{{target="{target}"}} {float(value):g}')
    return "\n".join(lines) + "\n"


def make_handler(service: ScoringService, auth_token: Optional[str] = None):
    """auth_token: when set, every endpoint except GET /healthz (left open
    for load-balancer probes) requires `Authorization: Bearer <token>`;
    compared constant-time. The service listens on 0.0.0.0 by default —
    set a token anywhere the network is not already trusted."""

    class OODRequestHandler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self) -> bool:
            if auth_token is None or self.path == "/healthz":
                return True
            header = self.headers.get("Authorization", "")
            supplied = header[len("Bearer "):] if header.startswith("Bearer ") else ""
            if hmac.compare_digest(supplied, auth_token):
                return True
            self._json(401, {"error": "missing or invalid bearer token"})
            return False

        def do_GET(self):
            if not self._authorized():
                return
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "model": service.model_name,
                    "batch_size": service.batch_size,
                    "t_starts": [int(t) for t in service.program.t_starts],
                })
            elif self.path == "/statz":
                self._json(200, collect_stats(service))
            elif self.path == "/metricz":
                body = prometheus_text(service).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if not self._authorized():
                return
            if self.path == "/reload":
                try:
                    self._json(200, {"reloaded_from": service.reload()})
                except RuntimeError as e:
                    self._json(409, {"error": str(e)})
                except FileNotFoundError as e:
                    self._json(404, {"error": str(e)})
                except Exception as e:
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/score":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            service.stats["requests"] += 1
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > service.max_body_bytes:
                    self._json(413, {
                        "error": f"request body {n} bytes exceeds cap "
                        f"{service.max_body_bytes} (batch_size "
                        f"{service.batch_size})"
                    })
                    return
                arr = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                self._json(200, {"scores": service.score(arr)})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # malformed body etc.
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return OODRequestHandler


class _OODHTTPServer(ThreadingHTTPServer):
    # the socketserver default accept backlog is 5: a burst of concurrent
    # single-image clients (the dynamic-batching pattern,
    # BatchingScoringService) overflows it and the overflowed clients see
    # ConnectionResetError instead of queueing (observed at 32 concurrent
    # connects, scripts/bench_serve.py --batch_window_ms). Deep listen
    # backlog costs nothing; the sweep lock is the real throttle.
    request_queue_size = 128


def make_server(
    service: ScoringService,
    host: str = "0.0.0.0",
    port: int = 8700,
    auth_token: Optional[str] = None,
) -> ThreadingHTTPServer:
    """The serving HTTP server (burst-safe accept backlog), not yet running."""
    return _OODHTTPServer((host, port), make_handler(service, auth_token))


def serve_forever(
    service: ScoringService,
    host: str = "0.0.0.0",
    port: int = 8700,
    auth_token: Optional[str] = None,
):
    """Run the HTTP server until SIGTERM/SIGINT; in-flight sweeps finish.

    SIGTERM (the normal orchestrator stop signal) triggers a graceful
    shutdown: the listener stops accepting, handler threads complete their
    current request (the sweep lock is never abandoned mid-flight), and the
    process exits 0 — so rolling restarts never cut a response mid-body.
    """
    import signal

    server = make_server(service, host, port, auth_token)
    print(f"serving OOD scores for {service.model_name} on {host}:{server.server_port}")

    def _graceful(signum, frame):
        print(f"signal {signum}: draining in-flight requests and shutting down")
        # shutdown() must not be called from the serve_forever thread itself
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _graceful)
        signal.signal(signal.SIGINT, _graceful)
    except ValueError:
        pass  # not the main thread (tests drive the server directly)
    server.serve_forever()
    server.server_close()
