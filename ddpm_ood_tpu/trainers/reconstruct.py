"""Reconstruction pipeline: the OOD inference workload, batched on device.

Capability parity with the reference Reconstruct (src/trainers/reconstruct.py):
requires a found checkpoint (:31-32), builds val/in loaders `only_val=True`
(:38-70), sweeps every start timestep with a PLMS denoise, decodes, and writes
per-(image, t_start) rows {filename, type, t, perceptual_difference, mse} into
`ood/results_{val,in,<name>[_vflip|_hflip]}.csv` (:192-204, 252-330).

TPU-first difference: the reference's triple-nested Python loop (batch x t_start x
PLMS step, :97-157) is replaced by the batched sweep program (recon/sweep.py) —
one `lax.scan` over the PLMS grid carrying ALL t_start lanes, with the UNet
evaluated once per step on the flattened lane*batch mega-batch, and MSE/LPIPS
computed on device. Multi-host: each process scores its own data shard and rank-0
concatenates per-host CSV shards (replacing `all_gather_object`, :237-248; the
scorer's dedup keeps compatibility with even_divisible padding).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import List, Optional, Set

import jax
import numpy as np
import pandas as pd

from ..data.loader import get_training_data_loader
from ..losses.lpips import PerceptualLoss
from ..noise.simplex import simplex_noise_device
from ..recon.sweep import ReconProgram
from ..utils.logging import info
from .base import BaseTrainer, channels_last


def _stem(filename: str) -> str:
    return Path(filename).stem.replace(".nii", "").replace(".gz", "")


class _CsvSink:
    """Incremental, crash-safe persistence for reconstruction rows (framework
    extension). The reference buffers a full dataset pass in memory and writes
    the CSV once at the end (src/trainers/reconstruct.py:252-330) — a mid-run
    failure there loses the whole pass, which for a 3D sweep is hours of chip
    time. Here every scored batch is appended (flushed + fsynced) to a
    per-host partial CSV, so a crash loses at most the in-flight batch;
    `finalize()` publishes `results_{name}.csv` in the exact legacy format
    (rank-0 shard merge under multihost) and removes the partial.

    With `resume=True` a restart reloads the partial: images whose full
    t_start grid is already persisted are skipped (`done()`), images caught
    mid-write are rescored, and duplicates are dropped at finalize
    (keep-last)."""

    def __init__(self, out_dir, name: str, resume: bool = False):
        self.out_dir, self.name = Path(out_dir), name
        self.multi = jax.process_count() > 1
        suffix = f".shard{jax.process_index()}" if self.multi else ""
        self.partial = self.out_dir / f".results_{name}{suffix}.partial.csv"
        self.rows: List[dict] = []
        self._fh = None
        self._cols: Optional[List[str]] = None
        self._counts: dict = {}  # stem -> persisted row count
        self.resumed_rows = 0
        if resume and self.partial.exists():
            try:
                prev = pd.read_csv(self.partial)
                # a crash mid-write can leave a torn final line that still
                # parses (short row -> NaNs): drop it so the image rescores
                prev = prev.dropna()
            except Exception:  # unparseable partial — rescore from scratch
                prev = pd.DataFrame()
            if len(prev):
                self.rows = prev.to_dict("records")
                self._cols = list(prev.columns)
                self._counts = prev["filename"].value_counts().to_dict()
                self.resumed_rows = len(prev)
            else:
                # empty/corrupt partial: remove it so appends start fresh
                # (with a header) instead of extending a torn file
                self.partial.unlink()
        elif self.partial.exists():
            self.partial.unlink()  # stale partial from a non-resume run

    def done(self, filenames, k: int) -> Set[str]:
        """The subset of `filenames` already persisted with all `k` t_start
        rows by a previous (interrupted) run."""
        return {
            f for f in filenames if self._counts.get(_stem(f), 0) >= int(k)
        }

    def append(self, rows: List[dict]) -> None:
        if not rows:
            return
        self.rows.extend(rows)
        df = pd.DataFrame(rows)
        if self._fh is None:
            fresh = not (self.partial.exists() and self.partial.stat().st_size)
            self._fh = open(self.partial, "a", newline="")
            if self._cols is None:
                self._cols = list(df.columns)
            self._need_header = fresh
        df = df.reindex(columns=self._cols)
        df.to_csv(self._fh, header=self._need_header, index=False)
        self._need_header = False
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def finalize(self) -> None:
        """Publish results_{name}.csv (same on-disk format as the legacy
        single-shot write) and clean up the partial."""
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        df = pd.DataFrame(self.rows)
        if len(df) and {"filename", "type", "t"} <= set(df.columns):
            # resume may have rescored a partially-persisted image
            df = df.drop_duplicates(["filename", "type", "t"], keep="last")
            df = df.reset_index(drop=True)
        if not self.multi:
            df.to_csv(self.out_dir / f"results_{self.name}.csv")
            if self.partial.exists():
                self.partial.unlink()
            return
        shard = self.out_dir / f".results_{self.name}.shard{jax.process_index()}.csv"
        df.to_csv(shard)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"recon_write_{self.name}")
        if jax.process_index() == 0:
            shards = sorted(
                self.out_dir.glob(f".results_{self.name}.shard*.csv")
            )
            shards = [s for s in shards if not s.name.endswith(".partial.csv")]
            merged = pd.concat(
                [pd.read_csv(s, index_col=0) for s in shards],
                ignore_index=True,
            )
            merged.to_csv(self.out_dir / f"results_{self.name}.csv")
        if self.partial.exists():
            self.partial.unlink()


def _loader_example(recon, program, loader):
    """Shared precondition + example-batch derivation for the pre-loop
    compile helpers (warmup / AOT): returns the sharded example batch shaped
    exactly like the loop's batches, or None when pre-compiling does not
    apply — the program is already compiled, the run is multi-process (the
    compile-then-barrier path in __call__ owns that case), or the loader is
    a duck-typed test stand-in without a dataset."""
    dataset = getattr(loader, "dataset", None)
    if (
        program._compiled
        or jax.process_count() > 1
        or dataset is None
        or len(dataset) == 0
    ):
        return None
    item_shape = dataset[0]["image"].shape  # (C, *spatial)
    b0 = min(int(loader.batch_size), len(dataset))
    example = channels_last(np.zeros((b0,) + tuple(item_shape), dtype=np.float32))
    return recon.shard(example)


def _maybe_parallel_warmup(recon, program, loader) -> None:
    """Compile the sweep's lane-group programs concurrently before the batch
    loop (recon/sweep.py:ReconProgram.warmup). Opt-in via
    DDPM_OOD_TPU_PARALLEL_COMPILE=1 until the tunnel's remote-compile helper
    is proven thread-safe under concurrent compiles (it has returned HTTP 500
    under load before — docs/DESIGN.md)."""
    import os

    if os.environ.get("DDPM_OOD_TPU_PARALLEL_COMPILE", "") != "1":
        return
    example = _loader_example(recon, program, loader)
    if example is None:
        return
    secs = program.warmup(example)
    info(
        f"parallel-compiled {len(program._compiled)} sweep group "
        f"programs in {secs:.1f}s"
    )


def _maybe_aot(recon, program, loader, inference_skip_factor: int) -> None:
    """--aot_cache: load the sweep's compiled lane-group executables from an
    AOT artifact (zero tracing/compiles — recon/aot.py), or compile once and
    save them. One artifact per (sampler, steps, skip, batch) geometry under
    the prefix; a stale artifact (changed config / jax upgrade) is
    recompiled and overwritten, never fatal (aot.load_or_save)."""
    import os
    import time

    args = getattr(recon, "args", None)
    prefix = getattr(args, "aot_cache", None)
    if not prefix or program.sampler == "plms_ref":
        return
    example = _loader_example(recon, program, loader)
    if example is None:
        return
    from ..recon.aot import artifact_path, load_or_save

    path = artifact_path(
        prefix, program.sampler, program.num_inference_steps,
        inference_skip_factor, example.shape[0],
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    t0 = time.perf_counter()
    meta = load_or_save(
        program, path, example,
        # quantization is baked into the UNet's traced code but invisible to
        # the program object — pin it or artifacts would cross modes silently
        extra_fingerprint={"quantize": getattr(args, "quantize", "none")},
    )
    info(
        f"aot: {meta['action']} — {len(program._compiled)} compiled sweep "
        f"groups in {time.perf_counter() - t0:.1f}s ({path})"
    )


class Reconstruct(BaseTrainer):
    def __init__(self, args):
        # fail fast BEFORE device/model init: reconstruction without a trained
        # checkpoint is always an error (reference reconstruct.py:31-32)
        from pathlib import Path as _P

        from ..utils.checkpoint import find_checkpoint

        resume_epoch = getattr(args, "ddpm_checkpoint_epoch", None)
        pre = find_checkpoint(
            _P(args.output_dir) / args.model_name,
            int(resume_epoch) if resume_epoch else None,
        )
        if pre is None:
            raise FileNotFoundError("Failed to find a saved model checkpoint.")
        super().__init__(args)
        if not self.found_checkpoint:
            raise FileNotFoundError("Failed to find a saved model checkpoint.")
        self.out_dir = self.run_dir / "ood"
        self.out_dir.mkdir(exist_ok=True)
        self.args = args

        def make_loader(ids, first_n, **kw):
            return get_training_data_loader(
                batch_size=args.batch_size,
                training_ids=ids,
                validation_ids=ids,
                augmentation=bool(args.augmentation),
                only_val=True,
                num_workers=args.num_workers,
                num_val_workers=args.num_workers,
                cache_data=bool(args.cache_data),
                drop_last=bool(getattr(args, "drop_last", 0)),
                first_n=int(first_n) if first_n else first_n,
                is_grayscale=bool(args.is_grayscale),
                spatial_dimension=args.spatial_dimension,
                image_size=self.image_size,
                image_roi=self.image_roi,
                num_processes=jax.process_count(),
                process_index=jax.process_index(),
                **kw,
            )

        self._make_loader = make_loader
        self.val_loader = make_loader(args.validation_ids, args.first_n_val)
        self.in_loader = make_loader(args.in_ids, args.first_n)
        self._perceptual: Optional[PerceptualLoss] = None
        self._programs = {}
        if self.simplex_noise:
            from ..noise.simplex import Simplex

            self.simplex = Simplex()

    # ---------------------------------------------------------------- scoring --
    def _perceptual_fn(self):
        if self._perceptual is None:
            self._perceptual = PerceptualLoss(
                dimensions=self.spatial_dimension,
                is_fake_3d=self.spatial_dimension == 3,
                lpips_normalize=True,
            )
        return self._perceptual

    def _program(self, skip_factor: int) -> ReconProgram:
        if skip_factor not in self._programs:
            # shared assembly with the serving surface (serve.py) so offline
            # scoring and the long-lived service cannot diverge
            from ..serve import build_recon_program

            host_fn = dev_fn = None
            if self.simplex_noise:
                mode = getattr(self.args, "simplex_noise_mode", "exact")
                from ..noise import _native

                if mode == "exact" and _native.available():
                    host_fn = self._host_simplex_noise
                else:
                    if mode == "exact":
                        info(
                            "native OpenSimplex kernel unavailable (no g++?) — "
                            "falling back to on-device statistical simplex noise"
                        )
                    dev_fn = self._sweep_simplex
            self._programs[skip_factor] = build_recon_program(
                self,
                self.args,
                perceptual_fn=self._perceptual_fn(),
                simplex_noise_fn=dev_fn,
                host_noise_fn=host_fn,
                skip_factor=skip_factor,
            )
        return self._programs[skip_factor]

    def _host_simplex_noise(self, shape, t_starts) -> np.ndarray:
        """Bit-exact scoring-time noise: one freshly-seeded fixed-T C++
        OpenSimplex plane per (lane, item, channel), exactly the reference's
        draw order (reconstruct.py:130-142 -> simplex_noise.py:15-79: t_start
        lanes outermost, then channel, then batch item)."""
        from ..noise.simplex import generate_simplex_noise

        K, B = int(shape[0]), int(shape[1])
        out = np.empty(shape, dtype=np.float32)
        for k, t in enumerate(np.asarray(t_starts)):
            out[k] = generate_simplex_noise(
                self.simplex, shape[1:], np.full((B,), int(t), dtype=np.int64)
            )
        return out

    def _sweep_simplex(self, rng, shape, t_starts):
        """(K, B, *spatial, C) structured noise, one fixed-T plane set per lane."""
        import jax.numpy as jnp

        K = shape[0]
        keys = jax.random.split(rng, K)
        return jax.vmap(
            lambda k, t: simplex_noise_device(
                k, shape[1:], jnp.full((shape[1],), t, dtype=jnp.int32)
            )
        )(keys, t_starts)

    def get_scores(self, loader, dataset_name: str, inference_skip_factor: int,
                   save_name: Optional[str] = None,
                   sink: Optional[_CsvSink] = None) -> List[dict]:
        """`save_name` names per-dataset artifacts (error maps) when several
        datasets share dataset_name='out'; defaults to dataset_name.
        `sink` (optional) receives every batch's rows as soon as they are
        scored (crash-safe incremental persistence) and, when it carries
        resumed rows, lets fully-persisted batches be skipped."""
        save_name = save_name or dataset_name
        info(f"{jax.process_index()}: {dataset_name}")
        program = self._program(inference_skip_factor)
        _maybe_aot(self, program, loader, inference_skip_factor)
        _maybe_parallel_warmup(self, program, loader)
        rng = jax.random.PRNGKey(777 + jax.process_index())
        results: List[dict] = []
        n_skipped = 0
        preview_saved = False
        compiled_b: Optional[int] = None
        profile_dir = getattr(getattr(self, "args", None), "profile_dir", None)
        n_t_starts = len(program.t_starts)
        # fault injection for the crash-safety contract (tests/test_recon_resume.py):
        # SIGKILL the process after N batches have been scored AND flushed
        crash_after = os.environ.get("DDPM_OOD_TPU_CRASH_AFTER_BATCHES")
        for batch_idx, batch in enumerate(loader):
            if sink is not None and sink.resumed_rows:
                # rng advances for SKIPPED batches too, so the non-skipped
                # remainder scores with the same noise a crash-free run uses
                done = sink.done(batch["filename"], n_t_starts)
                if len(done) == len(batch["filename"]):
                    rng, _ = jax.random.split(rng)
                    n_skipped += len(done)
                    continue
            # trace ONE warm batch (the second: batch 0 pays the compiles) —
            # the sweep-side counterpart of the trainer's --profile_dir hook
            profiling = bool(
                profile_dir and batch_idx == 1 and not getattr(self, "_profiled", False)
            )
            if profiling:
                jax.profiler.start_trace(profile_dir)
            t1 = time.time()
            images = channels_last(batch["image"])
            b = images.shape[0]
            # wrap-pad ragged (final) batches up to the first batch's compiled
            # size and slice the metrics back — a size-b tail would otherwise
            # recompile every group program for one batch (same pattern as the
            # serving path, serve.py ScoringService.score); duplicated rows are
            # never emitted because only [:b] is read back
            if compiled_b is None:
                compiled_b = b
            if b < compiled_b:
                images = np.take(images, np.arange(compiled_b) % b, axis=0)
            rng, sub = jax.random.split(rng)
            out = program(self.shard(images), sub)
            t_starts, mse, perc = out[:3]
            idx = 3
            elbo = None
            if program.score_elbo:
                elbo = np.asarray(out[idx])
                idx += 1
            ssim_d = np.asarray(out[idx]) if program.score_ssim else None
            err_maps = (
                np.asarray(program.last_error_maps)  # (B_global, *spatial, C)
                if program.score_error_maps
                else None
            )
            mse = np.asarray(mse)  # (K, B_global) — replicated under multihost
            perc = np.asarray(perc)
            if profiling:
                jax.profiler.stop_trace()  # np.asarray above already synced
                self._profiled = True
                info(f"Wrote device trace of one sweep batch to {profile_dir}")
            if jax.process_count() > 1:
                # the global batch concatenates per-process shards in process
                # order (parallel/mesh.py shard_batch); pick out OUR columns,
                # whose filenames this process's loader shard holds
                per_proc = mse.shape[1] // jax.process_count()
                off = jax.process_index() * per_proc
                mse = mse[:, off : off + b]
                perc = perc[:, off : off + b]
                if elbo is not None:
                    elbo = elbo[:, off : off + b]
                if ssim_d is not None:
                    ssim_d = ssim_d[:, off : off + b]
                if err_maps is not None:
                    err_maps = err_maps[off : off + b]
            else:
                mse = mse[:, :b]
                perc = perc[:, :b]
                if elbo is not None:
                    elbo = elbo[:, :b]
                if ssim_d is not None:
                    ssim_d = ssim_d[:, :b]
                if err_maps is not None:
                    err_maps = err_maps[:b]
            if err_maps is not None:
                self._save_error_maps(err_maps, batch["filename"], save_name)
            batch_rows: List[dict] = []
            for k, t_start in enumerate(t_starts):
                for b, filename in enumerate(batch["filename"]):
                    row = {
                        "filename": _stem(filename),
                        "type": dataset_name,
                        "t": int(t_start),
                        "perceptual_difference": float(perc[k, b]),
                        "mse": float(mse[k, b]),
                    }
                    if elbo is not None:
                        row["elbo"] = float(elbo[k, b])
                    if ssim_d is not None:
                        row["ssim_distance"] = float(ssim_d[k, b])
                    batch_rows.append(row)
            results.extend(batch_rows)
            if sink is not None:
                sink.append(batch_rows)
                if crash_after and (batch_idx + 1) >= int(crash_after):
                    import signal

                    info(f"fault injection: SIGKILL after batch {batch_idx}")
                    os.kill(os.getpid(), signal.SIGKILL)
            t2 = time.time()
            info(
                f"Took {t2 - t1:.2f}s for a batch size of {images.shape[0]} "
                f"({len(t_starts) * images.shape[0] / (t2 - t1):.1f} recons/s)"
            )
            if not preview_saved and jax.process_index() == 0:
                # unique name per get_scores call (several out-datasets all carry
                # dataset_name="out")
                idx = self._preview_counter = getattr(self, "_preview_counter", 0) + 1
                tag = dataset_name if dataset_name in ("val", "in") else (
                    f"{dataset_name}_{idx}"
                )
                self._save_preview(images, np.asarray(program.last_preview), tag)
                preview_saved = True
        if n_skipped:
            info(
                f"resume: skipped {n_skipped} already-scored images for "
                f"'{dataset_name}' (rows persisted by the interrupted run)"
            )
        return results

    def _save_error_maps(self, maps: np.ndarray, filenames, dataset_name: str
                         ) -> None:
        """Persist per-image anomaly-localization heatmaps (--save_error_maps):
        the per-pixel squared reconstruction error, mean over every start point
        (recon/sweep.py score_error_maps). One `<stem>.npy` per image (full
        spatial map, channels-last) plus a `<stem>.png` render — the map itself
        for 2D, the middle axial slice for 3D volumes. Framework extension: the
        reference reduces to per-image scalars only (reconstruct.py:188-191),
        so WHERE an input is anomalous is invisible there."""
        out = self.out_dir / "error_maps" / dataset_name
        out.mkdir(parents=True, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for i, filename in enumerate(filenames):
            stem = _stem(filename)
            m = np.asarray(maps[i])
            np.save(out / f"{stem}.npy", m)
            img = m.mean(axis=-1)  # collapse channels for rendering
            if img.ndim == 3:  # 3D volume: middle slice
                img = img[img.shape[0] // 2]
            fig, ax = plt.subplots(figsize=(2, 2))
            im = ax.imshow(img, cmap="magma")
            ax.axis("off")
            fig.colorbar(im, ax=ax, fraction=0.046)
            fig.savefig(out / f"{stem}.png", dpi=100, bbox_inches="tight")
            plt.close(fig)

    def _save_preview(self, images: np.ndarray, recon: np.ndarray,
                      dataset_name: str) -> None:
        """Original-vs-reconstruction grid for the first batch (the reference
        renders per-batch previews when not distributed, reconstruct.py:206-231)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = min(len(recon), len(images), 8)
        if n == 0:
            return
        fig, axes = plt.subplots(n, 2, figsize=(2, n), squeeze=False)
        for i in range(n):
            for j, arr in enumerate((images, recon)):
                img = np.clip(np.asarray(arr[i]), 0, 1)
                if img.ndim == 4:  # 3D volume: middle slice
                    img = img[img.shape[0] // 2]
                axes[i][j].imshow(
                    img.squeeze(-1) if img.shape[-1] == 1 else img,
                    cmap="gray" if img.shape[-1] == 1 else None,
                )
                axes[i][j].axis("off")
        fig.savefig(self.out_dir / f"preview_{dataset_name}.png", dpi=100,
                    bbox_inches="tight")
        plt.close(fig)

    def _write(self, results: List[dict], name: str) -> None:
        """Per-host shard CSVs merged by rank 0 (replaces all_gather_object)."""
        df = pd.DataFrame(results)
        if jax.process_count() == 1:
            df.to_csv(self.out_dir / f"results_{name}.csv")
            return
        shard_path = self.out_dir / f".results_{name}.shard{jax.process_index()}.csv"
        df.to_csv(shard_path)
        # barrier so every shard is on disk before rank 0 merges
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"recon_write_{name}")
        if jax.process_index() == 0:
            shards = sorted(self.out_dir.glob(f".results_{name}.shard*.csv"))
            merged = pd.concat([pd.read_csv(s, index_col=0) for s in shards],
                               ignore_index=True)
            merged.to_csv(self.out_dir / f"results_{name}.csv")

    # ------------------------------------------------------------------- main --
    def _run_scored(self, loader, dataset_name: str, csv_name: str,
                    args, **kw) -> None:
        """One dataset pass with crash-safe incremental persistence: rows
        stream into a per-host partial CSV as each batch completes, and
        `--resume=1` skips images already persisted by an interrupted run."""
        sink = _CsvSink(self.out_dir, csv_name,
                        resume=bool(getattr(args, "resume", 0)))
        if sink.resumed_rows:
            info(
                f"resume: reloaded {sink.resumed_rows} rows for '{csv_name}' "
                f"from {sink.partial.name}"
            )
        self.get_scores(loader, dataset_name, args.inference_skip_factor,
                        sink=sink, **kw)
        sink.finalize()

    def reconstruct(self, args) -> None:
        if bool(args.run_val):
            self._run_scored(self.val_loader, "val", "val", args)
        if bool(args.run_in):
            self._run_scored(self.in_loader, "in", "in", args)
        if bool(args.run_out):
            for out in args.out_ids.split(","):
                info(out)
                flip_kw = {}
                if "vflip" in out:
                    out = out.replace("_vflip", "")
                    flip_kw["add_vflip"] = True
                    dataset_name = Path(out).stem.split("_")[0] + "_vflip"
                elif "hflip" in out:
                    out = out.replace("_hflip", "")
                    flip_kw["add_hflip"] = True
                    dataset_name = Path(out).stem.split("_")[0] + "_hflip"
                else:
                    dataset_name = Path(out).stem.split("_")[0]
                out_loader = self._make_loader(out, args.first_n, **flip_kw)
                self._run_scored(out_loader, "out", dataset_name, args,
                                 save_name=dataset_name)
