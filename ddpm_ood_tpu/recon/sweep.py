"""Batched multi-t_start reconstruction sweep — the framework's performance core.

The reference reconstructs each test batch sequentially: a Python loop over ~25-100
start timesteps, each with an inner PLMS loop of UNet calls
(src/trainers/reconstruct.py:128-157). Here the ENTIRE sweep is one device program:

  - all K start-points ("lanes") are carried through a single `lax.scan` over the
    descending PLMS timestep grid; a lane becomes active once the scan reaches its
    t_start (`t <= t_start`), exactly reproducing the reference's
    `pndm_timesteps[pndm_timesteps <= t_start]` suffix per lane;
  - every scan step evaluates the UNet ONCE on the flattened (K*B) mega-batch — the
    MXU sees one large batched conv/attention workload instead of K*B small ones;
  - per-lane PLMS state (epsilon ring buffer, warm-up counter) is vmapped pytree
    state with masked updates (diffusion/plms.py), so variable-length trajectories
    share one static-shape scan;
  - lane grouping (`num_groups`>1) sorts start-points into contiguous groups and
    trims each group's scan to the suffix it actually needs, cutting the ~2x masked
    overhead of the single-scan version (at the cost of one compile per group shape);
  - decode (VQ-VAE stage-2), un-padding, /b_scale, clamp, MSE and LPIPS scoring all
    run inside the same jit (reference lines 159-191), so per-(image, t_start) scalar
    metrics are the only host transfer.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.plms import (
    PLMSState,
    plms_init_state,
    plms_step,
    pndm_start_points,
    pndm_timesteps,
)
from ..diffusion.schedules import NoiseSchedule, add_noise
from ..utils.padding import pad_torch_style, unpad_torch_style

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def plms_sweep(
    sched: NoiseSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps_desc: jnp.ndarray,
    t_starts: jnp.ndarray,
    num_inference_steps: int,
    b_scale: float = 1.0,
) -> jnp.ndarray:
    """Denoise `x0` from K start points in one scan.

    x0: (B, *spatial, C) clean latents/images; noise: (K, B, *spatial, C) fresh
    noise per lane (reference draws new noise per t_start,
    src/trainers/reconstruct.py:130-142); t_starts: (K,) int32 ascending.
    Returns (K, B, *spatial, C) reconstructions (still latent-space, b_scaled).
    """
    K = t_starts.shape[0]
    B = x0.shape[0]
    sample_shape = x0.shape
    step_ratio = sched.num_train_timesteps // num_inference_steps

    x_start = jax.vmap(lambda n, t: add_noise(sched, x0 * b_scale, n, t))(
        noise, t_starts
    )  # (K, B, ...)
    state = jax.vmap(plms_init_state)(x_start)

    def body(state: PLMSState, t):
        x_flat = state.x.reshape((K * B,) + sample_shape[1:])
        t_flat = jnp.full((K * B,), t, dtype=jnp.int32)
        out = model_fn(x_flat, t_flat).reshape((K, B) + sample_shape[1:])
        active = t <= t_starts  # (K,) — lane joins once the grid reaches its start
        state = jax.vmap(
            lambda s, o, a: plms_step(sched, s, o, t, step_ratio, active=a)
        )(state, out, active)
        return state, None

    state, _ = jax.lax.scan(body, state, timesteps_desc)
    return state.x


def ddim_sweep(
    sched: NoiseSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps_desc: jnp.ndarray,
    t_starts: jnp.ndarray,
    num_inference_steps: int,
    b_scale: float = 1.0,
    eta: float = 0.0,
) -> jnp.ndarray:
    """DDIM variant of the multi-lane sweep (state carry is just x — no epsilon
    history), same lane-masking contract as plms_sweep."""
    from ..diffusion.ddim import ddim_step

    K = t_starts.shape[0]
    B = x0.shape[0]
    sample_shape = x0.shape
    step_ratio = sched.num_train_timesteps // num_inference_steps

    x = jax.vmap(lambda n, t: add_noise(sched, x0 * b_scale, n, t))(noise, t_starts)

    def body(x, t):
        x_flat = x.reshape((K * B,) + sample_shape[1:])
        t_flat = jnp.full((K * B,), t, dtype=jnp.int32)
        out = model_fn(x_flat, t_flat).reshape((K, B) + sample_shape[1:])
        active = (t <= t_starts).reshape((K,) + (1,) * len(sample_shape))
        new_x = jax.vmap(
            lambda xx, oo: ddim_step(sched, oo, t, t - step_ratio, xx, eta=eta)
        )(x, out)
        return jnp.where(active, new_x, x), None

    x, _ = jax.lax.scan(body, x, timesteps_desc)
    return x


def dpm_sweep(
    sched: NoiseSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps_desc: jnp.ndarray,
    t_starts: jnp.ndarray,
    num_inference_steps: int,
    b_scale: float = 1.0,
) -> jnp.ndarray:
    """DPM-Solver++(2M) variant of the multi-lane sweep: per-lane carry is
    (x, prev_x0, has_prev); same lane-masking contract as plms_sweep. The
    second-order step needs ~4x fewer grid points than PLMS for comparable
    reconstructions (diffusion/dpm_solver.py)."""
    from ..diffusion.dpm_solver import dpm_init_state, dpm_step

    K = t_starts.shape[0]
    B = x0.shape[0]
    sample_shape = x0.shape
    step_ratio = sched.num_train_timesteps // num_inference_steps

    x_start = jax.vmap(lambda n, t: add_noise(sched, x0 * b_scale, n, t))(
        noise, t_starts
    )
    state = jax.vmap(dpm_init_state)(x_start)

    def body(state, t):
        x_flat = state.x.reshape((K * B,) + sample_shape[1:])
        t_flat = jnp.full((K * B,), t, dtype=jnp.int32)
        out = model_fn(x_flat, t_flat).reshape((K, B) + sample_shape[1:])
        active = t <= t_starts  # (K,)
        state = jax.vmap(
            lambda s, o, a: dpm_step(
                sched, s, o, t, t - step_ratio, t + step_ratio, active=a
            )
        )(state, out, active)
        return state, None

    state, _ = jax.lax.scan(body, state, timesteps_desc)
    return state.x


def group_t_starts(
    timesteps_desc: np.ndarray, t_starts: np.ndarray, num_groups: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Split ascending t_starts into contiguous groups, each with the trimmed
    descending timestep suffix it needs. Host-side, static shapes per group."""
    num_groups = max(1, min(num_groups, len(t_starts)))
    chunks = np.array_split(np.asarray(t_starts), num_groups)
    out = []
    for chunk in chunks:
        if len(chunk) == 0:
            continue
        tmax = int(chunk.max())
        suffix = timesteps_desc[timesteps_desc <= tmax]
        out.append((suffix.astype(np.int32), chunk.astype(np.int32)))
    return out


@dataclasses.dataclass
class ReconProgram:
    """Compiled end-to-end scoring program: noise -> PLMS sweep -> decode -> metrics.

    One instance per (model, config); `__call__` maps a host batch to per-
    (t_start, image) MSE and LPIPS arrays. Mirrors reference get_scores
    (src/trainers/reconstruct.py:72-250) minus the CSV/writer layer.
    """

    sched: NoiseSchedule
    # model_fn(x, t): pass a `jax.tree_util.Partial` binding the params — it is
    # threaded through jit as a TRACED pytree argument, so the weights become
    # program inputs. A plain closure would embed all weights as HLO constants
    # (observed: a 172M-param UNet's HLO exceeded the remote-compile service's
    # request-size limit, HTTP 413, besides bloating every compile).
    model_fn: ModelFn
    num_inference_steps: int = 100
    inference_skip_factor: int = 1
    b_scale: float = 1.0
    # autotuned on v5e (scripts/autotune_sweep.py): 8 groups cuts the masked-eval
    # overhead to ~1.09x ideal and measured 351 vs 256 recons/s against 3 groups
    # at the headline config; clamped to K for small sweeps
    num_groups: int = 8
    # "plms": batched sweep, fresh history per t_start (the performance path);
    # "plms_ref": the reference's exact carried-history semantics, sequential
    #             (quantification/parity path — see diffusion/plms.py);
    # "ddim", "dpm": extensions (dpm = DPM-Solver++(2M): comparable quality at
    #                ~4x fewer steps, diffusion/dpm_solver.py).
    sampler: str = "plms"
    latent_pad: Optional[Tuple[int, ...]] = None
    # stage-2 hooks; identity for pixel-space models (PassthroughVQVAE parity)
    encode_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    decode_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    perceptual_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None
    pad_images_for_lpips: bool = True  # the 28->32 rule
    simplex_noise_fn: Optional[Callable] = None  # (rng, shape, t_starts) -> noise
    # host-generated noise (the bit-exact C++ OpenSimplex path, reference
    # reconstruct.py:130-142): `host_noise_fn((K, B) + latent_sample_shape,
    # t_starts) -> np.ndarray` is called once per batch and the array becomes a
    # PROGRAM INPUT (sliced per lane group); takes precedence over
    # simplex_noise_fn. latent_sample_shape = (spatial..., C) of the tensor the
    # UNet consumes (post-encode, post-latent-pad) — needed host-side because
    # the encode happens inside the trace.
    host_noise_fn: Optional[Callable] = None
    latent_sample_shape: Optional[Tuple[int, ...]] = None
    # double-buffer host noise (VERDICT r4 #4): while batch N's sweep runs on
    # device, a single worker thread generates batch N+1's (K, B, ...) planes,
    # hiding the host-generation + H2D cost behind device time. Draw order is
    # bit-identical to the synchronous path (one generator thread, same call
    # sequence); the only difference is one extra unused draw after the final
    # batch. Disabled automatically while the batch shape is still unknown and
    # for the plms_ref bit-parity path.
    overlap_host_noise: bool = True
    # multi-process runs: constrain the scalar metric outputs (K, B) + preview
    # to be fully REPLICATED over this mesh, so every process can read them
    # with np.asarray and slice out its own columns — without this, outputs
    # span non-addressable devices and host fetch raises. Single-process: None.
    out_mesh: Optional[object] = None
    # likelihood-based OOD extension: additionally emit the per-(lane, image)
    # variational-bound KL term (bits/dim, diffusion/elbo.py) computed from the
    # SAME noise draw and x_t the lane's trajectory starts from — one extra
    # mega-batched UNet eval per group (~2% of the sweep). __call__ then
    # returns a 4th (K, B) array.
    score_elbo: bool = False
    # third similarity family (framework extension): per-(lane, image)
    # 1 - SSIM between the decoded reconstruction and the original
    # (ops/ssim.py; Gaussian-window, 2D/3D) — pure metrics-tail work, no extra
    # UNet evals. Emitted as an extra (K, B) array AFTER elbo (when both on).
    score_ssim: bool = False
    # anomaly-localization extension: per-PIXEL squared reconstruction error
    # averaged over start points — the AnoDDPM-style heatmap showing WHERE an
    # input deviates from the learned distribution, not just how much. The
    # reference reduces everything to per-image scalars (reconstruct.py:
    # 188-191); this keeps the pre-reduction residual. Each group program
    # emits the lane-SUM map (B, *spatial, C) as its LAST output; __call__
    # combines the groups into the exact mean over ALL K lanes and stashes it
    # on `self.last_error_maps`. Metrics-tail only (no extra UNet evals).
    score_error_maps: bool = False

    def __post_init__(self):
        if self.sampler in ("ddim", "dpm"):
            from ..diffusion.ddim import ddim_timesteps

            self.timesteps_desc = ddim_timesteps(
                self.sched.num_train_timesteps, self.num_inference_steps
            )
        elif self.sampler in ("plms", "plms_ref"):
            self.timesteps_desc = pndm_timesteps(
                self.sched.num_train_timesteps, self.num_inference_steps
            )
        else:
            raise ValueError(f"Unknown sampler {self.sampler!r}")
        if self.score_elbo and self.sampler == "plms_ref":
            raise ValueError(
                "score_elbo is not supported with sampler='plms_ref' (the "
                "bit-parity path emits exactly the reference's outputs)"
            )
        if self.score_ssim and self.sampler == "plms_ref":
            raise ValueError(
                "score_ssim is not supported with sampler='plms_ref' (the "
                "bit-parity path emits exactly the reference's outputs)"
            )
        if self.score_error_maps and self.sampler == "plms_ref":
            raise ValueError(
                "score_error_maps is not supported with sampler='plms_ref' "
                "(the bit-parity path emits exactly the reference's outputs)"
            )
        self.t_starts = pndm_start_points(
            self.timesteps_desc, self.inference_skip_factor
        )
        self._groups = group_t_starts(
            self.timesteps_desc, self.t_starts, self.num_groups
        )
        self._compiled: Dict[Tuple, Callable] = {}
        self._noise_executor = None  # lazy single-thread pool (host noise)
        self._pending_noise = None  # (shape, Future) for the NEXT batch

    # -- host-noise double buffering ----------------------------------------------
    def _host_noise_for(self, shape) -> "np.ndarray":
        """The (K, B, *latent) planes for THIS batch: takes the prefetched
        array when its shape matches (normal steady state), else generates
        synchronously; then immediately kicks off the next batch's generation
        so it overlaps the device sweep below."""
        shape = tuple(int(s) for s in shape)
        noise = None
        if self._pending_noise is not None:
            pend_shape, fut = self._pending_noise
            self._pending_noise = None
            if pend_shape == shape:
                noise = fut.result()
            else:  # geometry changed: consume (preserves draw order), discard
                fut.result()
        if noise is None:
            noise = np.asarray(
                self.host_noise_fn(shape, self.t_starts), dtype=np.float32
            )
        if self.overlap_host_noise:
            if self._noise_executor is None:
                from concurrent.futures import ThreadPoolExecutor

                self._noise_executor = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="host-noise"
                )
            self._pending_noise = (
                shape,
                self._noise_executor.submit(
                    lambda: np.asarray(
                        self.host_noise_fn(shape, self.t_starts),
                        dtype=np.float32,
                    )
                ),
            )
        return noise

    # -- concurrent cold-start compilation ---------------------------------------
    def warmup(self, example_images: jnp.ndarray, parallel: bool = True) -> float:
        """Pre-compile every lane-group program, concurrently.

        A cold start compiles one program per lane group (8-16 at the default
        grouping); through a remote-compile tunnel each costs 30-90 s and they
        are independent, so threads overlap the round trips (jax compilation
        is thread-safe). Each jit wrapper is warmed by one dispatch on
        `example_images` — pass an array shaped/sharded exactly like the real
        batches (contents irrelevant; execution is async and discarded) — and
        stored in `_compiled` under the key `__call__` will look up, which
        then dispatches with zero further compiles. Single-process only: the
        multi-process path owns its own compile-then-barrier choreography
        (see `__call__`). Returns the wall seconds spent; already-compiled
        groups are skipped.
        """
        if self.sampler == "plms_ref":
            return 0.0  # one sequential program; nothing to parallelize
        if self.out_mesh is not None and jax.process_count() > 1:
            raise RuntimeError("warmup() is single-process only")
        import concurrent.futures as cf
        import time

        t0 = time.perf_counter()

        def compile_group(group):
            ts_desc, t_starts = group
            key = (ts_desc.shape[0], t_starts.shape[0], example_images.shape)
            if key in self._compiled:
                return
            fn = self._build(ts_desc, t_starts)
            if self.host_noise_fn is not None:
                arg = jnp.zeros(
                    (len(t_starts), int(example_images.shape[0]))
                    + tuple(self.latent_sample_shape),
                    jnp.float32,
                )
            else:  # same key type __call__'s jax.random.split produces
                arg = jax.random.split(jax.random.PRNGKey(0))[0]
            fn(self.model_fn, self.encode_fn, self.decode_fn, example_images, arg)
            self._compiled[key] = fn

        if parallel and len(self._groups) > 1:
            with cf.ThreadPoolExecutor(min(8, len(self._groups))) as pool:
                list(pool.map(compile_group, self._groups))
        else:
            for g in self._groups:
                compile_group(g)
        return time.perf_counter() - t0

    # -- jitted per-group program ------------------------------------------------
    def _build(self, ts_desc: np.ndarray, t_starts: np.ndarray):
        ts_desc_j = jnp.asarray(ts_desc)
        t_starts_j = jnp.asarray(t_starts)
        K = len(t_starts)

        def program(model_fn, encode_fn, decode_fn,
                    images_original: jnp.ndarray, rng_or_noise):
            # images_original: (B, *spatial, C) in [0, 1]; model/encode/decode
            # arrive as Partial pytrees (weights traced, not baked in).
            # rng_or_noise: a PRNG key, or (host-noise mode) the (K, B, *latent)
            # noise array itself.
            x = images_original
            if encode_fn is not None:
                x = encode_fn(x)
            if self.latent_pad:
                x = pad_torch_style(x, self.latent_pad)

            noise_shape = (K,) + x.shape
            if self.host_noise_fn is not None:
                if rng_or_noise.shape != noise_shape:
                    raise ValueError(
                        f"host noise shape {rng_or_noise.shape} != expected "
                        f"{noise_shape} — latent_sample_shape is stale"
                    )
                noise = rng_or_noise.astype(x.dtype)
            elif self.simplex_noise_fn is not None:
                noise = self.simplex_noise_fn(rng_or_noise, noise_shape, t_starts_j)
            else:
                noise = jax.random.normal(rng_or_noise, noise_shape, dtype=x.dtype)

            sweep = {"plms": plms_sweep, "ddim": ddim_sweep, "dpm": dpm_sweep}[
                self.sampler
            ]
            recon = sweep(
                self.sched,
                model_fn,
                x,
                noise,
                ts_desc_j,
                t_starts_j,
                self.num_inference_steps,
                self.b_scale,
            )  # (K, B, *latent, C)

            scores = self._score_body(decode_fn, images_original, recon)
            if not self.score_elbo:
                return scores
            base, tail = scores[:3], scores[3:]  # ssim / err maps (if on) last
            # likelihood term: re-form each lane's own x_t (fused with the
            # sweep's identical expression by XLA) and do one mega-batched
            # eval at the start points — the only extra UNet work
            from ..diffusion.elbo import elbo_terms_from_model

            B = x.shape[0]
            x_t = jax.vmap(
                lambda n, t: add_noise(self.sched, x * self.b_scale, n, t)
            )(noise, t_starts_j)  # (K, B, *latent, C)
            flat = x_t.reshape((K * B,) + x.shape[1:])
            t_flat = jnp.repeat(t_starts_j, B)
            out = model_fn(flat, t_flat).reshape((K, B) + x.shape[1:])
            elbo = jax.vmap(
                lambda o, xt, n, t: elbo_terms_from_model(
                    self.sched, o, xt, n, t
                )
            )(out, x_t, noise, t_starts_j)  # (K, B) bits/dim
            if self.out_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                elbo = jax.lax.with_sharding_constraint(
                    elbo, NamedSharding(self.out_mesh, PartitionSpec())
                )
            return base + (elbo,) + tail

        return jax.jit(program)

    def _score_body(self, decode_fn, images_original, recon):
        """Shared decode + metrics tail (un-pad, VQ-VAE decode, /b_scale, clamp,
        per-(lane,image) MSE and LPIPS — reference reconstruct.py:159-191).
        Traced inside the group programs and the plms_ref metrics program."""
        if self.latent_pad:
            recon = jax.vmap(lambda r: unpad_torch_style(r, self.latent_pad))(recon)
        if decode_fn is not None:
            recon = jax.vmap(decode_fn)(recon)
        recon = jnp.clip(recon / self.b_scale, 0.0, 1.0)

        # per-(lane, image) MSE over non-batch dims (reference :188-191)
        diff = jnp.square(images_original[None] - recon)
        mse = jnp.mean(diff, axis=tuple(range(2, diff.ndim)))  # (K, B)

        if self.perceptual_fn is not None:
            img = images_original
            rec = recon
            if (
                self.pad_images_for_lpips
                and img.ndim == 4
                and (img.shape[1] < 32 or img.shape[2] < 32)
            ):
                # 28->32 reference rule (reconstruct.py:170-178), generalized
                # to any sub-32 input (AlexNet collapses below 32)
                from ..losses.lpips import pad_to_min_32

                img = pad_to_min_32(img)
                rec = jax.vmap(pad_to_min_32)(rec)
            perc = jax.vmap(lambda r: self.perceptual_fn(img, r))(rec)
            # perceptual_fn must return PER-IMAGE (B,) scores in both 2D and
            # 3D (reference scores LPIPS per item, reconstruct.py:181-187);
            # a scalar-returning fn would silently destroy the per-image OOD
            # signal, so reject it loudly.
            if perc.shape != mse.shape:
                raise ValueError(
                    f"perceptual_fn must return per-image scores {mse.shape[1:]}"
                    f" per lane; got {perc.shape} vs mse {mse.shape}"
                )
        else:
            perc = jnp.zeros_like(mse)
        ssim_d = None
        if self.score_ssim:
            from ..ops.ssim import ssim_distance

            ssim_d = jax.vmap(lambda r: ssim_distance(images_original, r))(recon)
        err_sum = None
        if self.score_error_maps:
            # lane-SUM of the per-pixel residual this group owns; __call__
            # divides by the total K so the cross-group combine is the exact
            # mean over every start point
            err_sum = jnp.sum(diff, axis=0)  # (B, *spatial, C)

        # small preview payload: the highest-t_start lane's recon for up to
        # 8 images (reference renders per-batch previews, reconstruct.py:206-231)
        preview = recon[-1, : min(8, recon.shape[1])]
        if self.out_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.out_mesh, PartitionSpec())
            mse = jax.lax.with_sharding_constraint(mse, rep)
            perc = jax.lax.with_sharding_constraint(perc, rep)
            preview = jax.lax.with_sharding_constraint(preview, rep)
            if ssim_d is not None:
                ssim_d = jax.lax.with_sharding_constraint(ssim_d, rep)
            if err_sum is not None:
                err_sum = jax.lax.with_sharding_constraint(err_sum, rep)
        out = (mse, perc, preview)
        if ssim_d is not None:
            out = out + (ssim_d,)
        if err_sum is not None:
            out = out + (err_sum,)
        return out

    def _call_reference_exact(self, images: jnp.ndarray, rng: jax.Array):
        """Sequential carried-history sweep (sampler='plms_ref'): the reference's
        per-batch-scheduler semantics, then the same jitted metrics tail."""
        from ..diffusion.plms import plms_reference_exact_sweep

        x = images
        if self.encode_fn is not None:
            x = jax.jit(lambda ef, a: ef(a))(self.encode_fn, images)
        if self.latent_pad:
            x = pad_torch_style(x, self.latent_pad)
        K = len(self.t_starts)
        noise_shape = (K,) + x.shape
        if self.host_noise_fn is not None:
            noise = jnp.asarray(
                self.host_noise_fn(noise_shape, self.t_starts), dtype=x.dtype
            )
        elif self.simplex_noise_fn is not None:
            noise = self.simplex_noise_fn(rng, noise_shape, jnp.asarray(self.t_starts))
        else:
            noise = jax.random.normal(rng, noise_shape, dtype=x.dtype)
        recon = plms_reference_exact_sweep(
            self.sched,
            self.model_fn,
            x,
            noise,
            self.timesteps_desc,
            self.t_starts,
            self.num_inference_steps,
            self.b_scale,
        )
        if not hasattr(self, "_metrics_jit"):
            self._metrics_jit = jax.jit(
                lambda decode_fn, img, rec: self._score_body(decode_fn, img, rec)
            )
        mse, perc, preview = self._metrics_jit(self.decode_fn, images, recon)
        self.last_preview = preview
        return np.asarray(self.t_starts), mse, perc

    def __call__(self, images: jnp.ndarray, rng: jax.Array):
        """Score one batch. Returns (t_starts (K,), mse (K,B), perceptual (K,B))
        — plus a 4th elbo (K,B) bits/dim array when score_elbo is set; the last
        group's preview recon is stashed on `self.last_preview`."""
        if self.sampler == "plms_ref":
            return self._call_reference_exact(images, rng)
        noise_full = None
        if self.host_noise_fn is not None:
            if self.latent_sample_shape is None:
                raise ValueError("host_noise_fn requires latent_sample_shape")
            noise_full = self._host_noise_for(
                (len(self.t_starts), images.shape[0])
                + tuple(self.latent_sample_shape)
            )
        mses, percs, elbos, ssims, starts = [], [], [], [], []
        err_sums = []
        offset = 0
        for gi, (ts_desc, t_starts) in enumerate(self._groups):
            key = (ts_desc.shape[0], t_starts.shape[0], images.shape)
            new_key = key not in self._compiled
            if new_key:
                self._compiled[key] = self._build(ts_desc, t_starts)
            if noise_full is not None:
                # groups are contiguous chunks of the ascending t_starts, so
                # slicing by running offset hands each lane its own plane set
                arg = noise_full[offset : offset + len(t_starts)]
            else:
                rng, arg = jax.random.split(rng)
            offset += len(t_starts)
            if new_key and self.out_mesh is not None and jax.process_count() > 1:
                # multiprocess: compile BEFORE dispatch, then rendezvous —
                # Gloo communicator init has a hard ~30 s window, and compile
                # skew between processes easily exceeds it under load (see
                # parallel/mesh.py coordination_barrier). The AOT executable
                # replaces the jit wrapper so the barrier-protected compile is
                # the ONLY compile.
                from ..parallel.mesh import coordination_barrier

                self._compiled[key] = self._compiled[key].lower(
                    self.model_fn, self.encode_fn, self.decode_fn, images, arg
                ).compile()
                coordination_barrier(
                    f"recon_g{gi}_" + "x".join(map(str, images.shape))
                )
            out = self._compiled[key](
                self.model_fn, self.encode_fn, self.decode_fn, images, arg
            )
            mse, perc, preview = out[:3]
            mses.append(mse)
            percs.append(perc)
            idx = 3
            if self.score_elbo:
                elbos.append(out[idx])
                idx += 1
            if self.score_ssim:
                ssims.append(out[idx])
                idx += 1
            if self.score_error_maps:
                err_sums.append(out[idx])
            starts.append(t_starts)
        self.last_preview = preview  # from the highest-t_start group
        if self.score_error_maps:
            # exact mean over ALL lanes: groups contributed lane-sums
            total_k = sum(len(ts) for _, ts in self._groups)
            self.last_error_maps = np.asarray(
                sum(np.asarray(e) for e in err_sums) / float(total_k)
            )
        base = (
            np.concatenate(starts),
            jnp.concatenate(mses, axis=0),
            jnp.concatenate(percs, axis=0),
        )
        if self.score_elbo:
            base = base + (jnp.concatenate(elbos, axis=0),)
        if self.score_ssim:
            base = base + (jnp.concatenate(ssims, axis=0),)
        return base
