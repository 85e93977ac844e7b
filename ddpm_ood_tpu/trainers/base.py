"""BaseTrainer: shared model/schedule/checkpoint wiring for the DDPM pipelines.

Capability parity with the reference BaseTrainer (src/trainers/base.py:19-187):
frozen VQ-VAE (or passthrough) selection from `--vqvae_checkpoint` +
`vqvae_config.json`, small/big UNet presets, DDPM schedule + SNR shift, simplex
noise opt-in, latent pad bookkeeping, checkpoint discovery/resume with the
{epoch+1, global_step, model_state_dict, optimizer_state_dict, best_loss} schema,
Adam lr 2.5e-5.

TPU-native differences (by design, not omission):
  - torch DDP/NCCL init (reference base.py:21-37,160-164) is replaced by a GSPMD
    `jax.sharding.Mesh`: params replicated, batch sharded on the `data` axis; the
    gradient all-reduce is compiled into the jitted step.
  - AMP GradScaler (base.py:122) is unnecessary: compute runs bf16 with f32 params.
  - checkpoints are Orbax directories, not .pth pickles (utils/checkpoint.py).
"""

from __future__ import annotations

import ast
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedules import make_schedule
from ..models.unet import make_unet, param_count
from ..models.vqvae import VQVAE, PassthroughVQVAE
from ..parallel import mesh as pmesh
from ..train.ddpm import make_ddpm_state
from ..utils import checkpoint as ckpt
from ..utils.logging import info


def _as_tuple(value):
    """Parse tuple-ish CLI values (the reference uses ast.literal_eval on flags)."""
    if value is None or value == "" or value is False:
        return None
    if isinstance(value, (tuple, list)):
        return tuple(value)
    return tuple(ast.literal_eval(str(value)))


def channels_last(images: np.ndarray) -> np.ndarray:
    """Host batches arrive channel-first (reference data layout); models run NHWC."""
    return np.moveaxis(images, 1, -1)


class BaseTrainer:
    def __init__(self, args):
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()
        pmesh.initialize_multihost()
        self.mesh = pmesh.make_mesh()
        info(f"Arguments: {args}")
        for k, v in sorted(vars(args).items()):
            info(f"  {k}: {v}")
        info(
            f"Mesh: {self.mesh.shape} over {len(jax.devices())} device(s), "
            f"process {jax.process_index()}/{jax.process_count()}"
        )

        self.spatial_dimension = int(args.spatial_dimension)
        self.image_size = int(args.image_size) if args.image_size else args.image_size
        self.image_roi = _as_tuple(getattr(args, "image_roi", None))
        self.is_grayscale = bool(getattr(args, "is_grayscale", False))
        self.dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

        # -- frozen VQ-VAE (LDM) or passthrough (pixel-space) ----------------------
        self.vqvae_checkpoint = getattr(args, "vqvae_checkpoint", None)
        if self.vqvae_checkpoint:
            vq_path = Path(self.vqvae_checkpoint)
            cfg_path = vq_path.parent / "vqvae_config.json"
            if not vq_path.exists():
                raise FileNotFoundError(f"Cannot find VQ-VAE checkpoint {vq_path}")
            if not cfg_path.exists():
                raise FileNotFoundError(f"Cannot find VQ-VAE config {cfg_path}")
            self.vqvae_config = ckpt.load_config_json(cfg_path)
            cfg = dict(self.vqvae_config)
            for key in ("downsample_parameters", "upsample_parameters",
                        "num_channels", "num_res_channels"):
                if key in cfg:
                    cfg[key] = tuple(
                        tuple(v) if isinstance(v, (list, tuple)) else v
                        for v in cfg[key]
                    ) if isinstance(cfg[key], (list, tuple)) else cfg[key]
            self.vqvae_model = VQVAE(**cfg, dtype=self.dtype)
            ckpt.check_numerics_version(vq_path.parent)
            # metadata-driven template: the VQVAE may have been trained on a
            # different device count than this run (8-chip train -> 1-chip
            # LDM/serve); see restore_checkpoint_replicated
            payload = ckpt.restore_checkpoint_replicated(vq_path, self.mesh)
            self.vqvae_vars = {
                "params": payload["model_state_dict"]["params"],
                "ema": payload["model_state_dict"]["ema"],
            }
            info("Loaded vqvae model with config:")
            for k, v in self.vqvae_config.items():
                info(f"  {k}: {v}")
            ddpm_channels = int(self.vqvae_config["embedding_dim"])
        else:
            self.vqvae_model = PassthroughVQVAE()
            self.vqvae_vars = None
            ddpm_channels = 1 if self.is_grayscale else 3
        self.ddpm_channels = ddpm_channels

        # -- UNet ------------------------------------------------------------------
        # --quantize=int8 (reconstruct/serve extension): scoring-time PTQ over
        # the same param tree; trainers never set it, so training is unaffected
        quantize = getattr(args, "quantize", "none")
        self.unet = make_unet(
            args.model_type,
            self.spatial_dimension,
            ddpm_channels,
            ddpm_channels,
            dtype=self.dtype,
            remat=bool(getattr(args, "remat", 0)),
            quant=None if quantize in (None, "none") else str(quantize),
        )
        if quantize not in (None, "none"):
            info(f"Quantized scoring enabled: {quantize} block convolutions")

        # -- schedule --------------------------------------------------------------
        self.prediction_type = args.prediction_type
        self.beta_schedule = args.beta_schedule
        self.beta_start = float(args.beta_start)
        self.beta_end = float(args.beta_end)
        self.b_scale = float(args.b_scale)
        self.snr_shift = float(getattr(args, "snr_shift", 1))
        self.sched = make_schedule(
            schedule=self.beta_schedule,
            num_train_timesteps=1000,
            beta_start=self.beta_start,
            beta_end=self.beta_end,
            prediction_type=self.prediction_type,
            snr_shift=self.snr_shift,
        )
        if self.snr_shift != 1:
            info("Changing scheduler parameters to shift SNR")

        self.simplex_noise = bool(getattr(args, "simplex_noise", 0))

        # -- latent pad ------------------------------------------------------------
        latent_pad = _as_tuple(getattr(args, "latent_pad", None))
        self.do_latent_pad = bool(latent_pad)
        self.latent_pad = latent_pad if latent_pad else None

        # -- sample geometry + train state ----------------------------------------
        self.run_dir = Path(args.output_dir) / args.model_name
        self.run_dir.mkdir(parents=True, exist_ok=True)
        sample_shape = self._latent_sample_shape()
        rng = jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0))
        # weight EMA (framework extension): tracked when training with
        # --ema_decay > 0; --use_ema (reconstruct) restores into the same slot
        self.ema_decay = float(getattr(args, "ema_decay", 0) or 0)
        self.use_ema = bool(getattr(args, "use_ema", 0))
        self.state = make_ddpm_state(
            self.unet, rng, sample_shape,
            learning_rate=float(getattr(args, "learning_rate", 2.5e-5) or 2.5e-5),
            with_ema=self.ema_decay > 0 or self.use_ema,
            lr_warmup_steps=int(getattr(args, "lr_warmup_steps", 0) or 0),
        )
        info(f"{param_count(self.state.params):,} model parameters")

        # -- resume ----------------------------------------------------------------
        resume_epoch = getattr(args, "ddpm_checkpoint_epoch", None)
        path = ckpt.find_checkpoint(
            self.run_dir, int(resume_epoch) if resume_epoch else None
        )
        if path is not None:
            # refuse checkpoints trained under different conv-window numerics
            # (utils/checkpoint.py NUMERICS_VERSION) instead of silently
            # producing shifted reconstructions
            ckpt.check_numerics_version(self.run_dir)
            template = {
                "epoch": 0,
                "global_step": 0,
                "best_loss": 0.0,
                "model_state_dict": ckpt.to_host(self.state.params),
                "optimizer_state_dict": ckpt.to_host(self.state.opt_state),
            }
            # the saved tree's structure is the restore contract: include the
            # EMA slot iff this checkpoint was written with one (EMA-off runs
            # keep the reference's exact schema)
            ckpt_has_ema = "ema_model_state_dict" in ckpt.checkpoint_keys(path)
            if ckpt_has_ema:
                template["ema_model_state_dict"] = ckpt.to_host(self.state.params)
            if self.use_ema and not ckpt_has_ema:
                raise RuntimeError(
                    f"--use_ema requested but checkpoint {path} has no "
                    f"ema_model_state_dict (was it trained with --ema_decay > 0?)"
                )
            # ALWAYS restore through concrete replicated shardings over the
            # current mesh: a plain numpy template replays the shardings the
            # checkpoint was SAVED with and fails whenever the topology
            # changed (multi-process runs, and 8-device train -> 1-chip
            # reconstruct/serve restores)
            template = ckpt.replicated_restore_template(self.mesh, template)
            payload = ckpt.restore_checkpoint(path, template)
            self.found_checkpoint = True
            self.start_epoch = int(payload["epoch"])
            self.global_step = int(payload["global_step"])
            self.best_loss = float(payload["best_loss"])
            restored_params = payload["model_state_dict"]
            if ckpt_has_ema:
                ema_params = payload["ema_model_state_dict"]
            elif self.state.ema_params is not None:
                # resuming a pre-EMA run with --ema_decay now on: seed the
                # average from the restored weights
                ema_params = restored_params
            else:
                ema_params = None
            if self.use_ema:
                info("Using EMA weights (ema_model_state_dict) for the model")
                restored_params = payload["ema_model_state_dict"]
            # host-side dtype casts: per-leaf device ops here would issue hundreds
            # of tiny RPCs through the TPU tunnel (observed multi-minute resumes)
            self.state = self.state.replace(
                params=restored_params,
                ema_params=ema_params if self.state.ema_params is not None else None,
                opt_state=jax.tree_util.tree_map(
                    lambda t, s: np.asarray(s, dtype=t.dtype)
                    if hasattr(t, "dtype") else s,
                    self.state.opt_state,
                    payload["optimizer_state_dict"],
                ),
            )
            info(f"Resuming training using checkpoint {path} at epoch {self.start_epoch}")
        else:
            self.found_checkpoint = False
            self.start_epoch = 0
            self.global_step = 0
            self.best_loss = 1000.0

        # -- FSDP (framework extension; SURVEY §2.3 mesh-axis note) -----------------
        # applied AFTER resume so restored host params get the sharded layout;
        # the jitted step is unchanged — GSPMD inserts the all-gathers/
        # reduce-scatters (ZeRO-3 pattern) from the input shardings alone
        self.fsdp = bool(getattr(args, "fsdp", 0))
        if self.fsdp:
            import os

            from ..parallel.fsdp import (
                DEFAULT_MIN_SIZE, apply_fsdp, sharded_bytes_per_device,
            )

            min_size = int(
                os.environ.get("DDPM_OOD_TPU_FSDP_MIN_SIZE", DEFAULT_MIN_SIZE)
            )
            self.state = apply_fsdp(self.mesh, self.state, min_size=min_size)
            info(
                "FSDP: params + optimizer state sharded "
                f"{self.mesh.shape[pmesh.DATA_AXIS]}-way along the data axis "
                f"({sharded_bytes_per_device(self.state.params) / 2**20:.1f} "
                "MiB params/device)"
            )

        self.quick_test = bool(getattr(args, "quick_test", 0))

    def reload_params(self, epoch: Optional[int] = None):
        """Re-read the run's checkpoint (newest/best, or an explicit epoch) into
        self.state — the serving hot-reload hook (framework extension). Only
        params (and the EMA slot when --use_ema) matter to consumers of
        `model_fn`; the full saved tree is restored because orbax templates
        must match the saved structure exactly (same contract as __init__'s
        resume block above). Returns the checkpoint path."""
        path = ckpt.find_checkpoint(
            self.run_dir, int(epoch) if epoch is not None else None
        )
        if path is None:
            raise FileNotFoundError(
                f"No checkpoint under {self.run_dir}"
                + (f" for epoch {epoch}" if epoch is not None else "")
            )
        ckpt.check_numerics_version(self.run_dir)
        template = {
            "epoch": 0,
            "global_step": 0,
            "best_loss": 0.0,
            "model_state_dict": ckpt.to_host(self.state.params),
            "optimizer_state_dict": ckpt.to_host(self.state.opt_state),
        }
        ckpt_has_ema = "ema_model_state_dict" in ckpt.checkpoint_keys(path)
        if ckpt_has_ema:
            template["ema_model_state_dict"] = ckpt.to_host(self.state.params)
        if self.use_ema and not ckpt_has_ema:
            raise RuntimeError(
                f"--use_ema requested but checkpoint {path} has no "
                f"ema_model_state_dict"
            )
        # topology-agnostic, as in __init__'s resume block
        template = ckpt.replicated_restore_template(self.mesh, template)
        payload = ckpt.restore_checkpoint(path, template)
        new_params = (
            payload["ema_model_state_dict"] if self.use_ema
            else payload["model_state_dict"]
        )
        self.state = self.state.replace(params=new_params)
        if getattr(self, "fsdp", False):
            from ..parallel.fsdp import apply_fsdp

            self.state = apply_fsdp(self.mesh, self.state)
        self.start_epoch = int(payload["epoch"])
        info(f"Hot-reloaded weights from {path} (epoch {self.start_epoch})")
        return path

    # -- stage-2 hooks (pixel-space: identity) ------------------------------------
    # weights are bound via jax.tree_util.Partial so jitted consumers receive
    # them as TRACED arguments — closing over them would embed every weight as
    # an HLO constant (breaks remote compile services on big models and bloats
    # every program)

    def _apply_encode(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        return self.vqvae_model.apply(
            variables, x, method=VQVAE.encode_stage_2_inputs
        )

    def _apply_decode(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        return self.vqvae_model.apply(
            variables, z, method=VQVAE.decode_stage_2_outputs
        )

    @property
    def encode_fn(self):
        if self.vqvae_vars is None:
            return None
        return jax.tree_util.Partial(self._apply_encode, self.vqvae_vars)

    @property
    def decode_fn(self):
        if self.vqvae_vars is None:
            return None
        return jax.tree_util.Partial(self._apply_decode, self.vqvae_vars)

    def _latent_sample_shape(self):
        """(spatial..., C) of the tensor the UNet consumes, for param init."""
        size = self.image_size or 32
        spatial = (size,) * self.spatial_dimension
        if self.image_roi and not self.image_size:
            spatial = tuple(self.image_roi)
        if self.vqvae_vars is not None:
            strides = [p[0] for p in self.vqvae_config["downsample_parameters"]]
            factor = int(np.prod(strides))
            spatial = tuple(max(1, s // factor) for s in spatial)
        if self.do_latent_pad:
            pairs = [
                (self.latent_pad[2 * i], self.latent_pad[2 * i + 1])
                for i in range(len(self.latent_pad) // 2)
            ][::-1]
            pairs = [(0, 0)] * (len(spatial) - len(pairs)) + list(pairs)
            spatial = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pairs))
        return spatial + (self.ddpm_channels,)

    def _apply_unet(self, params, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return self.state.apply_fn({"params": params}, x, t)

    @property
    def model_fn(self):
        """UNet apply with the CURRENT params bound as a traced Partial arg
        (for samplers/sweeps)."""
        return jax.tree_util.Partial(self._apply_unet, self.state.params)

    def shard(self, batch: np.ndarray) -> jax.Array:
        return pmesh.shard_batch(self.mesh, batch)

    def save_checkpoint(self, name: str, epoch: int, save_message: Optional[str] = None):
        """Reference schema (base.py:166-187): epoch+1 so resume starts on the next
        epoch; params saved unwrapped (no DDP wrapper exists here by construction)."""
        if save_message:
            info(save_message)
        # device arrays go straight to orbax (async d2h + write); host-side
        # per-leaf copies would cost seconds per save through a tunneled chip
        payload = {
            "epoch": int(epoch) + 1,
            "global_step": int(self.global_step),
            "best_loss": float(self.best_loss),
            "model_state_dict": self.state.params,
            "optimizer_state_dict": self.state.opt_state,
        }
        if self.state.ema_params is not None:
            payload["ema_model_state_dict"] = self.state.ema_params
        ckpt.save_checkpoint(self.run_dir, name, payload)
