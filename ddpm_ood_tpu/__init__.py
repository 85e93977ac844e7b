"""ddpm_ood_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
reconstruction-based out-of-distribution detection with denoising diffusion models.

Capability-parity rebuild of marksgraham/ddpm-ood (see /root/reference), re-designed
TPU-first: pure-function noise schedules, samplers as `lax.scan` programs, Flax models,
GSPMD data parallelism over a `jax.sharding.Mesh` (replacing torch DDP/NCCL), and the
multi-t_start reconstruction sweep as a single batched device program (replacing the
reference's triple-nested Python loop in src/trainers/reconstruct.py:72-250).
"""

__version__ = "0.1.0"
