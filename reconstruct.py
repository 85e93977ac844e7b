#!/usr/bin/env python
"""Reconstruction sweep over start timesteps — CLI parity with reference
reconstruct.py."""

from ddpm_ood_tpu.config import parse_args_reconstruct
from ddpm_ood_tpu.trainers import Reconstruct

if __name__ == "__main__":
    args = parse_args_reconstruct()
    recon = Reconstruct(args)
    recon.reconstruct(args)
