#!/usr/bin/env python
"""Train a DDPM (or latent DDPM) — CLI parity with reference train_ddpm.py."""

from ddpm_ood_tpu.config import parse_args_train_ddpm
from ddpm_ood_tpu.trainers import DDPMTrainer

if __name__ == "__main__":
    args = parse_args_train_ddpm()
    trainer = DDPMTrainer(args)
    trainer.train(args)
