#!/usr/bin/env python
"""Train a VQ-VAE (LDM stage 1) — CLI parity with reference train_vqvae.py."""

from ddpm_ood_tpu.config import parse_args_train_vqvae
from ddpm_ood_tpu.trainers import VQVAETrainer

if __name__ == "__main__":
    args = parse_args_train_vqvae()
    trainer = VQVAETrainer(args)
    trainer.train(args)
