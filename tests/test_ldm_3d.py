"""3D latent-diffusion slice: VQVAE-GAN training -> frozen-VQVAE LDM training ->
latent reconstruction sweep. Tiny shapes, CPU; exercises the spatial_dims=3 path
(conv3d, fake-3d perceptual, ConvTranspose geometry, vqvae_config round-trip,
latent_pad) end to end.
"""

import argparse
from pathlib import Path

import numpy as np
import pytest

from ddpm_ood_tpu.data.csv_splits import write_split_csv
from ddpm_ood_tpu.data.nifti import save_nifti


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ldm3d")
    rng = np.random.default_rng(0)
    for name, n in (("train", 4), ("val", 2)):
        d = root / name
        d.mkdir()
        paths = []
        for i in range(n):
            vol = rng.uniform(size=(16, 16, 16)).astype(np.float32)
            p = d / f"{name}_{i}.nii.gz"
            save_nifti(str(p), vol)
            paths.append(str(p))
        write_split_csv(paths, str(root / f"{name}.csv"))
    return root


def _vqvae_args(root):
    return argparse.Namespace(
        seed=1, output_dir=str(root / "output"), model_name="vq3d",
        training_ids=str(root / "train.csv"), validation_ids=str(root / "val.csv"),
        spatial_dimension=3, image_size=None, image_roi=None,
        vqvae_in_channels=1, vqvae_out_channels=1, vqvae_num_res_layers=1,
        vqvae_downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
        vqvae_upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
        vqvae_num_channels=[8, 8], vqvae_num_res_channels=[8, 8],
        vqvae_num_embeddings=16, vqvae_embedding_dim=4, vqvae_decay=0.99,
        vqvae_commitment_cost=0.25, vqvae_epsilon=1e-5, vqvae_dropout=0.0,
        vqvae_ddp_sync=True, vqvae_learning_rate=3e-4, batch_size=2, n_epochs=1,
        eval_freq=1, augmentation=0, adversarial_weight=0.01,
        adversarial_warmup=0, num_workers=1, cache_data=1, checkpoint_every=1,
        is_grayscale=0, quick_test=1,
    )


def _ldm_args(root, vq_ckpt):
    return argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="ldm3d",
        training_ids=str(root / "train.csv"), validation_ids=str(root / "val.csv"),
        spatial_dimension=3, image_size=None, image_roi=None, latent_pad=None,
        vqvae_checkpoint=vq_ckpt, prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=2, n_epochs=1,
        eval_freq=5, augmentation=0, num_workers=1, cache_data=1,
        checkpoint_every=1, ddpm_checkpoint_epoch=None, is_grayscale=0,
        quick_test=1,
    )


def test_ldm_3d_pipeline(workspace):
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct, VQVAETrainer

    # stage 1: VQ-VAE + GAN
    vq_args = _vqvae_args(workspace)
    vq = VQVAETrainer(vq_args)
    vq.train(vq_args)
    run_dir = Path(vq_args.output_dir) / "vq3d"
    assert (run_dir / "checkpoint").exists()
    assert (run_dir / "vqvae_config.json").exists()

    # stage 2: latent DDPM against the frozen VQ-VAE
    ldm_args = _ldm_args(workspace, str(run_dir / "checkpoint"))
    trainer = DDPMTrainer(ldm_args)
    assert trainer.ddpm_channels == 4  # = embedding_dim
    trainer.train(ldm_args)
    assert (Path(ldm_args.output_dir) / "ldm3d" / "checkpoint").exists()

    # stage 3: latent reconstruction sweep (MSE-only; 3D fake-3d LPIPS is
    # exercised separately in test_losses)
    rargs = _ldm_args(workspace, str(run_dir / "checkpoint"))
    rargs.validation_ids = str(workspace / "val.csv")
    rargs.in_ids = str(workspace / "val.csv")
    rargs.out_ids = str(workspace / "train.csv")
    rargs.run_val, rargs.run_in, rargs.run_out = 1, 0, 0
    rargs.num_inference_steps = 10
    rargs.inference_skip_factor = 5
    rargs.first_n = None
    rargs.first_n_val = None
    rargs.drop_last = False
    rargs.eval_checkpoint = None
    recon = Reconstruct(rargs)
    recon._perceptual = _NoPerceptual()  # keep the CPU test fast
    recon.reconstruct(rargs)

    import pandas as pd

    df = pd.read_csv(Path(rargs.output_dir) / "ldm3d" / "ood" / "results_val.csv")
    assert df["filename"].nunique() == 2
    assert np.isfinite(df["mse"]).all()


class _NoPerceptual:
    """Stand-in perceptual metric: zero per image (plot_target='mse' path)."""

    def __call__(self, y, y_pred):
        import jax.numpy as jnp

        return jnp.zeros((y.shape[0],), dtype=jnp.float32)
