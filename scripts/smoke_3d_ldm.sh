#!/usr/bin/env bash
# End-to-end 3D LDM smoke on real hardware through the four CLIs: synthetic
# 32-cubed NIfTI volumes -> 3D VQVAE+GAN (train_vqvae.py) -> latent DDPM
# (train_ddpm.py) -> 3D latent reconstruction sweep (reconstruct.py) ->
# AUROC (ood_detection.py), mirroring the reference Decathlon recipe
# (/root/reference/README.md:141-190) at smoke scale. Compare
# tests/test_ldm_3d.py (same pipeline, CPU, in-process).
#
# Usage: scripts/smoke_3d_ldm.sh [workspace_dir]
#   SAMPLER=dpm STEPS=25 SKIP=1 scripts/smoke_3d_ldm.sh  # sweep variants
set -ex
WS=${1:-/tmp/ldm3d_smoke}
export WS
SAMPLER=${SAMPLER:-plms}
STEPS=${STEPS:-10}
SKIP=${SKIP:-3}
rm -rf $WS && mkdir -p $WS
cd "$(dirname "$0")/.."
python - <<'PY'
import numpy as np
from pathlib import Path
from ddpm_ood_tpu.data.csv_splits import write_split_csv
from ddpm_ood_tpu.data.nifti import save_nifti
import os
root = Path(os.environ["WS"])
rng = np.random.default_rng(0)
zz, yy, xx = np.meshgrid(*[np.arange(32)]*3, indexing="ij")
def make(name, n, ood=False):
    d = root / name; d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        if ood:
            vol = (((xx//4 + yy//4 + zz//4) + i) % 2).astype(np.float32)
        else:
            ph = rng.uniform(0, 2*np.pi)
            vol = (0.5 + 0.5*np.sin(2*np.pi*(xx+yy+zz)/32 + ph)).astype(np.float32)
        p = d / f"{name.split('.')[0]}_{i}.nii.gz"
        save_nifti(str(p), vol); paths.append(str(p))
    write_split_csv(paths, str(root / f"{name}.csv"))
make("train", 8); make("val", 4); make("Task01_BrainTumour_test", 4)
# all nine held-out Decathlon tasks (the registry requires every CSV, parity
# with reference ood_detection.py): varied-period 3D checkerboards
names = ["Task02_Heart", "Task03_Liver", "Task04_Hippocampus", "Task05_Prostate",
         "Task06_Lung", "Task07_Pancreas", "Task08_HepaticVessel",
         "Task09_Spleen", "Task10_Colon"]
for j, nm in enumerate(names):
    k = 2 + (j % 4)
    d = root / f"{nm}_test"; d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(4):
        vol = (((xx//k + yy//k + zz//k) + i) % 2).astype(np.float32)
        p2 = d / f"{nm}_test_{i}.nii.gz"; save_nifti(str(p2), vol); paths.append(str(p2))
    write_split_csv(paths, str(root / f"{nm}_test.csv"))
PY
# stage 1: 3D VQ-VAE + PatchGAN on TPU (32-cubed, 2 levels -> latent 8-cubed)
timeout 2400 python train_vqvae.py --output_dir=$WS/output --model_name=vqvae_decathlon \
  --training_ids=$WS/train.csv --validation_ids=$WS/val.csv \
  --spatial_dimension=3 --image_size=32 --is_grayscale=0 \
  --vqvae_num_channels=[32,32] --vqvae_num_res_channels=[32,32] \
  --vqvae_num_res_layers=1 \
  --vqvae_downsample_parameters=[[2,4,1,1],[2,4,1,1]] \
  --vqvae_upsample_parameters=[[2,4,1,1,0],[2,4,1,1,0]] \
  --vqvae_embedding_dim=8 --vqvae_num_embeddings=64 \
  --batch_size=2 --n_epochs=2 --eval_freq=2 --checkpoint_every=2
# stage 2: latent DDPM against the frozen VQ-VAE on TPU
timeout 2400 python train_ddpm.py --output_dir=$WS/output --model_name=ldm_decathlon \
  --vqvae_checkpoint=$WS/output/vqvae_decathlon/checkpoint \
  --training_ids=$WS/train.csv --validation_ids=$WS/val.csv \
  --spatial_dimension=3 --image_size=32 --is_grayscale=0 --model_type=tiny \
  --beta_schedule=scaled_linear_beta --beta_start=0.0015 --beta_end=0.0195 \
  --batch_size=2 --n_epochs=2 --eval_freq=2 --checkpoint_every=2
# stage 3: 3D latent reconstruction sweep on TPU
timeout 2400 python reconstruct.py --output_dir=$WS/output --model_name=ldm_decathlon \
  --vqvae_checkpoint=$WS/output/vqvae_decathlon/checkpoint \
  --validation_ids=$WS/val.csv --in_ids=$WS/Task01_BrainTumour_test.csv \
  --out_ids=$WS/Task02_Heart_test.csv,$WS/Task03_Liver_test.csv,$WS/Task04_Hippocampus_test.csv,$WS/Task05_Prostate_test.csv,$WS/Task06_Lung_test.csv,$WS/Task07_Pancreas_test.csv,$WS/Task08_HepaticVessel_test.csv,$WS/Task09_Spleen_test.csv,$WS/Task10_Colon_test.csv \
  --spatial_dimension=3 --image_size=32 --is_grayscale=0 --model_type=tiny \
  --beta_schedule=scaled_linear_beta --beta_start=0.0015 --beta_end=0.0195 \
  --batch_size=2 --sampler=$SAMPLER \
  --num_inference_steps=$STEPS --inference_skip_factor=$SKIP
# stage 4: score
python ood_detection.py --output_dir=$WS/output --model_name=ldm_decathlon
echo LDM3D_TPU_ALL_OK
