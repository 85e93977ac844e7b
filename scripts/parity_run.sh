#!/usr/bin/env bash
# Reproduce the headline 2D parity pipeline: FashionMNIST (in-distribution)
# vs MNIST / SVHN / CIFAR10 + vflip/hflip near-OOD, mirroring the reference
# README.md:61-135 commands flag-for-flag. Produces the AUROC table to compare
# against arXiv:2211.07740 (and BASELINE.json.published once transcribed).
#
# Usage: scripts/parity_run.sh [data_root] [output_root]
#   - with network egress, datasets download automatically;
#   - offline, pre-place the raw archives under <data_root>/<Dataset>/raw/
#     (see ddpm_ood_tpu/data/get_computer_vision_datasets.py docstring).
set -euo pipefail
cd "$(dirname "$0")/.."

data_root=${1:-data}
output_root=${2:-output}

python -m ddpm_ood_tpu.data.get_computer_vision_datasets --data_root="${data_root}"

for f in FashionMNIST_train FashionMNIST_val FashionMNIST_test MNIST_test \
         SVHN_test CIFAR10_test; do
  [ -f "${data_root}/data_splits/${f}.csv" ] || {
    echo "missing ${data_root}/data_splits/${f}.csv (no egress and no raw archives?)" >&2
    exit 1
  }
done

# reference README.md:61-73 (train, 300 epochs, scaled_linear 0.0015->0.0195)
python train_ddpm.py \
  --output_dir="${output_root}" \
  --model_name=fashionmnist \
  --training_ids="${data_root}/data_splits/FashionMNIST_train.csv" \
  --validation_ids="${data_root}/data_splits/FashionMNIST_val.csv" \
  --is_grayscale=1 \
  --n_epochs=300 \
  --beta_schedule=scaled_linear_beta \
  --beta_start=0.0015 \
  --beta_end=0.0195

# reference README.md:96-114 (reconstruct: 100 PLMS steps, skip 4 = 25 recons)
python reconstruct.py \
  --output_dir="${output_root}" \
  --model_name=fashionmnist \
  --validation_ids="${data_root}/data_splits/FashionMNIST_val.csv" \
  --in_ids="${data_root}/data_splits/FashionMNIST_test.csv" \
  --out_ids="${data_root}/data_splits/MNIST_test.csv,${data_root}/data_splits/SVHN_test.csv,${data_root}/data_splits/CIFAR10_test.csv,${data_root}/data_splits/FashionMNIST_vflip_test.csv,${data_root}/data_splits/FashionMNIST_hflip_test.csv" \
  --is_grayscale=1 \
  --beta_schedule=scaled_linear_beta \
  --beta_start=0.0015 \
  --beta_end=0.0195 \
  --num_inference_steps=100 \
  --inference_skip_factor=4 \
  --run_val=1 --run_in=1 --run_out=1

# reference README.md:128-133 (Z-score + AUROC table)
python ood_detection.py \
  --output_dir="${output_root}" \
  --model_name=fashionmnist
