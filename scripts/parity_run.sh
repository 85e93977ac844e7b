#!/usr/bin/env bash
# Reproduce the headline 2D parity pipeline: FashionMNIST (in-distribution)
# vs MNIST / SVHN / CIFAR10 + vflip/hflip near-OOD, mirroring the reference
# README.md:61-135 commands flag-for-flag. Produces the AUROC table and the
# comparison artifact against BASELINE.json.published (scripts/parity_report.py).
#
# RESUMABLE: every stage is skipped when its output already exists, so an
# interrupted run (or one waiting on egress for the datasets) picks up where
# it stopped — the intended mode is "first machine with egress runs this once,
# unattended, to completion".
#
# Usage: scripts/parity_run.sh [data_root] [output_root]
#   - with network egress, datasets download automatically;
#   - offline, pre-place the raw archives under <data_root>/<Dataset>/raw/
#     (see ddpm_ood_tpu/data/get_computer_vision_datasets.py docstring).
set -euo pipefail
cd "$(dirname "$0")/.."

data_root=${1:-data}
output_root=${2:-output}
splits="${data_root}/data_splits"
ood_dir="${output_root}/fashionmnist/ood"

stage_done() { [ -e "$1" ]; }

# ---- stage 1: datasets -------------------------------------------------------
need_prep=0
for f in FashionMNIST_train FashionMNIST_val FashionMNIST_test MNIST_test \
         SVHN_test CIFAR10_test; do
  [ -f "${splits}/${f}.csv" ] || need_prep=1
done
if [ "${need_prep}" = 1 ]; then
  python -m ddpm_ood_tpu.data.get_computer_vision_datasets --data_root="${data_root}"
else
  echo "[parity] stage 1 (datasets): already prepared — skipping"
fi
for f in FashionMNIST_train FashionMNIST_val FashionMNIST_test MNIST_test \
         SVHN_test CIFAR10_test; do
  [ -f "${splits}/${f}.csv" ] || {
    echo "missing ${splits}/${f}.csv (no egress and no raw archives?)" >&2
    exit 1
  }
done

# ---- stage 2: train (reference README.md:61-73 — 300 epochs, scaled_linear) --
# resumable two ways: a finished run leaves checkpoint_300 (skip entirely);
# a partial run leaves the rolling checkpoint, which train_ddpm auto-resumes.
if stage_done "${output_root}/fashionmnist/checkpoint_300"; then
  echo "[parity] stage 2 (train): checkpoint_300 exists — skipping"
else
  python train_ddpm.py \
    --output_dir="${output_root}" \
    --model_name=fashionmnist \
    --training_ids="${splits}/FashionMNIST_train.csv" \
    --validation_ids="${splits}/FashionMNIST_val.csv" \
    --is_grayscale=1 \
    --n_epochs=300 \
    --checkpoint_every=300 \
    --beta_schedule=scaled_linear_beta \
    --beta_start=0.0015 \
    --beta_end=0.0195
fi

# ---- stage 3: reconstruct (reference README.md:96-114 — 100 PLMS, skip 4) ----
# each results CSV gates its own sub-stage so a crash mid-sweep only redoes
# the unfinished datasets.
run_val=1; run_in=1
stage_done "${ood_dir}/results_val.csv" && run_val=0
stage_done "${ood_dir}/results_in.csv" && run_in=0
out_ids=""
for pair in "MNIST_test.csv:MNIST" "SVHN_test.csv:SVHN" \
            "CIFAR10_test.csv:CIFAR10" \
            "FashionMNIST_test.csv_vflip:FashionMNIST_vflip" \
            "FashionMNIST_test.csv_hflip:FashionMNIST_hflip"; do
  csv="${pair%%:*}"; result="${pair##*:}"
  stage_done "${ood_dir}/results_${result}.csv" || \
    out_ids="${out_ids:+${out_ids},}${splits}/${csv}"
done
if [ "${run_val}" = 0 ] && [ "${run_in}" = 0 ] && [ -z "${out_ids}" ]; then
  echo "[parity] stage 3 (reconstruct): all results CSVs exist — skipping"
else
  python reconstruct.py \
    --output_dir="${output_root}" \
    --model_name=fashionmnist \
    --validation_ids="${splits}/FashionMNIST_val.csv" \
    --in_ids="${splits}/FashionMNIST_test.csv" \
    --out_ids="${out_ids}" \
    --is_grayscale=1 \
    --beta_schedule=scaled_linear_beta \
    --beta_start=0.0015 \
    --beta_end=0.0195 \
    --num_inference_steps=100 \
    --inference_skip_factor=4 \
    --run_val="${run_val}" --run_in="${run_in}" \
    --run_out="$([ -n "${out_ids}" ] && echo 1 || echo 0)"
fi

# ---- stage 4: AUROC table + published-table comparison -----------------------
python scripts/parity_report.py \
  --output_dir="${output_root}" \
  --model_name=fashionmnist
