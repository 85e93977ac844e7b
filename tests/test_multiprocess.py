"""True multi-PROCESS coverage (not just virtual devices): two OS processes
joined via jax.distributed over a localhost coordinator, exercising
initialize_multihost, the global mesh + cross-process collective, per-process
loader partitioning, and the shard-CSV result merge that replaces the
reference's `all_gather_object` (src/trainers/reconstruct.py:237-248)."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_worker_pair(worker, extra_args, timeout=1500, retries=2):
    """Launch 2 coordinator-joined workers; retry ONCE on a fresh port if any
    worker exits nonzero. Under heavy host load (the suite shares the machine
    with benches) jax.distributed rendezvous/heartbeats can fail spuriously;
    a genuine code bug fails twice in a row and still surfaces with the full
    worker output."""
    last = None
    for attempt in range(retries + 1):
        coordinator = f"127.0.0.1:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, "2", str(pid),
                 *extra_args],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(2)
        ]
        outputs = [p.communicate(timeout=timeout)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            return outputs
        last = "\n".join(
            f"--- worker {pid} (rc={p.returncode}) attempt {attempt}:\n{out}"
            for pid, (p, out) in enumerate(zip(procs, outputs))
        )
    raise AssertionError(f"worker pair failed after {retries + 1} attempts:\n{last}")


def _recon_args(root, train_csv, val_csv, in_csv):
    return dict(
        seed=2, output_dir=str(root / "output"), model_name="mp_fashionmnist",
        training_ids=train_csv, validation_ids=val_csv, in_ids=in_csv,
        out_ids="", spatial_dimension=2, image_size=16, image_roi=None,
        latent_pad=None, vqvae_checkpoint=None, prediction_type="epsilon",
        model_type="tiny", beta_schedule="scaled_linear_beta",
        beta_start=0.0015, beta_end=0.0195, b_scale=1.0, snr_shift=1,
        simplex_noise=0, batch_size=4, augmentation=0, num_workers=2,
        cache_data=1, first_n_val=None, first_n=None,
        ddpm_checkpoint_epoch=None, eval_checkpoint=None, drop_last=False,
        is_grayscale=1, run_val=1, run_in=1, run_out=0,
        num_inference_steps=10, inference_skip_factor=3, sampler="plms",
        recon_groups=2, n_epochs=2, eval_freq=10, checkpoint_every=10,
        quick_test=0,
    )


def test_two_process_reconstruct_and_checkpoint(tmp_path):
    """A real Reconstruct.reconstruct() + checkpoint save/restore across 2 OS
    processes: the merged shard CSV must equal a single-process run row-for-row
    after dedup (noise forced to zeros so scores are a pure function of
    (image, t_start), independent of partitioning/batch packing)."""
    import argparse
    import json

    import numpy as np
    import pandas as pd

    from test_e2e import _make_dataset

    rng = np.random.default_rng(0)
    train_csv = _make_dataset(tmp_path, "train", 8, rng)
    val_csv = _make_dataset(tmp_path, "val", 6, rng)
    in_csv = _make_dataset(tmp_path, "inset", 6, rng)

    args = argparse.Namespace(**_recon_args(tmp_path, train_csv, val_csv, in_csv))

    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    DDPMTrainer(args).train(args)

    # ---- single-process reference scoring (zero noise) ------------------------
    recon = Reconstruct(args)
    prog = recon._program(args.inference_skip_factor)
    prog.host_noise_fn = lambda shape, t_starts: np.zeros(shape, np.float32)
    recon.reconstruct(args)
    ood_dir = tmp_path / "output" / args.model_name / "ood"
    single = {
        name: pd.read_csv(ood_dir / f"results_{name}.csv", index_col=0)
        for name in ("val", "in")
    }
    for name in ("val", "in"):
        (ood_dir / f"results_{name}.csv").unlink()

    # ---- the same scoring across 2 jax.distributed processes ------------------
    args_json = tmp_path / "recon_args.json"
    args_json.write_text(json.dumps(vars(args)))
    worker = Path(__file__).parent / "multiprocess_recon_worker.py"
    # generous timeout: ~190s standalone, but the suite may run under heavy
    # host load (concurrent benches); retried once on a fresh port
    outputs = _run_worker_pair(worker, [str(args_json)])
    for pid, out in enumerate(outputs):
        assert f"recon worker {pid}: OK" in out

    for name in ("val", "in"):
        merged = pd.read_csv(ood_dir / f"results_{name}.csv", index_col=0)
        key = ["filename", "t"]
        m = merged.drop_duplicates(subset=key).sort_values(key).reset_index(drop=True)
        s = single[name].drop_duplicates(subset=key).sort_values(key).reset_index(drop=True)
        assert list(m["filename"]) == list(s["filename"])
        assert list(m["t"]) == list(s["t"])
        np.testing.assert_allclose(
            m["mse"].to_numpy(), s["mse"].to_numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            m["perceptual_difference"].to_numpy(),
            s["perceptual_difference"].to_numpy(), rtol=1e-4, atol=1e-6,
        )
    # the distributed checkpoint landed and is discoverable
    assert (tmp_path / "output" / args.model_name / "checkpoint_77").exists()


def test_two_process_distributed(tmp_path):
    worker = Path(__file__).parent / "multiprocess_worker.py"
    outputs = _run_worker_pair(worker, [str(tmp_path)], timeout=600)
    for pid, out in enumerate(outputs):
        assert f"worker {pid}: OK" in out
    # rank 0 merged both shards into the final CSV
    assert (tmp_path / "results_val.csv").exists()
