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


def _marker(out: str, name: str) -> str:
    lines = [ln for ln in out.splitlines() if ln.startswith(name + " ")]
    assert lines, f"marker {name} missing:\n{out}"
    return lines[-1].split(" ", 1)[1].strip()


def test_two_process_ddpm_training_with_resume(tmp_path):
    """The real train CLI path over 2 OS processes (VERDICT r3 item 5):
    epoch loss matches a single-process run (frozen-params parity), the
    trained replicas stay bit-identical across ranks, and a restart resumes
    from rank 0's checkpoint on BOTH processes and finishes training."""
    import argparse
    import json

    import numpy as np

    from test_e2e import _make_dataset

    rng = np.random.default_rng(0)
    train_csv = _make_dataset(tmp_path, "train", 16, rng)
    val_csv = _make_dataset(tmp_path, "val", 4, rng)

    base = dict(
        seed=2, output_dir=str(tmp_path / "output"), model_name="mp_train",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=16, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=1, batch_size=4, n_epochs=2,
        eval_freq=10, augmentation=0, num_workers=2, cache_data=1,
        checkpoint_every=2, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0,
    )

    # ---- single-process parity reference (frozen params) ----------------------
    from multiprocess_train_worker import deterministic_simplex_batch

    from ddpm_ood_tpu.trainers import DDPMTrainer

    pa = argparse.Namespace(**{**base, "model_name": "sp_train_parity",
                               "learning_rate": 1e-30})
    trainer = DDPMTrainer(pa)
    trainer._simplex_batch = deterministic_simplex_batch(
        trainer.sched.num_train_timesteps
    )
    single_loss = trainer.train_epoch(0)

    # ---- the same run across 2 jax.distributed processes ----------------------
    args_json = tmp_path / "train_args.json"
    args_json.write_text(json.dumps(base))
    worker = Path(__file__).parent / "multiprocess_train_worker.py"
    outputs = _run_worker_pair(worker, [str(args_json)])
    for pid, out in enumerate(outputs):
        assert f"train worker {pid}: OK" in out

    # frozen-params epoch loss is batching/process-count invariant
    for out in outputs:
        assert abs(float(_marker(out, "PARITY_LOSS")) - single_loss) < 1e-5, (
            _marker(out, "PARITY_LOSS"), single_loss
        )
    # data-parallel replicas must stay bit-identical across ranks,
    # through training AND through the restart+resume
    for name in ("PARAMS_DIGEST_B", "PARAMS_DIGEST_C"):
        assert _marker(outputs[0], name) == _marker(outputs[1], name), name
    assert _marker(outputs[0], "PARAMS_DIGEST_B") != _marker(
        outputs[0], "PARAMS_DIGEST_C"
    ), "resume training did not change the weights"
    # both ranks discovered rank 0's checkpoint_2 and resumed at epoch 2
    for out in outputs:
        assert _marker(out, "RESUME_START") == "2"
        # 4 epochs x (16 images / 2 processes) per-process image counter,
        # continued across the restart (reference counts images, :110)
        assert _marker(out, "GLOBAL_STEP") == "32"
    run_dir = tmp_path / "output" / "mp_train_resume"
    assert (run_dir / "checkpoint_2").exists()
    assert (run_dir / "checkpoint_4").exists()
