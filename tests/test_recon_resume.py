"""Crash-safe reconstruction: incremental per-batch CSV flushing + --resume.

The reference accumulates an entire dataset pass in memory and writes
`results_{name}.csv` once at the end (src/trainers/reconstruct.py:252-330) —
a mid-run failure loses the whole pass. Here `_CsvSink` flushes+fsyncs every
scored batch to a per-host partial CSV, and `--resume=1` restarts skip images
whose full t_start grid is already persisted. Contract (VERDICT r4 #3): a
SIGKILL after batch N restarts and completes WITHOUT rescoring batches <= N,
and the resumed CSV is bit-identical to an uninterrupted run's.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.recon.sweep import ReconProgram
from ddpm_ood_tpu.trainers.reconstruct import Reconstruct, _CsvSink

SCHED = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)

REPO = Path(__file__).resolve().parents[1]


def _toy_model_fn(x, t):
    return 0.1 * x + 0.01 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def _program():
    return ReconProgram(
        sched=SCHED, model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
    )


class _Counting:
    """Delegating program proxy that counts sweep executions."""

    def __init__(self, prog):
        object.__setattr__(self, "_p", prog)
        object.__setattr__(self, "calls", 0)

    def __call__(self, *a, **k):
        object.__setattr__(self, "calls", self.calls + 1)
        return self._p(*a, **k)

    def __getattr__(self, name):
        return getattr(self._p, name)


def _fake_recon(prog):
    class FakeRecon:
        _program = lambda self, skip: prog  # noqa: E731
        shard = staticmethod(jnp.asarray)
        _save_preview = lambda self, *a, **k: None  # noqa: E731

    return FakeRecon()


def _batch(n, tag):
    return {
        "image": np.random.default_rng(hash(tag) % 2**31).uniform(
            size=(n, 1, 8, 8)
        ).astype(np.float32),
        "filename": [f"{tag}_{i}.npy" for i in range(n)],
    }


class _CrashingLoader:
    """Yields the first `n_ok` batches, then simulates a mid-run failure."""

    def __init__(self, batches, n_ok):
        self.batches, self.n_ok = batches, n_ok

    def __iter__(self):
        for i, b in enumerate(self.batches):
            if i >= self.n_ok:
                raise RuntimeError("simulated mid-run failure")
            yield b


def test_sink_flushes_per_batch_and_resume_skips(tmp_path):
    batches = [_batch(4, "a"), _batch(4, "b"), _batch(4, "c")]
    prog = _Counting(_program())
    recon = _fake_recon(prog)
    K = len(prog.t_starts)

    # --- run 1: crashes after 2 of 3 batches; rows for those 2 are on disk --
    sink1 = _CsvSink(tmp_path, "val")
    with pytest.raises(RuntimeError, match="simulated"):
        Reconstruct.get_scores(recon, _CrashingLoader(batches, 2), "val", 3,
                               sink=sink1)
    assert prog.calls == 2
    partial = tmp_path / ".results_val.partial.csv"
    assert partial.exists()
    flushed = pd.read_csv(partial)
    assert len(flushed) == 2 * 4 * K  # both completed batches persisted
    assert not (tmp_path / "results_val.csv").exists()

    # --- run 2: resume skips the persisted batches, scores only batch 3 ----
    prog2 = _Counting(_program())
    sink2 = _CsvSink(tmp_path, "val", resume=True)
    assert sink2.resumed_rows == 2 * 4 * K
    Reconstruct.get_scores(_fake_recon(prog2), batches, "val", 3, sink=sink2)
    assert prog2.calls == 1  # batches 1-2 were NOT rescored
    sink2.finalize()
    assert not partial.exists()

    final = pd.read_csv(tmp_path / "results_val.csv", index_col=0)
    assert len(final) == 3 * 4 * K
    assert not final.duplicated(["filename", "type", "t"]).any()
    assert {"filename", "type", "t", "perceptual_difference", "mse"} <= set(
        final.columns
    )

    # --- bit-parity: the resumed pass == an uninterrupted pass -------------
    prog3 = _Counting(_program())
    sink3 = _CsvSink(tmp_path, "ref")
    Reconstruct.get_scores(_fake_recon(prog3), batches, "val", 3, sink=sink3)
    sink3.finalize()
    ref = pd.read_csv(tmp_path / "results_ref.csv", index_col=0)
    key = ["filename", "t"]
    merged = final.merge(ref, on=key, suffixes=("_res", "_ref"))
    assert len(merged) == len(final)
    np.testing.assert_array_equal(
        merged["mse_res"].to_numpy(), merged["mse_ref"].to_numpy()
    )


def test_sink_partial_image_is_rescored(tmp_path):
    """An image persisted with fewer than K rows (torn batch) is rescored;
    finalize dedups keep-last so exactly K rows per image survive."""
    batches = [_batch(4, "a")]
    prog = _Counting(_program())
    K = len(prog.t_starts)
    sink1 = _CsvSink(tmp_path, "val")
    Reconstruct.get_scores(_fake_recon(prog), batches, "val", 3, sink=sink1)
    # tear the partial: drop the last row (one image now has K-1 rows)
    partial = tmp_path / ".results_val.partial.csv"
    df = pd.read_csv(partial)
    df.iloc[:-1].to_csv(partial, index=False)

    prog2 = _Counting(_program())
    sink2 = _CsvSink(tmp_path, "val", resume=True)
    Reconstruct.get_scores(_fake_recon(prog2), batches, "val", 3, sink=sink2)
    assert prog2.calls == 1  # the torn batch was rescored
    sink2.finalize()
    final = pd.read_csv(tmp_path / "results_val.csv", index_col=0)
    assert len(final) == 4 * K
    assert not final.duplicated(["filename", "type", "t"]).any()


def test_sink_resume_from_corrupt_partial_starts_fresh(tmp_path):
    """A partial the resume-read cannot use (unparseable, or only torn/NaN
    rows) is removed so the rerun writes a fresh headered partial instead of
    appending headerless rows to garbage; the pass completes normally."""
    batches = [_batch(4, "a")]
    K = len(_program().t_starts)

    # unparseable bytes
    partial = tmp_path / ".results_val.partial.csv"
    partial.write_bytes(b"\x00\xffnot,a\ncsv\x00" * 3)
    sink = _CsvSink(tmp_path, "val", resume=True)
    assert sink.resumed_rows == 0 and not partial.exists()
    Reconstruct.get_scores(_fake_recon(_Counting(_program())), batches,
                           "val", 3, sink=sink)
    sink.finalize()
    final = pd.read_csv(tmp_path / "results_val.csv", index_col=0)
    assert len(final) == 4 * K and not final.isna().any().any()

    # a torn final line that still parses (short row -> NaN) is dropped, so
    # the affected image rescores rather than surviving with a NaN metric
    ok = _CsvSink(tmp_path / "t2", "val")
    (tmp_path / "t2").mkdir()
    Reconstruct.get_scores(_fake_recon(_Counting(_program())), batches,
                           "val", 3, sink=ok)
    p2 = tmp_path / "t2" / ".results_val.partial.csv"
    txt = p2.read_text().splitlines()
    torn = txt[:-1] + [txt[-1].rsplit(",", 2)[0]]  # chop trailing fields
    p2.write_text("\n".join(torn) + "\n")
    sink2 = _CsvSink(tmp_path / "t2", "val", resume=True)
    assert sink2.resumed_rows == 4 * K - 1  # NaN row dropped
    prog2 = _Counting(_program())
    Reconstruct.get_scores(_fake_recon(prog2), batches, "val", 3, sink=sink2)
    assert prog2.calls == 1  # the torn image's batch rescored
    sink2.finalize()
    final2 = pd.read_csv(tmp_path / "t2" / "results_val.csv", index_col=0)
    assert len(final2) == 4 * K
    assert not final2.isna().any().any()
    assert not final2.duplicated(["filename", "type", "t"]).any()


def test_non_resume_run_discards_stale_partial(tmp_path):
    """Without --resume a leftover partial must not leak rows into the run."""
    stale = tmp_path / ".results_val.partial.csv"
    pd.DataFrame(
        [{"filename": "ghost", "type": "val", "t": 1,
          "perceptual_difference": 0.0, "mse": 0.0}]
    ).to_csv(stale, index=False)
    sink = _CsvSink(tmp_path, "val")
    assert sink.resumed_rows == 0 and not stale.exists()
    Reconstruct.get_scores(
        _fake_recon(_Counting(_program())), [_batch(4, "a")], "val", 3,
        sink=sink,
    )
    sink.finalize()
    final = pd.read_csv(tmp_path / "results_val.csv", index_col=0)
    assert "ghost" not in set(final["filename"])


# ---------------------------------------------------------------------------
# Full-CLI kill-mid-run test: train a tiny model, SIGKILL reconstruct.py after
# batch 1 (fault injection), restart with --resume=1, verify completion.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from ddpm_ood_tpu.data.csv_splits import write_split_csv
    from ddpm_ood_tpu.trainers import DDPMTrainer

    root = tmp_path_factory.mktemp("resume_cli")
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")

    def make(name, n):
        d = root / name
        d.mkdir(parents=True, exist_ok=True)
        paths = []
        for i in range(n):
            phase = rng.uniform(0, 2 * np.pi)
            img = (0.5 + 0.5 * np.sin(2 * np.pi * (xx + yy) / 16 + phase)
                   ).astype(np.float32)[None]
            p = d / f"{name}_{i}.npy"
            np.save(p, img)
            paths.append(str(p))
        csv = root / f"{name}.csv"
        write_split_csv(paths, str(csv))
        return str(csv)

    train_csv = make("train", 8)
    val_csv = make("val", 12)  # 3 batches at batch_size 4
    import argparse

    args = argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="resume_cli",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=16, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=4, n_epochs=1,
        eval_freq=10, augmentation=0, num_workers=0, cache_data=1,
        checkpoint_every=1, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0,
    )
    DDPMTrainer(args).train(args)
    return root, val_csv


def _recon_cmd(root, val_csv):
    argv = [
        "--output_dir", str(root / "output"), "--model_name", "resume_cli",
        "--validation_ids", val_csv, "--in_ids", val_csv,
        "--out_ids", val_csv, "--run_val", "1", "--run_in", "0",
        "--run_out", "0", "--num_inference_steps", "10",
        "--inference_skip_factor", "3", "--batch_size", "4",
        "--is_grayscale", "1", "--image_size", "16", "--model_type", "tiny",
        "--spatial_dimension", "2", "--num_workers", "0", "--resume", "1",
    ]
    # the axon TPU plugin overrides the JAX_PLATFORMS env var — the child must
    # pin CPU via jax.config before first jax use (test_serve_cli pattern)
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        f"sys.argv = ['reconstruct.py'] + {argv!r}\n"
        f"runpy.run_path({str(REPO / 'reconstruct.py')!r}, run_name='__main__')\n"
    )
    return [sys.executable, "-c", code]


def test_cli_sigkill_then_resume_completes(trained_run):
    root, val_csv = trained_run
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "DDPM_OOD_TPU_CRASH_AFTER_BATCHES": "1"}
    p1 = subprocess.run(
        _recon_cmd(root, val_csv), env=env, capture_output=True, text=True,
        timeout=600, cwd=str(REPO),
    )
    assert p1.returncode == -9, (p1.returncode, p1.stdout[-2000:],
                                 p1.stderr[-2000:])
    ood = root / "output" / "resume_cli" / "ood"
    partial = ood / ".results_val.partial.csv"
    assert partial.exists(), "batch 1's rows were not flushed before SIGKILL"
    n_flushed = len(pd.read_csv(partial))
    assert n_flushed == 4 * 4  # one batch x K=4 t_starts x 4 images
    assert not (ood / "results_val.csv").exists()

    env.pop("DDPM_OOD_TPU_CRASH_AFTER_BATCHES")
    p2 = subprocess.run(
        _recon_cmd(root, val_csv), env=env, capture_output=True, text=True,
        timeout=600, cwd=str(REPO),
    )
    assert p2.returncode == 0, (p2.stdout[-2000:], p2.stderr[-2000:])
    blob = p2.stdout + p2.stderr
    assert "resume: skipped 4 already-scored images" in blob, blob[-3000:]
    final = pd.read_csv(ood / "results_val.csv", index_col=0)
    assert final["filename"].nunique() == 12
    assert len(final) == 12 * 4
    assert not final.duplicated(["filename", "t"]).any()
    assert not partial.exists()
