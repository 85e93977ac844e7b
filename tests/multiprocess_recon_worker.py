"""Worker for the 2-process Reconstruct test (tests/test_multiprocess.py).

Each process joins jax.distributed over a localhost coordinator, builds the
REAL Reconstruct pipeline against a pre-trained run dir, scores its own data
partition, participates in the shard-CSV merge (the all_gather_object
replacement, reference src/trainers/reconstruct.py:237-248), then exercises
checkpoint save + restore under jax.distributed.

Noise is forced to zeros via the host-noise program input so the scores are a
pure function of (image, t_start) — independent of process count and batch
packing — which is what lets the parent assert the merged 2-process CSV equals
a single-process run row-for-row after dedup.

Usage: python multiprocess_recon_worker.py <coordinator> <num_procs> <pid> <args_json>
"""

import json
import os
import sys
from pathlib import Path

# Run-as-script ONLY: env side effects on import would leak the 2-device flag
# into any process importing a helper from this file (see train worker note).
if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env


def main() -> None:
    coordinator, num_procs, pid, args_json = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import argparse

    import numpy as np

    from ddpm_ood_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs

    with open(args_json) as f:
        args = argparse.Namespace(**json.load(f))

    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    recon = Reconstruct(args)
    prog = recon._program(args.inference_skip_factor)
    prog.host_noise_fn = lambda shape, t_starts: np.zeros(shape, np.float32)
    recon.reconstruct(args)

    # ---- checkpoint save + restore across processes ---------------------------
    from ddpm_ood_tpu.utils import checkpoint as ckpt

    recon.global_step = 123 + 0 * pid  # same value everywhere (replicated state)
    recon.save_checkpoint("checkpoint_77", 76)
    ckpt.wait_for_checkpoints()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    path = ckpt.find_checkpoint(recon.run_dir, 77)
    assert path is not None, "checkpoint_77 not found after distributed save"
    template = {
        "epoch": 0,
        "global_step": 0,
        "best_loss": 0.0,
        "model_state_dict": ckpt.to_host(recon.state.params),
        "optimizer_state_dict": ckpt.to_host(recon.state.opt_state),
    }
    payload = ckpt.restore_checkpoint(
        path, ckpt.replicated_restore_template(recon.mesh, template)
    )
    assert payload["epoch"] == 77 and payload["global_step"] == 123
    got = jax.tree_util.tree_leaves(payload["model_state_dict"])
    want = jax.tree_util.tree_leaves(ckpt.to_host(recon.state.params))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    multihost_utils.sync_global_devices("done")
    print(f"recon worker {pid}: OK")


if __name__ == "__main__":
    main()
