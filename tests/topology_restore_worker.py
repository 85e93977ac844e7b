"""Run-as-script worker: restore an 8-device-saved checkpoint on ONE device.

Regression companion for the cross-topology restore fix (trainers/base.py
resume/reload + utils/checkpoint.py): the trainers save live device
jax.Arrays, so the checkpoint records shardings naming the SAVING run's
devices. Restoring on a different device count with a plain numpy template
replays those dead shardings and fails ("Sharding ... Got None") — the
production shape of this is train-on-a-pod-slice -> reconstruct/serve on one
chip. Both fixed restore paths must work here under a 1-device backend:

  1. restore_checkpoint_replicated (templateless, metadata-driven — the
     frozen-VQVAE reload in BaseTrainer.__init__)
  2. replicated_restore_template + restore_checkpoint (the trainer
     resume/reload path)

argv: <ckpt_path> <out_json>
Writes restored values to out_json for the parent test to verify.
"""

import json
import os
import sys
from pathlib import Path

# Run-as-script ONLY: env side effects on import would leak the 1-device flag
# into any process importing a helper from this file (see train worker note).
if __name__ == "__main__":
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env


def main() -> None:
    ckpt_path, out_json = sys.argv[1], sys.argv[2]
    assert len(jax.devices()) == 1, jax.devices()

    import numpy as np

    from ddpm_ood_tpu.utils import checkpoint as ckpt

    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()).reshape(1, 1), ("data", "model")
    )

    # path 1: templateless metadata-driven restore (frozen-VQVAE reload)
    p1 = ckpt.restore_checkpoint_replicated(ckpt_path, mesh)

    # path 2: numpy template routed through replicated_restore_template
    # (trainer resume/reload contract — template tree matches the saved tree)
    template = {
        "epoch": 0,
        "model_state_dict": {"w": np.zeros((2, 3), np.float32)},
    }
    p2 = ckpt.restore_checkpoint(
        ckpt_path, ckpt.replicated_restore_template(mesh, template)
    )

    out = {
        "templateless": {
            "epoch": int(p1["epoch"]),
            "w": np.asarray(p1["model_state_dict"]["w"]).tolist(),
        },
        "templated": {
            "epoch": int(p2["epoch"]),
            "w": np.asarray(p2["model_state_dict"]["w"]).tolist(),
        },
    }
    Path(out_json).write_text(json.dumps(out))


if __name__ == "__main__":
    main()
