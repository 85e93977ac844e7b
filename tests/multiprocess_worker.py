"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process: initialize_multihost over a localhost coordinator, build a global
mesh spanning both processes' CPU devices, verify a cross-process collective,
partition the dataset per process exactly like the loaders do, and run the real
shard-CSV write/merge path from trainers/reconstruct.py (the replacement for
the reference's `all_gather_object`, src/trainers/reconstruct.py:237-248).

Usage: python multiprocess_worker.py <coordinator> <num_procs> <pid> <workdir>
"""

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
    coordinator, num_procs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
    )

    from ddpm_ood_tpu.parallel.mesh import (
        initialize_multihost, make_mesh, shard_batch,
    )

    initialize_multihost(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2 * num_procs  # global device view
    assert len(jax.local_devices()) == 2

    # ---- cross-process collective through a global mesh -----------------------
    import jax.numpy as jnp
    import numpy as np

    mesh = make_mesh()
    assert mesh.shape["data"] == 2 * num_procs
    # each process contributes a local batch of 2 rows valued [pid*2, pid*2+1]
    local = np.arange(pid * 2, pid * 2 + 2, dtype=np.float32).reshape(2, 1)
    global_batch = shard_batch(mesh, local)
    assert global_batch.shape == (2 * num_procs, 1)
    total = jax.jit(jnp.sum)(global_batch)
    expected = float(sum(range(2 * num_procs)))  # 0+1+2+3 = 6 for 2 procs
    assert float(total) == expected, (float(total), expected)

    # ---- per-process dataset partitioning (loader contract) -------------------
    from jax.experimental import multihost_utils

    from ddpm_ood_tpu.data.csv_splits import partition_for_process

    data = [{"image": f"img_{i}"} for i in range(5)]  # odd -> even_divisible pad
    mine = partition_for_process(data, num_procs, pid)
    assert len(mine) == 3  # ceil(5/2) with wrap padding
    sizes = multihost_utils.process_allgather(jnp.asarray([len(mine)]))
    assert int(np.sum(sizes)) == 6  # 5 + 1 duplicated row (scorer dedups)

    # ---- the real shard-CSV merge path from trainers/reconstruct.py -----------
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    class _Shim:  # only out_dir is touched by _write
        out_dir = workdir

    results = [
        {"filename": d["image"], "type": "val", "t": 100,
         "perceptual_difference": 0.1 * pid, "mse": float(pid)}
        for d in mine
    ]
    Reconstruct._write(_Shim(), results, "val")

    if pid == 0:
        import pandas as pd

        merged = pd.read_csv(workdir / "results_val.csv", index_col=0)
        assert len(merged) == 6, len(merged)  # both shards present
        assert set(merged["mse"]) == {0.0, 1.0}  # rows from BOTH processes
        # dedup (the scorer's DDP-artifact guard) recovers the 5 unique files
        assert merged.drop_duplicates(subset=["filename", "t"]).shape[0] == 5

    # ---- VQ-VAE EMA codebook sync across REAL processes -----------------------
    # The reference all-reduces EMA cluster stats across ranks (monai ddp_sync,
    # train_vqvae.py:50); here the global-batch EMA update is compiled into the
    # jitted G step. Each process computes the single-process reference on the
    # full (deterministic) global batch and checks the cross-process sharded
    # step reproduces it — params, EMA codebook, and loss.
    from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
    from ddpm_ood_tpu.models.vqvae import VQVAE
    from ddpm_ood_tpu.parallel.mesh import replicate
    from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, make_vqvae_states

    def states():
        vq = VQVAE(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_layers=1,
            downsample_parameters=((2, 4, 1, 1),),
            upsample_parameters=((2, 4, 1, 1, 0),),
            num_channels=(8,), num_res_channels=(8,),
            num_embeddings=8, embedding_dim=4,
        )
        disc = PatchDiscriminator(
            spatial_dims=2, num_layers_d=1, num_channels=8, in_channels=1
        )
        return make_vqvae_states(vq, disc, jax.random.PRNGKey(0), (16, 16, 1))

    g_step = VQVAETrainSteps(spatial_dims=2, perceptual_fn=None).make_generator_step()
    adv_w = jnp.float32(0.01)
    n_global = 2 * num_procs  # one row per global device
    global_images = (
        np.random.default_rng(42).uniform(size=(n_global, 16, 16, 1))
        .astype(np.float32)
    )

    g_ref, d_ref = states()
    ref_g, ref_metrics = g_step(g_ref, d_ref, jnp.asarray(global_images), adv_w)

    g2, d2 = states()
    g2 = jax.device_put(g2, replicate(mesh))
    d2 = jax.device_put(d2, replicate(mesh))
    local_rows = global_images[pid * 2:pid * 2 + 2]
    with mesh:
        new_g, metrics = g_step(g2, d2, shard_batch(mesh, local_rows), adv_w)

    np.testing.assert_allclose(
        float(metrics["generator_loss"]), float(ref_metrics["generator_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_g.ema["quantizer"]["cluster_size"]),
        np.asarray(ref_g.ema["quantizer"]["cluster_size"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_g.ema["quantizer"]["embedding"]),
        np.asarray(ref_g.ema["quantizer"]["embedding"]), atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_g.params),
        jax.tree_util.tree_leaves(ref_g.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    multihost_utils.sync_global_devices("done")
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()
