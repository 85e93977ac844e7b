"""Host-noise plumbing: the bit-exact scoring-noise path (VERDICT r2 #2) and
the ragged-batch wrap-pad (VERDICT r2 weak #1).

The reference draws real OpenSimplex noise on the host at scoring time
(reference src/trainers/reconstruct.py:130-142). Here that noise enters the
batched sweep as a program INPUT; these tests pin down that (a) the sweep
consuming host noise reproduces the sequential single-lane path bit-for-bit,
(b) lane-group slicing hands each lane its own planes, and (c) a ragged final
batch reuses the compiled programs instead of recompiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.plms import plms_denoise
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.recon.sweep import ReconProgram


def _model_partial(scale=0.1):
    def apply(w, x, t):
        return w * x

    return jax.tree_util.Partial(apply, jnp.float32(scale))


@pytest.fixture(scope="module")
def sched():
    return make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def _fixed_noise(K, B, S):
    return np.random.default_rng(42).normal(size=(K, B, S, S, 1)).astype(np.float32)


def test_host_noise_matches_sequential_path(sched):
    """Sweep-with-host-noise == per-lane add_noise + plms_denoise with the same
    noise slices (the sequential semantics the reference runs, minus its
    carried-history quirk which plms_ref covers separately)."""
    B, S = 2, 8
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(B, S, S, 1)).astype(np.float32)
    )
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
        host_noise_fn=lambda shape, t_starts: _fixed_noise(shape[0], shape[1], S),
        latent_sample_shape=(S, S, 1),
    )
    K = len(prog.t_starts)
    noise = _fixed_noise(K, B, S)
    t_starts, mse, _ = prog(images, jax.random.PRNGKey(0))
    mse = np.asarray(mse)

    model = _model_partial()
    ts_desc = jnp.asarray(prog.timesteps_desc)
    for k, t in enumerate(prog.t_starts):
        x_start = add_noise(
            sched, images, jnp.asarray(noise[k]), jnp.asarray(int(t))
        )
        recon = plms_denoise(
            sched, model, x_start, ts_desc, jnp.asarray(int(t)), 10
        )
        recon = jnp.clip(recon, 0.0, 1.0)
        seq_mse = np.asarray(
            jnp.mean(jnp.square(images - recon), axis=(1, 2, 3))
        )
        np.testing.assert_allclose(mse[k], seq_mse, rtol=0, atol=1e-6)


def test_host_noise_group_slicing(sched):
    """Identical host noise must give identical scores regardless of lane
    grouping — i.e. the running-offset slice maps lane k to planes[k]."""
    B, S = 2, 8
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(B, S, S, 1)).astype(np.float32)
    )

    def host_fn(shape, t_starts):
        return _fixed_noise(shape[0], shape[1], S)

    results = []
    for groups in (1, 3):
        prog = ReconProgram(
            sched=sched, model_fn=_model_partial(), num_inference_steps=10,
            inference_skip_factor=1, num_groups=groups,
            host_noise_fn=host_fn, latent_sample_shape=(S, S, 1),
        )
        t_starts, mse, _ = prog(images, jax.random.PRNGKey(0))
        order = np.argsort(np.asarray(t_starts), kind="stable")
        results.append(np.asarray(mse)[order])
    np.testing.assert_allclose(results[0], results[1], rtol=0, atol=1e-6)


def test_host_noise_shape_mismatch_rejected(sched):
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1,
        host_noise_fn=lambda shape, t_starts: np.zeros(
            (shape[0], shape[1], 4, 4, 1), np.float32
        ),
        latent_sample_shape=(4, 4, 1),  # stale: images are 8x8
    )
    with pytest.raises(ValueError, match="host noise shape"):
        prog(jnp.zeros((2, 8, 8, 1)), jax.random.PRNGKey(0))


def test_ragged_batch_reuses_compiled_programs(sched):
    """A ragged final loader batch must add ZERO new compile keys: get_scores
    wrap-pads it to the first batch's compiled size (serve.py pattern)."""
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
    )

    class FakeRecon:
        _program = lambda self, skip: prog  # noqa: E731
        shard = staticmethod(jnp.asarray)
        _save_preview = lambda self, *a, **k: None  # noqa: E731

    def batch(n, tag):
        return {
            "image": np.random.default_rng(n).uniform(
                size=(n, 1, 8, 8)
            ).astype(np.float32),
            "filename": [f"{tag}_{i}.npy" for i in range(n)],
        }

    loader = [batch(4, "full"), batch(4, "full2"), batch(2, "ragged")]
    results = Reconstruct.get_scores(FakeRecon(), loader, "val", 3)
    assert len(prog._compiled) == len(prog._groups)  # no tail recompile
    K = len(prog.t_starts)
    assert len(results) == K * (4 + 4 + 2)  # padded rows never emitted
    names = {r["filename"] for r in results}
    assert sum(n.startswith("ragged") for n in names) == 2


def test_host_simplex_noise_is_the_exact_kernel():
    """Reconstruct._host_simplex_noise must emit exactly the C++ OpenSimplex
    planes of generate_simplex_noise, lane by lane, in the reference's draw
    order (t_start outermost -> channel -> item)."""
    from ddpm_ood_tpu.noise import _native
    from ddpm_ood_tpu.noise.simplex import Simplex, generate_simplex_noise
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    if not _native.available():
        pytest.skip("native OpenSimplex kernel unavailable")

    class FakeRecon:
        simplex = Simplex(0)

    shape = (3, 2, 8, 8, 1)
    t_starts = np.array([10, 500, 990])
    np.random.seed(123)  # newSeed() draws from the global numpy RNG
    got = Reconstruct._host_simplex_noise(FakeRecon(), shape, t_starts)

    np.random.seed(123)
    simplex = Simplex(0)
    want = np.stack([
        generate_simplex_noise(
            simplex, shape[1:], np.full((2,), int(t), dtype=np.int64)
        )
        for t in t_starts
    ])
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32 and np.isfinite(got).all()
    assert got.std() > 0


def test_host_noise_overlap_is_draw_order_identical(sched):
    """Double-buffered host noise (overlap_host_noise=True, VERDICT r4 #4):
    the consumed draw sequence is bit-identical to the synchronous path — a
    stateful generator sees the same call order, only one trailing unused
    draw is added after the final batch."""
    B, S = 2, 8

    def make_gen():
        state = {"n": 0}

        def gen(shape, t_starts):
            # stateful: draw i is a deterministic function of i alone
            i = state["n"]
            state["n"] += 1
            return np.full(shape, float(i), dtype=np.float32) + (
                np.random.default_rng(i).normal(size=shape).astype(np.float32)
            )

        return gen, state

    def run(overlap):
        gen, state = make_gen()
        prog = ReconProgram(
            sched=sched, model_fn=_model_partial(), num_inference_steps=10,
            inference_skip_factor=3, num_groups=2,
            host_noise_fn=gen, latent_sample_shape=(S, S, 1),
            overlap_host_noise=overlap,
        )
        images = jnp.asarray(
            np.random.default_rng(0).uniform(size=(B, S, S, 1)).astype(np.float32)
        )
        out = []
        for b in range(3):  # three "batches"
            _, mse, _ = prog(images, jax.random.PRNGKey(b))
            out.append(np.asarray(mse))
        if overlap and prog._pending_noise is not None:
            prog._pending_noise[1].result()  # settle the trailing draw
        return out, state["n"]

    sync_out, sync_calls = run(overlap=False)
    ov_out, ov_calls = run(overlap=True)
    for a, b in zip(sync_out, ov_out):
        np.testing.assert_array_equal(a, b)
    assert sync_calls == 3
    assert ov_calls == 4  # exactly one trailing prefetch, never consumed
