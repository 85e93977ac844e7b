"""AOT sweep artifacts (recon/aot.py): a serving restart must load compiled
lane-group executables with ZERO tracing/compiles and score identically.

The artifact pins backend + jax version + sweep geometry (loud mismatch
errors) but NOT the weights — params stay call-time inputs, so one artifact
serves any checkpoint of the same architecture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.recon.aot import load_compiled, load_or_save, save_compiled
from ddpm_ood_tpu.recon.sweep import ReconProgram

SCHED = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def _toy_model_fn(x, t):
    return 0.1 * x + 0.01 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def _program(**over):
    kw = dict(
        sched=SCHED,
        model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10,
        inference_skip_factor=3,
        sampler="dpm",
        num_groups=2,
    )
    kw.update(over)
    return ReconProgram(**kw)


def _images(seed=4, batch=2):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(
            size=(batch, 8, 8, 1)
        ).astype(np.float32)
    )


def _forbid_build(prog):
    def _boom(*a, **k):  # pragma: no cover - the assertion IS the test
        raise AssertionError("ReconProgram._build called after AOT load")

    prog._build = _boom


def test_aot_roundtrip_scores_identical(tmp_path):
    path = tmp_path / "sweep.aot"
    images = _images()
    prog1 = _program()
    want = prog1(images, jax.random.PRNGKey(0))
    meta = save_compiled(prog1, path, images)
    assert meta["program"]["groups"] == [
        (int(ts.shape[0]), int(starts.shape[0])) for ts, starts in prog1._groups
    ]

    prog2 = _program()
    got_meta = load_compiled(prog2, path, images)
    assert got_meta["batch_shape"] == tuple(images.shape)
    _forbid_build(prog2)  # zero compiles from here on
    got = prog2(images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    for w, g in zip(want[1:], got[1:]):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=1e-6, atol=1e-7
        )


def _weighted_model(w, x, t):
    # the production model_fn shape: Partial(apply, params) — params are
    # pytree LEAVES (traced inputs), the function is static structure
    return w * x + 0.01 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def test_aot_weights_stay_call_time_inputs(tmp_path):
    """The artifact must serve DIFFERENT weights of the same architecture —
    the hot-reload contract (serve.py POST /reload): weights are the
    Partial's bound leaves, fed at call time, NOT baked into the binary."""
    path = tmp_path / "sweep.aot"
    images = _images(seed=9)
    mf1 = jax.tree_util.Partial(_weighted_model, jnp.float32(0.1))
    save_compiled(_program(model_fn=mf1), path, images)

    mf2 = jax.tree_util.Partial(_weighted_model, jnp.float32(0.2))
    prog = _program(model_fn=mf2)
    load_compiled(prog, path, images)
    _forbid_build(prog)
    got = prog(images, jax.random.PRNGKey(1))
    # and it matches a from-scratch compile with the NEW weights
    want = _program(model_fn=jax.tree_util.Partial(
        _weighted_model, jnp.float32(0.2)
    ))(images, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(want[1]), np.asarray(got[1]), rtol=1e-6, atol=1e-7
    )
    # sanity: the new weights actually changed the scores
    base = _program(model_fn=mf1)(images, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(base[1]), np.asarray(got[1]))


def test_aot_extra_score_columns_roundtrip(tmp_path):
    """n_out differs with score columns on — the out-tree reconstruction
    must follow (ssim adds a 4th (K, B) array)."""
    path = tmp_path / "sweep.aot"
    images = _images(seed=11)
    prog1 = _program(score_ssim=True)
    want = prog1(images, jax.random.PRNGKey(2))
    assert len(want) == 4
    save_compiled(prog1, path, images)

    prog2 = _program(score_ssim=True)
    load_compiled(prog2, path, images)
    _forbid_build(prog2)
    got = prog2(images, jax.random.PRNGKey(2))
    assert len(got) == 4
    np.testing.assert_allclose(
        np.asarray(want[3]), np.asarray(got[3]), rtol=1e-6, atol=1e-7
    )


def test_aot_geometry_mismatch_raises(tmp_path):
    path = tmp_path / "sweep.aot"
    images = _images()
    save_compiled(_program(), path, images)

    with pytest.raises(ValueError, match="inference_skip_factor"):
        load_compiled(_program(inference_skip_factor=2), path, images)
    with pytest.raises(ValueError, match="sampler"):
        load_compiled(_program(sampler="plms"), path, images)
    with pytest.raises(ValueError, match="score_ssim"):
        load_compiled(_program(score_ssim=True), path, images)
    with pytest.raises(ValueError, match="batch_shape"):
        load_compiled(_program(), path, _images(batch=4))


def test_aot_plms_ref_rejected(tmp_path):
    prog = _program(sampler="plms_ref")
    with pytest.raises(ValueError, match="plms_ref"):
        save_compiled(prog, tmp_path / "x.aot", _images())


def test_aot_load_or_save(tmp_path):
    path = tmp_path / "sweep.aot"
    images = _images()
    first = load_or_save(_program(), path, images)
    assert first["action"] == "saved"
    prog = _program()
    second = load_or_save(prog, path, images)
    assert second["action"] == "loaded"
    _forbid_build(prog)
    t_starts, mse, perc = prog(images, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()


def test_bench_aot_script_quick_cpu():
    """scripts/bench_aot.py --quick --backend cpu end-to-end: three child
    processes (cold compile+save, warm-cache restart, AOT restart) each score
    a batch; the AOT phase must load with zero compiles (the child installs a
    compile-forbidding _build before scoring)."""
    import importlib.util
    import json as _json
    import sys
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / "bench_aot.py"
    spec = importlib.util.spec_from_file_location("_bench_aot_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import io
    from contextlib import redirect_stdout

    old = sys.argv
    sys.argv = ["bench_aot.py", "--quick", "--backend", "cpu"]
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            mod.main()
    finally:
        sys.argv = old
    out = buf.getvalue()
    payload = _json.loads(out[out.index("{"):])
    assert payload["bench"] == "aot_restart"
    for phase in ("cold_compile_save", "warm_persistent_cache_restart",
                  "aot_artifact_restart"):
        assert payload[phase]["first_score_s"] > 0
    assert payload["artifact_mb"] > 0


def test_reconstruct_maybe_aot_saves_then_loads(tmp_path):
    """The reconstruct CLI wiring (--aot_cache, trainers/reconstruct.py
    _maybe_aot): first run compiles+saves per (skip, batch) geometry, a
    fresh process loads with zero compiles."""
    import argparse

    from ddpm_ood_tpu.trainers.reconstruct import _maybe_aot

    prefix = str(tmp_path / "artifacts" / "sweep")

    class FakeRecon:
        args = argparse.Namespace(aot_cache=prefix)
        shard = staticmethod(lambda x: x)

    class FakeLoader:
        dataset = [{"image": np.zeros((1, 8, 8), np.float32)}] * 4
        batch_size = 2

    prog1 = _program()
    _maybe_aot(FakeRecon(), prog1, FakeLoader(), 3)
    assert len(prog1._compiled) == len(prog1._groups)
    import os
    assert os.path.exists(f"{prefix}.dpm10.skip3.b2.aot")

    prog2 = _program()
    _maybe_aot(FakeRecon(), prog2, FakeLoader(), 3)
    _forbid_build(prog2)
    t_starts, mse, perc = prog2(_images(batch=2), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()

    # no prefix -> no-op
    class NoAot(FakeRecon):
        args = argparse.Namespace(aot_cache=None)

    prog3 = _program()
    _maybe_aot(NoAot(), prog3, FakeLoader(), 3)
    assert not prog3._compiled


def test_aot_extra_fingerprint_pins_quantize(tmp_path):
    """A quantized and an f32 UNet share one param pytree, so ONLY the
    caller-passed extra fingerprint distinguishes their artifacts — crossing
    modes must fail loudly (load_compiled) or recompile (load_or_save)."""
    path = tmp_path / "sweep.aot"
    images = _images()
    save_compiled(_program(), path, images,
                  extra_fingerprint={"quantize": "none"})

    with pytest.raises(ValueError, match="extra.quantize"):
        load_compiled(_program(), path, images,
                      extra_fingerprint={"quantize": "int8"})

    out = load_or_save(_program(), path, images,
                       extra_fingerprint={"quantize": "int8"})
    assert out["action"].startswith("resaved"), out["action"]
    assert "quantize" in out["action"]
    # the resaved artifact now loads under int8
    prog = _program()
    again = load_or_save(prog, path, images,
                         extra_fingerprint={"quantize": "int8"})
    assert again["action"] == "loaded"


def test_aot_sched_change_is_pinned(tmp_path):
    """A different beta range is baked into the traced programs — the
    artifact must refuse to serve it (silent wrong numerics otherwise)."""
    path = tmp_path / "sweep.aot"
    images = _images()
    save_compiled(_program(), path, images)
    shifted = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0300)
    with pytest.raises(ValueError, match="sched_hash"):
        load_compiled(_program(sched=shifted), path, images)


def test_aot_stale_artifact_recompiles_not_crashes(tmp_path):
    """load_or_save treats any mismatched artifact as a stale cache: a
    sampler/grid change recompiles and overwrites instead of crash-looping
    the restart."""
    path = tmp_path / "sweep.aot"
    images = _images()
    save_compiled(_program(sampler="dpm"), path, images)
    out = load_or_save(_program(sampler="plms"), path, images)
    assert out["action"].startswith("resaved"), out["action"]
    prog = _program(sampler="plms")
    assert load_or_save(prog, path, images)["action"] == "loaded"
    _forbid_build(prog)
    t_starts, mse, perc = prog(images, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()


def test_maybe_parallel_warmup_uses_shared_example(monkeypatch):
    """_maybe_parallel_warmup rides the same _loader_example derivation as
    _maybe_aot (trainers/reconstruct.py) — opt-in via env, compiles every
    group for the loader's batch geometry."""
    import argparse

    from ddpm_ood_tpu.trainers.reconstruct import _maybe_parallel_warmup

    class FakeRecon:
        args = argparse.Namespace()
        shard = staticmethod(lambda x: x)

    class FakeLoader:
        dataset = [{"image": np.zeros((1, 8, 8), np.float32)}] * 4
        batch_size = 2

    monkeypatch.delenv("DDPM_OOD_TPU_PARALLEL_COMPILE", raising=False)
    prog = _program()
    _maybe_parallel_warmup(FakeRecon(), prog, FakeLoader())
    assert not prog._compiled  # opt-in: no env, no compiles

    monkeypatch.setenv("DDPM_OOD_TPU_PARALLEL_COMPILE", "1")
    _maybe_parallel_warmup(FakeRecon(), prog, FakeLoader())
    assert len(prog._compiled) == len(prog._groups)
    t_starts, mse, perc = prog(_images(batch=2), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()


def test_aot_corrupt_artifact_recompiles_not_crashes(tmp_path):
    """A truncated/garbage artifact raises UnpicklingError/EOFError, not
    ValueError — load_or_save must still treat it as a stale cache
    (ADVICE r4: 'recompiled, never fatal' must hold for corrupt files too)."""
    path = tmp_path / "sweep.aot"
    images = _images()
    path.write_bytes(b"\x80\x04 definitely not a pickle")
    out = load_or_save(_program(), path, images)
    assert out["action"].startswith("resaved"), out["action"]
    # and the re-saved artifact is immediately loadable
    prog = _program()
    assert load_or_save(prog, path, images)["action"] == "loaded"

    path.write_bytes(path.read_bytes()[: len(path.read_bytes()) // 2])
    out = load_or_save(_program(), path, images)
    assert out["action"].startswith("resaved"), out["action"]


def test_aot_fingerprint_pins_jaxlib(tmp_path):
    """The serialized executable depends on the jaxlib runtime — the
    fingerprint must pin it (ADVICE r4 medium)."""
    path = tmp_path / "sweep.aot"
    meta = save_compiled(_program(), path, _images())
    assert meta["jaxlib_version"] not in (None, "")
    import pickle as _pkl

    blob = _pkl.loads(path.read_bytes())
    blob["meta"]["jaxlib_version"] = "0.0.0-stale"
    path.write_bytes(_pkl.dumps(blob))
    with pytest.raises(ValueError, match="jaxlib_version"):
        load_compiled(_program(), path, _images())
    # but through load_or_save it's just a stale cache
    assert load_or_save(_program(), path, _images())["action"].startswith(
        "resaved"
    )


def test_aot_artifact_path_is_canonical():
    """artifact_path is the single source of truth for the on-disk name the
    --aot_cache help documents (ADVICE r4 low)."""
    from ddpm_ood_tpu.recon.aot import artifact_path

    assert (
        artifact_path("/runs/m", "dpm", 25, 1, 32)
        == "/runs/m.dpm25.skip1.b32.aot"
    )


def test_aot_payloads_compressed_and_backcompat(tmp_path):
    """Artifacts store zlib-compressed executables (tunnel restarts are
    upload-bandwidth-bound on artifact size); pre-compression artifacts with
    raw payloads still load."""
    import pickle as _pkl
    import zlib

    path = tmp_path / "sweep.aot"
    images = _images()
    save_compiled(_program(), path, images)
    blob = _pkl.loads(path.read_bytes())
    for entry in blob["groups"]:
        assert entry["codec"] == "zlib"
        raw = zlib.decompress(entry["payload"])
        assert len(raw) == entry["raw_len"]
        assert len(entry["payload"]) < len(raw)

    # rewrite as a legacy (uncompressed) artifact: must still load + score
    for entry in blob["groups"]:
        entry["payload"] = zlib.decompress(entry["payload"])
        del entry["codec"], entry["raw_len"]
    path.write_bytes(_pkl.dumps(blob))
    prog = _program()
    load_compiled(prog, path, images)
    _forbid_build(prog)
    t_starts, mse, perc = prog(images, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()
