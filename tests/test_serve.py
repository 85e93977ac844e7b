"""Serving surface (ddpm_ood_tpu/serve.py): scoring service + HTTP front end."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.recon.sweep import ReconProgram
from ddpm_ood_tpu.serve import (
    BatchingScoringService,
    ScoringService,
    make_handler,
)

SIZE = 16


@pytest.fixture(scope="module")
def program():
    unet = make_unet("tiny", 2, 1, 1)
    x = jnp.zeros((1, SIZE, SIZE, 1))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))["params"]
    model_fn = jax.tree_util.Partial(
        lambda p, xx, tt: unet.apply({"params": p}, xx, tt), params
    )
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    return ReconProgram(
        sched=sched, model_fn=model_fn,
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
    )


def _val_stats(program):
    rows = []
    for t in (int(t) for t in program.t_starts):
        for i in range(4):
            rows.append({
                "filename": f"v{i}", "type": "val", "t": t,
                "mse": 0.1 + 0.01 * i, "perceptual_difference": 0.0,
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def service(program):
    return ScoringService(program, _val_stats(program), batch_size=4,
                          model_name="tiny_test")


def test_score_shapes_and_fields(service, program):
    imgs = np.random.default_rng(0).uniform(size=(3, SIZE, SIZE, 1)).astype("float32")
    out = service.score(imgs)
    assert len(out) == 3
    for rec in out:
        assert np.isfinite(rec["z_score_mse"])
        assert np.isfinite(rec["z_score_perceptual"])
        assert set(rec["per_t"]) == {int(t) for t in program.t_starts}


def test_elbo_served_when_program_and_stats_have_it(program):
    """A score_elbo program + an elbo column in the val stats -> z_score_elbo
    per image; either one missing -> the field is absent (no crash)."""
    elbo_prog = ReconProgram(
        sched=program.sched, model_fn=program.model_fn,
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        score_elbo=True,
    )
    stats = _val_stats(program)
    stats["elbo"] = 0.05 + 0.001 * (stats.index % 4)
    svc = ScoringService(elbo_prog, stats, batch_size=4, model_name="t")
    imgs = np.random.default_rng(1).uniform(size=(2, SIZE, SIZE, 1)).astype(
        "float32"
    )
    out = svc.score(imgs)
    assert all(np.isfinite(r["z_score_elbo"]) for r in out)
    assert all("elbo" in v for r in out for v in r["per_t"].values())

    # program emits elbo but the val CSV predates the column: served without it
    svc_nostats = ScoringService(
        elbo_prog, _val_stats(program), batch_size=4, model_name="t"
    )
    out = svc_nostats.score(imgs)
    assert all("z_score_elbo" not in r for r in out)
    assert np.isfinite(out[0]["z_score_mse"])


def test_ssim_served_beside_elbo(program):
    """score_ssim rides after elbo in the program outputs; the service
    serves z_score_ssim when the val stats carry ssim_distance, and indexes
    the extras correctly whether or not elbo is also enabled."""
    both_prog = ReconProgram(
        sched=program.sched, model_fn=program.model_fn,
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        score_elbo=True, score_ssim=True,
    )
    stats = _val_stats(program)
    stats["elbo"] = 0.05 + 0.001 * (stats.index % 4)
    stats["ssim_distance"] = 0.2 + 0.01 * (stats.index % 4)
    svc = ScoringService(both_prog, stats, batch_size=4, model_name="t")
    imgs = np.random.default_rng(2).uniform(size=(2, SIZE, SIZE, 1)).astype(
        "float32"
    )
    out = svc.score(imgs)
    assert all(np.isfinite(r["z_score_ssim"]) for r in out)
    assert all(np.isfinite(r["z_score_elbo"]) for r in out)
    assert all("ssim_distance" in v for r in out for v in r["per_t"].values())

    # ssim only (no elbo): the ssim array sits at output index 3
    ssim_prog = ReconProgram(
        sched=program.sched, model_fn=program.model_fn,
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        score_ssim=True,
    )
    stats2 = _val_stats(program)
    stats2["ssim_distance"] = 0.2 + 0.01 * (stats2.index % 4)
    svc2 = ScoringService(ssim_prog, stats2, batch_size=4, model_name="t")
    out2 = svc2.score(imgs)
    assert all(np.isfinite(r["z_score_ssim"]) for r in out2)
    assert all("z_score_elbo" not in r for r in out2)
    # same ssim values through both programs (same noise key path)
    np.testing.assert_allclose(
        [r["z_score_ssim"] for r in out2],
        [r["z_score_ssim"] for r in out], rtol=1e-5,
    )

    # program emits ssim but the val CSV lacks the column: served without it
    svc3 = ScoringService(ssim_prog, _val_stats(program), batch_size=4,
                          model_name="t")
    out3 = svc3.score(imgs)
    assert all("z_score_ssim" not in r for r in out3)


def test_oversize_batch_rejected(service):
    with pytest.raises(ValueError, match="batch"):
        service.score(np.zeros((5, SIZE, SIZE, 1), "float32"))


def test_stats_mismatch_rejected(program):
    bad = _val_stats(program)
    bad = bad[bad["t"] != int(program.t_starts[0])]  # drop one start point
    with pytest.raises(ValueError, match="start points"):
        ScoringService(program, bad, batch_size=2)


def test_single_row_val_stats_rejected(program):
    """One validation row for a t_start makes the sample std (ddof=1) NaN —
    the service must refuse at construction, not return NaN z-scores with
    HTTP 200 (round-3 guard, serve.py ScoringService.__init__)."""
    stats = _val_stats(program)
    t0 = int(program.t_starts[0])
    thin = pd.concat(
        [stats[stats["t"] != t0], stats[stats["t"] == t0].head(1)]
    )
    with pytest.raises(ValueError, match="fewer than 2 rows"):
        ScoringService(program, thin, batch_size=2)


def test_oversized_content_length_rejected_413(service):
    """A Content-Length above the service cap must be refused BEFORE the body
    is buffered into host memory (round-3 guard, serve.py do_POST)."""
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=b"x"
        )
        # lie about the length: far beyond batch_size * 64 MiB + slack
        req.add_unredirected_header(
            "Content-Length", str(service.max_body_bytes + 1)
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 413
        assert "exceeds cap" in json.loads(e.value.read())["error"]
    finally:
        server.shutdown()


def test_concurrent_requests_serialize_safely(service):
    """Parallel callers share one device program behind the service lock;
    both must complete with valid, independent results."""
    imgs = np.random.default_rng(2).uniform(size=(2, SIZE, SIZE, 1)).astype("float32")
    results = [None, None]

    def worker(i):
        results[i] = service.score(imgs)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for r in results:
        assert r is not None and len(r) == 2
        assert all(np.isfinite(rec["z_score_mse"]) for rec in r)


def test_http_round_trip(service):
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["model"] == "tiny_test"
        assert health["batch_size"] == 4

        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(1).uniform(
            size=(2, SIZE, SIZE, 1)).astype("float32"))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=buf.getvalue()
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert len(payload["scores"]) == 2
        assert all(np.isfinite(s["z_score_mse"]) for s in payload["scores"])

        # malformed body -> 400, named error
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/score", data=b"junk")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400

        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
        assert e.value.code == 404

        # /reload without a hook -> 409 (the fixture service has none)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 409

        # ops counters: the one successful POST above scored 2 images in 1 sweep
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as r:
            stats = json.loads(r.read())
        assert stats["sweeps"] >= 1 and stats["images"] >= 2
        assert stats["requests"] >= 1
        assert stats["device_seconds"] > 0
        assert stats["mean_sweep_seconds"] > 0
    finally:
        server.shutdown()
        server.server_close()


# ---------------------------------------------------------- dynamic batching --
def _deterministic_program(program):
    """Same tiny program but with zero host noise: per-image scores become a
    pure function of the image, independent of batching / wrap-padding."""
    return ReconProgram(
        sched=program.sched, model_fn=program.model_fn,
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        host_noise_fn=lambda shape, t_starts: np.zeros(shape, np.float32),
        latent_sample_shape=(SIZE, SIZE, 1),
    )


def test_batching_coalesces_concurrent_requests(program):
    inner = ScoringService(_deterministic_program(program), _val_stats(program),
                           batch_size=4, model_name="t")
    calls = []
    orig = inner.score
    inner.score = lambda imgs: (calls.append(imgs.shape[0]), orig(imgs))[1]
    svc = BatchingScoringService(inner, batch_window_ms=500.0)
    try:
        imgs = np.random.default_rng(2).uniform(
            size=(4, SIZE, SIZE, 1)).astype("float32")
        results = [None] * 4
        errors = []

        def submit(i):
            try:
                results[i] = svc.score(imgs[i : i + 1])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert all(r is not None and len(r) == 1 for r in results)
        # 4 one-image requests inside a 500 ms window: coalesced, not 4 sweeps
        assert len(calls) <= 2, calls
        assert sum(calls) == 4

        # scores identical to solo scoring (deterministic zero noise)
        solo = orig(imgs[:1])
        assert results[0][0]["z_score_mse"] == pytest.approx(
            solo[0]["z_score_mse"], rel=1e-6
        )
    finally:
        svc.close()


def test_batching_rejects_oversize_and_propagates_errors(program):
    inner = ScoringService(_deterministic_program(program), _val_stats(program),
                           batch_size=4, model_name="t")
    svc = BatchingScoringService(inner, batch_window_ms=10.0)
    try:
        with pytest.raises(ValueError, match="batch"):
            svc.score(np.zeros((5, SIZE, SIZE, 1), "float32"))
        assert svc.score(np.zeros((0, SIZE, SIZE, 1), "float32")) == []

        # inner failure must reach every waiting caller, not hang them
        def boom(imgs):
            raise RuntimeError("device fell over")

        inner.score = boom
        with pytest.raises(RuntimeError, match="device fell over"):
            svc.score(np.zeros((1, SIZE, SIZE, 1), "float32"))
    finally:
        svc.close()


def test_batching_spills_requests_beyond_capacity(program):
    """5 x 1-image requests at batch_size 4: the 5th rides a SECOND sweep and
    still completes."""
    inner = ScoringService(_deterministic_program(program), _val_stats(program),
                           batch_size=4, model_name="t")
    calls = []
    orig = inner.score
    inner.score = lambda imgs: (calls.append(imgs.shape[0]), orig(imgs))[1]
    svc = BatchingScoringService(inner, batch_window_ms=300.0)
    try:
        imgs = np.random.default_rng(3).uniform(
            size=(5, SIZE, SIZE, 1)).astype("float32")
        results = [None] * 5
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(i, svc.score(imgs[i:i+1]))
            )
            for i in range(5)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None and len(r) == 1 for r in results)
        assert sum(calls) == 5
    finally:
        svc.close()


def test_warmup_program_precompiles_for_service_geometry():
    import argparse

    from ddpm_ood_tpu.serve import warmup_program

    def fresh():
        sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
        return ReconProgram(
            sched=sched,
            model_fn=jax.tree_util.Partial(lambda w, x, t: w * x, jnp.float32(0.1)),
            num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        )

    prog = fresh()
    args = argparse.Namespace(image_size=8, spatial_dimension=2, is_grayscale=1)
    secs = warmup_program(prog, args, batch_size=2)
    assert secs >= 0 and len(prog._compiled) == len(prog._groups)
    # roi-shaped geometry and an underivable one
    prog2 = fresh()
    args_roi = argparse.Namespace(image_size=None, image_roi=[8, 8], is_grayscale=1)
    assert warmup_program(prog2, args_roi, 2) >= 0
    assert len(prog2._compiled) == len(prog2._groups)
    args_none = argparse.Namespace(image_size=None, image_roi=None)
    assert warmup_program(fresh(), args_none, 2) == -1.0
    # the CLI leaves image_roi as a raw string — must parse, not iterate chars
    prog3 = fresh()
    args_str = argparse.Namespace(image_size=None, image_roi="[8,8]", is_grayscale=1)
    assert warmup_program(prog3, args_str, 2) >= 0
    assert len(prog3._compiled) == len(prog3._groups)


def test_sigterm_graceful_shutdown(tmp_path):
    """serve_forever exits cleanly on SIGTERM (rolling-restart contract)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from ddpm_ood_tpu.serve import serve_forever\n"
        "class S: model_name = 'sigterm_test'\n"
        "serve_forever(S(), host='127.0.0.1', port=0)\n"
        "print('CLEAN-EXIT')\n"
    ) % repo_root
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        # wait for the startup banner: only then is the handler registered
        line = proc.stdout.readline()
        assert "serving OOD scores" in line, line
        time.sleep(0.3)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "CLEAN-EXIT" in out and "shutting down" in out


def test_sharded_service_matches_unsharded(program):
    """shard_fn: the request batch GSPMD-sharded over an 8-virtual-device
    data mesh must produce the same per-image scores as the plain service
    (multi-chip serving is score-invisible)."""
    import functools

    from ddpm_ood_tpu.parallel.mesh import make_mesh, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    det = _deterministic_program(program)
    plain = ScoringService(det, _val_stats(program), batch_size=8,
                           model_name="t")
    det2 = _deterministic_program(program)
    sharded = ScoringService(det2, _val_stats(program), batch_size=8,
                             model_name="t",
                             shard_fn=functools.partial(shard_batch, mesh))
    imgs = np.random.default_rng(7).uniform(
        size=(5, SIZE, SIZE, 1)).astype("float32")
    a = plain.score(imgs)
    b = sharded.score(imgs)
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra["z_score_mse"], rb["z_score_mse"], rtol=1e-4, atol=1e-5)
        for t in ra["per_t"]:
            np.testing.assert_allclose(
                ra["per_t"][t]["mse"], rb["per_t"][t]["mse"],
                rtol=1e-4, atol=1e-6)


def test_warmup_with_shard_fn_precompiles_sharded_key(program):
    """warmup_program(shard_fn=...) must warm exactly the executables score()
    will hit: a sharded request after a sharded warmup adds no compile keys."""
    import functools
    from types import SimpleNamespace

    from ddpm_ood_tpu.parallel.mesh import make_mesh, shard_batch
    from ddpm_ood_tpu.serve import warmup_program

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    shard_fn = functools.partial(shard_batch, mesh)
    det = _deterministic_program(program)
    svc = ScoringService(det, _val_stats(program), batch_size=8,
                         model_name="t", shard_fn=shard_fn)
    args = SimpleNamespace(image_size=SIZE, spatial_dimension=2, is_grayscale=1)
    secs = warmup_program(det, args, 8, shard_fn=shard_fn)
    assert secs >= 0
    keys_after_warmup = set(det._compiled)
    svc.score(np.random.default_rng(3).uniform(
        size=(3, SIZE, SIZE, 1)).astype("float32"))
    assert set(det._compiled) == keys_after_warmup


def test_flag_fpr_decisions_and_drift_stat(program):
    """--flag_fpr: thresholds are the (1-fpr) quantile of the validation
    per-image mean-z distribution; responses carry is_ood/ood_flags; /statz
    reports the drift mean and the threshold table."""
    det = _deterministic_program(program)
    stats = _val_stats(program)
    svc = ScoringService(det, stats, batch_size=4, model_name="t",
                         flag_fpr=0.25)
    # validation mean-z distribution by hand: z per row against per-t
    # mean/std, mean per filename, 75th percentile
    mu = stats.groupby("t")["mse"].mean()
    sd = stats.groupby("t")["mse"].std() + 1e-12
    z = (stats["mse"] - stats["t"].map(mu)) / stats["t"].map(sd)
    per_img = z.groupby(stats["filename"]).mean()
    expect = float(np.quantile(per_img.to_numpy(), 0.75))
    assert svc.z_thresholds["mse"] == pytest.approx(expect)

    imgs = np.random.default_rng(5).uniform(
        size=(3, SIZE, SIZE, 1)).astype("float32")
    out = svc.score(imgs)
    for rec in out:
        assert rec["is_ood"] == (rec["z_score_mse"] > svc.z_thresholds["mse"])
        assert set(rec["ood_flags"]) == {"mse", "perceptual_difference"}
        assert isinstance(rec["is_ood"], bool)

    # drift stat + threshold table over HTTP
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_port}/statz"
        ) as resp:
            s = json.loads(resp.read())
        want = float(np.mean([r["z_score_mse"] for r in out]))
        assert s["mean_served_z_mse"] == pytest.approx(want, rel=1e-6)
        assert s["flag_fpr"] == pytest.approx(0.25)
        assert s["z_thresholds"]["mse"] == pytest.approx(expect)
        assert "z_mse_sum" not in s
    finally:
        server.shutdown()


def test_flag_fpr_out_of_range_rejected(program):
    """flag_fpr outside (0,1) must be rejected at construction."""
    with pytest.raises(ValueError, match="flag_fpr"):
        ScoringService(program, _val_stats(program), batch_size=4,
                       model_name="t", flag_fpr=1.5)


def test_drift_window_forgets_old_traffic(program):
    """/statz mean_served_z_mse is a WINDOWED mean: once the ring buffer
    (drift_window images) turns over, earlier traffic no longer contributes —
    unlike the lifetime mean, which is also reported."""
    det = _deterministic_program(program)
    svc = ScoringService(det, _val_stats(program), batch_size=4,
                         model_name="t", drift_window=4)
    rng = np.random.default_rng(7)
    old = svc.score(rng.uniform(size=(4, SIZE, SIZE, 1)).astype("float32"))
    new = svc.score(rng.uniform(size=(4, SIZE, SIZE, 1)).astype("float32"))
    old_z = [r["z_score_mse"] for r in old]
    new_z = [r["z_score_mse"] for r in new]
    assert np.mean(old_z) != pytest.approx(np.mean(new_z))  # task sanity

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_port}/statz"
        ) as resp:
            s = json.loads(resp.read())
        # window = 4: only the NEW batch remains
        assert s["mean_served_z_mse"] == pytest.approx(np.mean(new_z), rel=1e-6)
        assert s["drift_window"] == 4 and s["drift_window_filled"] == 4
        # the lifetime mean still covers all 8 images
        assert s["lifetime_mean_z_mse"] == pytest.approx(
            np.mean(old_z + new_z), rel=1e-6
        )
    finally:
        server.shutdown()


def test_drift_window_must_be_positive(program):
    with pytest.raises(ValueError, match="drift_window"):
        ScoringService(program, _val_stats(program), batch_size=4,
                       model_name="t", drift_window=0)


def test_bearer_token_auth(service):
    """With auth_token set: /healthz stays open (LB probes); every other
    endpoint requires `Authorization: Bearer <token>` and 401s otherwise."""
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(service, auth_token="sekrit")
    )
    port = server.server_port
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["status"] == "ok"

        for path, data in (("/statz", None), ("/score", b"x"), ("/reload", b"")):
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(
                    urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                           data=data)
                )
            assert e.value.code == 401, path
            assert "bearer" in e.value.read().decode().lower()

        wrong = urllib.request.Request(
            f"http://127.0.0.1:{port}/statz",
            headers={"Authorization": "Bearer nope"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(wrong)
        assert e.value.code == 401

        ok = urllib.request.Request(
            f"http://127.0.0.1:{port}/statz",
            headers={"Authorization": "Bearer sekrit"},
        )
        with urllib.request.urlopen(ok) as r:
            assert "mean_served_z_mse" in json.loads(r.read())

        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(3).uniform(
            size=(2, SIZE, SIZE, 1)).astype("float32"))
        scored = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=buf.getvalue(),
            headers={"Authorization": "Bearer sekrit"},
        )
        with urllib.request.urlopen(scored) as r:
            assert len(json.loads(r.read())["scores"]) == 2
    finally:
        server.shutdown()


def test_metricz_prometheus_exposition(program):
    """GET /metricz serves the ops stats in Prometheus text format (0.0.4):
    TYPE lines, counter/gauge values, and labeled z-threshold gauges."""
    det = _deterministic_program(program)
    svc = ScoringService(det, _val_stats(program), batch_size=4,
                         model_name="t", flag_fpr=0.25)
    svc.score(np.random.default_rng(9).uniform(
        size=(2, SIZE, SIZE, 1)).astype("float32"))

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_port}/metricz"
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        lines = text.strip().splitlines()
        metrics = {}
        for ln in lines:
            if ln.startswith("#"):
                continue
            name, value = ln.rsplit(" ", 1)
            metrics[name] = float(value)
        assert metrics["ddpm_ood_images_total"] == 2.0
        assert metrics["ddpm_ood_sweeps_total"] == 1.0
        assert metrics["ddpm_ood_device_seconds_total"] > 0
        assert "ddpm_ood_mean_served_z_mse" in metrics
        # labeled threshold gauges (flag_fpr set on this service)
        assert any(k.startswith('ddpm_ood_z_threshold{target="mse"}')
                   for k in metrics)
        # every sample has a TYPE declaration
        for ln in lines:
            if ln.startswith("#"):
                assert ln.startswith("# TYPE ddpm_ood_")
    finally:
        server.shutdown()


def test_metricz_requires_auth_when_token_set(service):
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(service, auth_token="sekrit")
    )
    port = server.server_port
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/metricz")
        assert e.value.code == 401
        ok = urllib.request.Request(
            f"http://127.0.0.1:{port}/metricz",
            headers={"Authorization": "Bearer sekrit"},
        )
        with urllib.request.urlopen(ok) as r:
            assert b"ddpm_ood_requests_total" in r.read()
    finally:
        server.shutdown()


def test_connection_burst_all_succeed(service):
    """A burst of concurrent single-image clients (the dynamic-batching usage
    pattern) must ALL be served: the stdlib default accept backlog of 5 reset
    overflowed connections (observed on chip at 32 concurrent clients) —
    make_server deepens it (_OODHTTPServer.request_queue_size)."""
    import io

    from ddpm_ood_tpu.serve import make_server

    server = make_server(service, "127.0.0.1", 0)
    assert type(server).request_queue_size >= 64
    port = server.server_port
    threading.Thread(target=server.serve_forever, daemon=True).start()
    n = 24
    results = [None] * n

    def one(i):
        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(i).uniform(
            size=(1, SIZE, SIZE, 1)).astype("float32"))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=buf.getvalue()
        )
        with urllib.request.urlopen(req) as r:
            results[i] = json.loads(r.read())

    try:
        threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(
            r is not None and len(r["scores"]) == 1 for r in results
        ), f"{sum(r is None for r in results)}/{n} requests dropped"
    finally:
        server.shutdown()
        server.server_close()
