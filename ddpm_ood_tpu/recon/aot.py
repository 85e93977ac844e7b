"""AOT-compiled sweep artifacts: serialize a ReconProgram's compiled
lane-group executables to one file and load them back with ZERO tracing and
ZERO XLA compilation.

Why: a serving cold start compiles one XLA program per lane group (16 at the
2D default). Through a remote-compile tunnel that costs ~130 s concurrent /
~206 s serial (scripts/bench_coldstart.py); even with a warm persistent
compile cache every restart still re-traces each group's scan-of-UNet program
before the cache can be consulted. The artifact skips both: a restart
deserializes the executables directly (jax.experimental.serialize_executable)
and the first request runs at warm latency.

Scope and pinning (checked at load, loud errors):
  - same jax version, same backend platform / device kind / device count as
    the saving process (the payload is a compiled XLA executable, not IR);
  - same sweep geometry: sampler, step grid, skip factor, lane grouping,
    score-column flags, batch shape. Weights are NOT baked in — the model's
    parameters are traced call-time inputs (sweep.py model_fn contract), so
    one artifact serves any checkpoint of the same architecture, including
    hot reloads (`POST /reload`). Precisely: the artifact bakes in the
    COMPUTATION (the traced model/encode/decode code); the local program's
    model_fn supplies only its bound weight pytree as call-time buffers. A
    local model_fn whose *code* differs from the saving process's is
    silently ignored in favor of the baked computation — ship the artifact
    next to the run directory it was compiled from.

Trust model: the artifact is a pickle (the serialized-executable container
format) — loading one executes its pickle stream, exactly like torch.load on
a .pth. Only load artifacts your own deployment wrote; they are cache files,
not an interchange format. (Reference checkpoints get the restricted
unpickler in utils/pth_reader.py; this file never loads third-party data.)

The reference has no analogue (it re-JITs nothing: eager torch); this is the
TPU-production counterpart of shipping a compiled binary next to the weights.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def artifact_path(prefix, sampler, num_inference_steps, skip, batch) -> str:
    """The canonical on-disk name for one sweep geometry's artifact:
    <prefix>.<sampler><steps>.skip<K>.b<B>.aot — the single source of truth
    referenced by the --aot_cache help text and trainers/reconstruct.py."""
    return (
        f"{prefix}.{sampler}{int(num_inference_steps)}"
        f".skip{int(skip)}.b{int(batch)}.aot"
    )


def _jaxlib_version() -> str:
    # the serialized executable depends on the jaxlib/XLA runtime, not just
    # the jax python package — pin both
    try:
        import jaxlib.version

        return jaxlib.version.__version__
    except Exception:  # pragma: no cover - ancient/absent jaxlib layouts
        return "unknown"


def _backend_fingerprint() -> Dict[str, Any]:
    devs = jax.devices()
    return {
        "jax_version": jax.__version__,
        "jaxlib_version": _jaxlib_version(),
        "platform": jax.default_backend(),
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
    }


def _program_fingerprint(program) -> Dict[str, Any]:
    """Everything BAKED into the traced group programs that the program
    object itself can see. The artifact serves the saved computation
    verbatim, so any of these differing at load time would silently serve
    wrong numerics — they are all checked. What the program CANNOT see
    (quantization mode, which is UNet construction; the exact model/encode/
    decode code) is the caller's to pin via `extra_fingerprint`."""
    import hashlib

    import numpy as np

    sched = program.sched
    sched_hash = hashlib.sha256(
        np.asarray(sched.betas, np.float64).tobytes()
        + np.asarray(sched.alphas_cumprod, np.float64).tobytes()
    ).hexdigest()[:16]
    return {
        "sampler": program.sampler,
        "num_inference_steps": int(program.num_inference_steps),
        "inference_skip_factor": int(program.inference_skip_factor),
        "b_scale": float(program.b_scale),
        "groups": [
            (int(ts.shape[0]), int(starts.shape[0]))
            for ts, starts in program._groups
        ],
        "score_elbo": bool(program.score_elbo),
        "score_ssim": bool(program.score_ssim),
        "score_error_maps": bool(program.score_error_maps),
        # covers beta family + range + T + SNR shift (all are schedule
        # tables) and the prediction-type tag the samplers branch on
        "sched_hash": sched_hash,
        "num_train_timesteps": int(sched.num_train_timesteps),
        "prediction_type": str(sched.prediction_type),
        "latent_pad": (
            None if not program.latent_pad else tuple(program.latent_pad)
        ),
        "pad_images_for_lpips": bool(program.pad_images_for_lpips),
        "has_encode": program.encode_fn is not None,
        "has_decode": program.decode_fn is not None,
        "has_perceptual": program.perceptual_fn is not None,
        "noise_mode": (
            "host" if program.host_noise_fn is not None
            else "device_simplex" if program.simplex_noise_fn is not None
            else "gaussian"
        ),
    }


def _example_arg(program, t_starts, batch: int):
    """The per-group non-image argument, shaped exactly like __call__'s:
    the (k, B, *latent) host-noise slice, or a split PRNG key."""
    if program.host_noise_fn is not None:
        if program.latent_sample_shape is None:
            raise ValueError("host_noise_fn requires latent_sample_shape")
        return jnp.zeros(
            (len(t_starts), batch) + tuple(program.latent_sample_shape),
            jnp.float32,
        )
    return jax.random.split(jax.random.PRNGKey(0))[0]


def save_compiled(
    program, path, example_images, extra_fingerprint: Dict[str, Any] = None
) -> Dict[str, Any]:
    """Compile (or reuse) every lane-group program for `example_images`'s
    shape/sharding and write one artifact file. Returns the metadata dict.

    `example_images` must be shaped (and, multi-device, sharded) exactly like
    the batches `__call__` will receive — same contract as `warmup()`.
    The save-side cost is the ordinary cold compile (amortized by the
    persistent compile cache); the payoff is every later `load_compiled`.

    `extra_fingerprint`: caller-known facts baked into the computation that
    the program object cannot see — above all the quantization mode (a
    quantized and an f32 UNet share the same param pytree, so nothing else
    distinguishes their artifacts). The CLIs pass {"quantize": ...}; loads
    must present the same dict or fail loudly.
    """
    from jax.experimental import serialize_executable

    if program.sampler == "plms_ref":
        raise ValueError(
            "AOT artifacts are not supported for sampler='plms_ref' (the "
            "bit-parity path is a single sequential program; use the "
            "production samplers)"
        )
    example_images = jnp.asarray(example_images)
    groups = []
    for ts_desc, t_starts in program._groups:
        arg = _example_arg(program, t_starts, int(example_images.shape[0]))
        # a fresh lower().compile() rather than the jit wrapper: Compiled
        # exposes the serializable executable, and the persistent cache (or a
        # prior warmup this process) makes it cheap
        compiled = program._build(ts_desc, t_starts).lower(
            program.model_fn, program.encode_fn, program.decode_fn,
            example_images, arg,
        ).compile()
        payload, _, out_tree = serialize_executable.serialize(compiled)
        # XLA executables compress well (~2-4x zlib); through the remote
        # tunnel the restart cost is upload-bandwidth-bound on the artifact
        # size (measured 541 MB raw for the 2D default — bench_aot.py), so
        # shrink the payload at save time
        import zlib

        raw_len = len(payload)
        payload = zlib.compress(payload, 3)
        # the executable is pinned to specific devices (a single-device jit
        # compiles for device 0; a GSPMD program for its mesh) — record them,
        # or deserialize_and_load defaults to ALL client devices and execution
        # fails with a shard-count mismatch on multi-device hosts
        dev_ids = set()
        for s in jax.tree_util.tree_leaves(compiled.input_shardings[0]):
            dev_ids |= {d.id for d in s.device_set}
        key = (
            int(ts_desc.shape[0]),
            int(t_starts.shape[0]),
            tuple(int(s) for s in example_images.shape),
        )
        groups.append({
            "key": key,
            "n_out": int(out_tree.num_leaves),
            "exec_device_ids": sorted(dev_ids),
            "codec": "zlib",
            "raw_len": raw_len,
            "payload": payload,
        })
        # the Compiled is callable with __call__'s argument list (the
        # multiprocess path stores the same), so saving doubles as warmup
        program._compiled[key] = compiled
    meta = {
        "format": FORMAT_VERSION,
        **_backend_fingerprint(),
        "program": _program_fingerprint(program),
        "extra": dict(extra_fingerprint or {}),
        "batch_shape": tuple(int(s) for s in example_images.shape),
        "image_dtype": str(example_images.dtype),
    }
    # atomic publish: concurrent restarts may save the same artifact; a
    # reader must never see a half-written file
    import os
    import tempfile

    path = os.fspath(path)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)) or ".",
        prefix=os.path.basename(path) + ".tmp.",
    )
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump({"meta": meta, "groups": groups}, f)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return meta


def _check(cond: bool, what: str, want, got) -> None:
    if not cond:
        raise ValueError(
            f"AOT artifact mismatch: {what} — artifact was saved with "
            f"{want!r}, this process has {got!r}. Re-save the artifact on "
            "this configuration (save_compiled / serve.py --aot_cache)."
        )


def load_compiled(
    program, path, example_images=None,
    extra_fingerprint: Dict[str, Any] = None,
) -> Dict[str, Any]:
    """Populate `program._compiled` from an artifact written by
    `save_compiled`, skipping all tracing and compilation. Returns the
    artifact metadata. Raises ValueError with the exact mismatch when the
    artifact does not fit this process (backend, jax version, sweep
    geometry) or this program (sampler/grid/score flags).

    `example_images` (optional) additionally pins the expected batch shape up
    front; otherwise shape errors surface on the first scoring call (the
    deserialized executables check their input shapes themselves).
    """
    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        blob = pickle.load(f)
    meta, groups = blob["meta"], blob["groups"]

    _check(meta["format"] == FORMAT_VERSION, "format", FORMAT_VERSION,
           meta["format"])
    fp = _backend_fingerprint()
    for k, v in fp.items():
        _check(meta.get(k) == v, k, meta.get(k), v)
    want = meta["program"]
    got = _program_fingerprint(program)
    for k, v in got.items():
        _check(want.get(k) == v, f"program.{k}", want.get(k), v)
    want_extra = meta.get("extra", {})
    got_extra = dict(extra_fingerprint or {})
    for k in sorted(set(want_extra) | set(got_extra)):
        _check(want_extra.get(k) == got_extra.get(k), f"extra.{k}",
               want_extra.get(k), got_extra.get(k))
    if example_images is not None:
        shape = tuple(int(s) for s in jnp.asarray(example_images).shape)
        _check(meta["batch_shape"] == shape, "batch_shape",
               meta["batch_shape"], shape)

    by_id = {d.id: d for d in jax.devices()}
    for (ts_desc, t_starts), entry in zip(program._groups, groups):
        missing = [i for i in entry["exec_device_ids"] if i not in by_id]
        _check(not missing, "exec_device_ids", entry["exec_device_ids"],
               sorted(by_id))
        # the executable only needs the flat buffer ORDER; the treedefs are
        # rebuilt from THIS process's model/encode/decode pytrees (they can't
        # be pickled — Partials close over functions) and are consistent with
        # every later __call__ by construction. The images and rng-or-noise
        # positions are single leaves, so plain 0 placeholders suffice — no
        # device allocation on the zero-compile fast path
        _, in_tree = jax.tree_util.tree_flatten((
            (program.model_fn, program.encode_fn, program.decode_fn, 0, 0),
            {},
        ))
        out_tree = jax.tree_util.tree_structure((0,) * entry["n_out"])
        payload = entry["payload"]
        if entry.get("codec") == "zlib":  # pre-r5 artifacts stored raw bytes
            import zlib

            payload = zlib.decompress(payload)
        program._compiled[tuple(entry["key"])] = (
            serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in entry["exec_device_ids"]],
            )
        )
    return meta


def load_or_save(
    program, path, example_images, extra_fingerprint: Dict[str, Any] = None
) -> Dict[str, Any]:
    """Serving helper: load the artifact if `path` exists and fits, else
    compile and (re)save it. Returns the metadata plus
    {"action": "loaded"|"saved"|"resaved: <why>"}.

    A mismatched artifact (sweep config changed, jax upgraded, different
    quantize mode) is a STALE CACHE, not an error: it is recompiled and
    overwritten, with the mismatch reported in the action string — a config
    change must never crash-loop a restart."""
    import os

    if os.path.exists(path):
        try:
            meta = load_compiled(program, path, example_images,
                                 extra_fingerprint)
            return {**meta, "action": "loaded"}
        # Exception, not just ValueError: a truncated/corrupt artifact raises
        # UnpicklingError/EOFError/KeyError, and deserialize_and_load can fail
        # on runtime incompatibilities the fingerprint missed. All of those
        # are stale caches here — recompile, never crash-loop the restart.
        except Exception as e:
            program._compiled.clear()  # drop any partially-loaded groups
            meta = save_compiled(program, path, example_images,
                                 extra_fingerprint)
            return {**meta,
                    "action": f"resaved: {type(e).__name__}: {e}"}
    meta = save_compiled(program, path, example_images, extra_fingerprint)
    return {**meta, "action": "saved"}
