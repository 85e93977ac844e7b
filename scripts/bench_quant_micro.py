#!/usr/bin/env python
"""Microbenchmark decomposing the int8 sweep speedup (BASELINE.md: 1.086x).

Times three variants of the same channel-last convolution at a sweep-hot
shape, each as a 20-iteration `lax.scan` (one dispatch, like the sweep):

  bf16     — nn.Conv-equivalent lax conv in bf16 (the f32-sweep compute path)
  int8dyn  — ops/quant.py:qconv verbatim: dynamic absmax quant of x + w,
             s8 x s8 -> s32 conv, f32 dequant (what --quantize=int8 runs)
  int8pre  — the s8 conv + dequant only, inputs/weights quantized OUTSIDE
             the timed loop (upper bound for static-calibration scales)

If int8pre ~= 2x bf16 but int8dyn ~= 1.1x, the dynamic absmax+round passes
are the cost and a calibration pass is worth building; if int8pre itself is
~1x, XLA/this chip isn't running the conv on the s8 MXU path and calibration
would buy nothing.

Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--hw", type=int, default=16)
    p.add_argument("--cin", type=int, default=256)
    p.add_argument("--cout", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ddpm_ood_tpu.ops.quant import qconv, quantize_int8, _channel_last_dn

    backend = jax.default_backend()
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (args.batch, args.hw, args.hw, args.cin), jnp.bfloat16)
    w = (jax.random.normal(kw, (3, 3, args.cin, args.cout), jnp.float32) * 0.05)
    dn = _channel_last_dn(4)

    flops = 2 * args.batch * args.hw * args.hw * 9 * args.cin * args.cout

    def conv_bf16(xi):
        return lax.conv_general_dilated(
            xi, w.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=dn)

    def conv_int8_dyn(xi):
        return qconv(xi, w, None).astype(jnp.bfloat16)

    wq, sw = quantize_int8(w, axes=(0, 1, 2))
    xq0, sx0 = quantize_int8(x)

    def conv_int8_pre(xqi):
        out = lax.conv_general_dilated(
            xqi, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * (sx0 * sw)

    def scan_of(fn, requant):
        def body(carry, _):
            y = fn(carry)
            # keep shape/type closed: re-derive the next input from the output
            if requant == "bf16":
                nxt = y[..., : args.cin].astype(jnp.bfloat16)
            elif requant == "f32":
                nxt = y[..., : args.cin].astype(jnp.bfloat16)
            else:  # int8: requantize outside the timed semantics is impossible
                nxt = jnp.clip(jnp.round(y[..., : args.cin]), -127, 127).astype(jnp.int8)
            return nxt, ()

        def run(x0):
            out, _ = lax.scan(body, x0, None, length=args.iters)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(run)

    cases = [
        ("bf16", scan_of(conv_bf16, "bf16"), x),
        ("int8dyn", scan_of(conv_int8_dyn, "f32"), x),
        ("int8pre", scan_of(conv_int8_pre, "int8"), xq0),
    ]

    results = {}
    for name, fn, x0 in cases:
        fn(x0).block_until_ready()  # compile
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        tflops = flops * args.iters / best / 1e12
        results[name] = (best, tflops)
        print(json.dumps({
            "bench": "quant_micro", "variant": name, "backend": backend,
            "shape": [args.batch, args.hw, args.hw, args.cin, args.cout],
            "iters": args.iters, "best_s": round(best, 5),
            "tflops": round(tflops, 1),
            "vs_bf16": round(results["bf16"][0] / best, 3),
        }))


if __name__ == "__main__":
    main()
