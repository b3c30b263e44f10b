"""Microbench: v2 window-attention fwd+bwd (Pallas vs XLA) at FasterViT-2
official shapes. Times a value-fetched lax.scan loop like bench.py.

Stage shapes at batch 128, 224px (official d=48; trace-confirmed in the
round-3 profile, docs/BENCHMARKS.md):
- HAT stage (14² map, window 7 → 4 windows/img): [512, 53, 3·384], h=8
- plain stage (7² map, one window): [128, 49, 3·768], h=16
The shapes below use a 4× larger HAT batch to amortize per-call dispatch
overhead through the relay — see the microbench caveat in BENCHMARKS.md:
isolated per-call numbers are dominated by the relay dispatch floor, so
only end-to-end bench.py A/Bs decide adoption.
Usage: python tools/bench_window_bwd.py [--bw N]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.ops.attention import (
    window_mhsa_qkv_pallas,
    window_mhsa_xla,
)


def timed_grad(fn, args, steps=20):
    # loss = sum(out^2): DENSE data-dependent cotangent — sum(out) would let
    # XLA constant-fold the ones-cotangent backward (P^T @ ones = rowsum)
    # and report an unrealistically fast grad step
    g = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))))
    out = g(*args)
    jax.block_until_ready(out)
    # value fetch barrier
    float(jnp.sum(jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out.sum() if hasattr(out, "sum") else out)))
    t0 = time.perf_counter()
    for i in range(steps):
        out = g(*args)
    s = float(np.asarray(jnp.sum(out[0].astype(jnp.float32)) if isinstance(out, tuple) else jnp.sum(out.astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / steps
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bw", type=int, default=4, help="backward block_windows")
    args = ap.parse_args()

    import deepfakedetection_tpu.ops.pallas.window_attn as wa

    # pin block_windows on BOTH Pallas backwards — the dispatcher defaults to
    # the sliced (v5) backward, so patching only the masked v2 one would make
    # --bw a silent no-op unless DFD_WINATTN_BWD=masked is also set
    for attr in ("fused_window_attention_v2_bwd", "fused_window_attention_v5_bwd"):
        orig = getattr(wa, attr)

        def patched(qkv, bias, dout, *, _orig=orig, **kw):
            kw["block_windows"] = args.bw
            return _orig(qkv, bias, dout, **kw)

        setattr(wa, attr, functools.wraps(orig)(patched))

    for name, B, N, h, d in (("stage2", 2048, 53, 8, 48), ("stage3", 128, 49, 16, 48)):
        C = h * d
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
        scale = d ** -0.5

        def pallas_fn(qkv_in):
            return window_mhsa_qkv_pallas(qkv_in, bias, num_heads=h, scale=scale)

        def xla_fn(qkv_in):
            q = qkv_in[:, :, 0:C].reshape(B, N, h, d)
            k = qkv_in[:, :, C : 2 * C].reshape(B, N, h, d)
            v = qkv_in[:, :, 2 * C : 3 * C].reshape(B, N, h, d)
            return window_mhsa_xla(q, k, v, bias, scale=scale)

        for label, fn in (("pallas", pallas_fn), ("xla", xla_fn)):
            # forward-only timing
            f = jax.jit(lambda a, _fn=fn: jnp.sum(jnp.square(_fn(a).astype(jnp.float32))))
            float(f(qkv))
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(qkv)
            float(np.asarray(out))
            fwd_dt = (time.perf_counter() - t0) / 20
            dt, s = timed_grad(fn, (qkv,))
            print(
                f"{name} {label:7s} bw={args.bw}: fwd {fwd_dt * 1e3:7.2f} ms | "
                f"grad {dt * 1e3:8.2f} ms ({B / dt:9.0f} win/s)  "
                f"checksum={s:.3e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
