"""Profile one train/eval step on the TPU and itemize device ops.

Wraps the bench.py step construction in ``jax.profiler.trace`` and parses
the perfetto trace directly (no tensorboard): in this environment the TPU
device lanes are pid 3 with tid 1/2/3 = Steps/Modules/Ops, and op events
carry ``bytes_accessed`` + ``device_duration_ps`` → achieved GB/s.

Usage:
    python tools/profile_step.py --model faster_vit_2_224 --official \
        --mode train --batch 128 --steps 5 [--top 40] [--keep-trace DIR]

Prints a per-step summary (device step time, op-lane busy fraction) and the
top-N op groups by total time/step with achieved bandwidth where reported.
Group key: the op name with trailing ``.<digits>`` / ``_<digits>`` stripped,
so the 2,405 loop fusions of a B3 step land in a handful of rows.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(args):
    """Return (run_one_step, state) closures mirroring bench.py's setup."""
    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_eval_step,
        make_train_step_fn,
    )

    kwargs = {"head_config": "official"} if args.official else {}
    spec = get_model_spec(args.model)
    model = spec.builder(2, dtype=jnp.bfloat16, **kwargs)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, args.img_size, args.img_size, 3)
    )
    base = jnp.ones((args.batch, args.img_size, args.img_size, 3), jnp.bfloat16)

    if args.mode == "train":
        tx, _, _ = make_phase_optimizer(
            params, lr=1e-4, weight_decay=5e-2, trainable=lambda _: True
        )
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )
        step_fn = jax.jit(make_train_step_fn(model, tx))
        labels = jnp.zeros((args.batch,), jnp.int32)
        mask = jnp.ones((args.batch,), bool)
        key = jax.random.key(1)

        def run(state, i):
            x = base + jnp.bfloat16(i * 1e-6)
            state, metrics = step_fn(state, x, labels, mask, key)
            return state, metrics["loss"]

        return run, state

    eval_step = make_eval_step(model)

    def run(state, i):
        x = base + jnp.bfloat16(i * 1e-6)
        probs = eval_step(params, batch_stats, x)
        return state, probs.sum()

    return run, None


def parse_trace(trace_dir: str, steps: int, top: int) -> None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        print(f"no trace file found under {trace_dir}", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])

    # identify the TPU pid: the process whose thread names include "XLA Ops"
    tid_names: dict[tuple, str] = {}
    pid_names: dict[int, str] = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "thread_name":
                tid_names[(ev.get("pid"), ev.get("tid"))] = ev["args"]["name"]
            elif ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev["args"]["name"]
    ops_lane = [k for k, v in tid_names.items() if "XLA Ops" in v]
    mod_lane = [k for k, v in tid_names.items() if "XLA Modules" in v]
    if not ops_lane:
        print("no 'XLA Ops' lane in trace; lanes:", sorted(set(tid_names.values())))
        return

    op_events = [
        ev
        for ev in events
        if ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) in ops_lane
    ]
    mod_events = [
        ev
        for ev in events
        if ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) in mod_lane
    ]

    # several modules execute per step (e.g. jit_train_step + tiny key-fold
    # programs) — the step count and step time come from the DOMINANT module
    mod_groups: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    for ev in mod_events:
        g = mod_groups[ev.get("name", "?")]
        g[0] += ev.get("dur", 0)
        g[1] += 1
    if mod_groups:
        dom_name, (dom_us, dom_n) = max(mod_groups.items(), key=lambda kv: kv[1][0])
    else:
        dom_name, dom_us, dom_n = "?", 0.0, steps
    n_steps = dom_n or steps or 1
    module_us = sum(ev.get("dur", 0) for ev in mod_events)
    ops_us = sum(ev.get("dur", 0) for ev in op_events)
    busy = (ops_us / module_us * 100.0) if module_us else float("nan")
    print(
        f"device step: {dom_us / n_steps / 1e3:.2f} ms "
        f"({dom_name.split('(')[0]} × {n_steps}) | op-lane busy {busy:.1f}%"
    )

    shape_re = re.compile(r"(?:bf16|f32|s8|s32|u8)\[([0-9,]+)\]")

    def largest_shape(long_name: str) -> str:
        shapes = shape_re.findall(long_name)
        if not shapes:
            return ""

        def size(s: str) -> int:
            n = 1
            for t in s.split(","):
                n *= int(t)
            return n

        return max(shapes, key=size)

    groups: dict[tuple, dict] = collections.defaultdict(
        lambda: {"us": 0.0, "n": 0, "bytes": 0.0, "flops": 0.0}
    )
    for ev in op_events:
        arg = ev.get("args") or {}
        cat = arg.get("hlo_category", "?")
        key = (cat, largest_shape(arg.get("long_name", "")))
        g = groups[key]
        g["us"] += ev.get("dur", 0)
        g["n"] += 1
        for field, slot in (("bytes_accessed", "bytes"), ("model_flops", "flops")):
            v = arg.get(field)
            if v is not None:
                try:
                    g[slot] += float(v)
                except (TypeError, ValueError):
                    pass

    rows = sorted(groups.items(), key=lambda kv: -kv[1]["us"])[:top]
    print(
        f"{'ms/step':>9} {'inst/step':>9} {'GB/s':>7} {'TFLOP/s':>8}"
        "  category [largest shape]"
    )
    for (cat, shape), g in rows:
        ms = g["us"] / n_steps / 1e3
        inst = g["n"] / n_steps
        gbs = (g["bytes"] / (g["us"] * 1e-6) / 1e9) if g["us"] and g["bytes"] else 0.0
        tfs = (g["flops"] / (g["us"] * 1e-6) / 1e12) if g["us"] and g["flops"] else 0.0
        print(f"{ms:9.3f} {inst:9.1f} {gbs:7.0f} {tfs:8.1f}  {cat} [{shape}]")

    # ---- experimental throughput bound (B3-floor methodology, round 5) ----
    # If every matmul-class segment ran at the achieved-FLOP/s of its best
    # IN-TRACE peer OF COMPARABLE ARITHMETIC INTENSITY — not a theoretical
    # peak, a rate a sibling op on this chip demonstrably sustains at a
    # similar FLOP/byte ratio — how fast could the step go? Intensity
    # classing keeps the comparison fair: a depthwise conv at 3 FLOP/byte
    # can never run at a dense 7x7x2304 conv's rate, and pretending it
    # could would fabricate headroom. Peers must sit within 4x intensity
    # of the group they bound (and carry >=1% of MXU time, else noisy).
    mxu_cats = ("convolution fusion", "convolution")
    mxu = {k: g for k, g in groups.items() if k[0] in mxu_cats and g["flops"]}
    if mxu:
        total_mxu_us = sum(g["us"] for g in mxu.values())
        total_mxu_flops = sum(g["flops"] for g in mxu.values())

        def intensity(g):
            return g["flops"] / max(g["bytes"], 1.0)

        candidates = [
            g for g in mxu.values() if g["us"] >= 0.01 * total_mxu_us
        ]
        # dual-resource roofline per group, both rails from IN-TRACE peers:
        # a group cannot finish faster than its bytes at the best achieved
        # bandwidth NOR its FLOPs at the best intensity-comparable achieved
        # MXU rate — the binding rail is the max of the two times. Without
        # the bandwidth rail, low-intensity (traffic-dominated) convs would
        # be "bounded" at rates their byte traffic provably forbids.
        peer_bw = max(
            (c["bytes"] / (c["us"] * 1e-6) for c in candidates if c["bytes"]),
            default=0.0,
        )
        bound_mxu_us = 0.0
        for g in mxu.values():
            mine = intensity(g)
            peers = [
                c["flops"] / (c["us"] * 1e-6)
                for c in candidates
                if mine / 4.0 <= intensity(c) <= mine * 4.0
            ] + [g["flops"] / (g["us"] * 1e-6)]
            t_flop = g["flops"] / max(peers) * 1e6
            t_bw = (g["bytes"] / peer_bw * 1e6) if peer_bw else 0.0
            bound_mxu_us += max(t_flop, t_bw)
        step_us = dom_us / n_steps
        seg_us = total_mxu_us / n_steps
        bound_step_us = step_us - seg_us + bound_mxu_us / n_steps
        print(
            f"\nMXU-segment bound: {seg_us/1e3:.2f} ms/step at "
            f"{total_mxu_flops/(total_mxu_us*1e-6)/1e12:.1f} TFLOP/s achieved; "
            f"intensity-classed peer rates → segment floor "
            f"{bound_mxu_us/n_steps/1e3:.2f} ms/step"
        )
        print(
            f"step bound: {bound_step_us/1e3:.2f} ms "
            f"(measured {step_us/1e3:.2f} ms → bound/measured = "
            f"{bound_step_us/step_us*100:.1f}%)"
        )


def main() -> None:
    from deepfakedetection_tpu.runtime.compile_cache import enable as enable_cache

    enable_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet_b3")
    p.add_argument("--mode", choices=["train", "eval"], default="train")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--official", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--keep-trace", default=None, help="trace dir (default: tmp)")
    args = p.parse_args()

    run, state = build_step(args)
    state, out = run(state, 0)  # compile + warm outside the trace
    float(out)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="dfd_profile_")
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    for i in range(1, args.steps + 1):
        state, out = run(state, i)
    float(out)  # completion barrier: fetch a VALUE (see bench.py docstring)
    jax.profiler.stop_trace()
    print(f"trace: {trace_dir}")
    parse_trace(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
