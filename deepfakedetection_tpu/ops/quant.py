"""Opt-in int8 eval quantization for the conv backbones.

The eval step is HBM-traffic-bound (docs/BENCHMARKS.md: the deep-stage
depthwise+SE fusions hold 29 ms of the 50 ms B3 step at 44-233 GB/s), so
halving activation bytes is worth more than the MXU's 2x int8 peak. This
module quantizes the ConvBN eval path:

- **activations**: per-layer static symmetric scales from a calibration pass
  (absmax of each ConvBN input over a few real batches / 127). Static scales
  let XLA fuse the quantize chain (scale->round->clip->convert) into the
  *producer* fusion's epilogue, so the tensor crosses HBM once as int8
  instead of bf16 — the whole point. Dynamic per-batch scales would need an
  extra full read of the tensor and were rejected by that arithmetic.
- **weights**: per-output-channel symmetric int8, quantized at trace time
  from the BN-folded weights (no calibration needed; loop-invariant under
  the bench scan, and a small cost vs activation traffic in an eval call).
- **conv**: int8 x int8 -> int32 accumulation (``preferred_element_type``),
  f32 epilogue ``acc * (sx * sw_c) + b`` then the usual activation.

Scales travel OUTSIDE the model tree (a contextvar holding plain floats
baked into the trace as constants), so checkpoints, torch conversion maps,
and the zero-unmatched parity tests are untouched. The reference has no
quantized path (CUDA AMP fp16 only, trainers/efficientnet.py:296) — this is
an additive TPU-native serving mode, opt-in via ``inference.precision:
int8`` / ``bench.py --int8``, never default, with the accuracy delta
measured by the calibration-equipped eval job.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses

import jax
import jax.numpy as jnp

_QUANT_CTX: contextvars.ContextVar["QuantCtx | None"] = contextvars.ContextVar(
    "dfd_quant_ctx", default=None
)

_LEAF = "act_absmax"  # sow name for calibration probes


@dataclasses.dataclass(frozen=True)
class QuantCtx:
    """Active int8-eval configuration (trace-time constants).

    ``scales`` maps "/".join(module path) -> activation scale (absmax/127).
    ``default_scale`` serves layers missing from the map (and the perf probe,
    which runs with a uniform dummy scale — throughput is scale-independent).
    ``calibrate`` switches ConvBN to a full-precision pass that sows per-layer
    input absmax into the "intermediates" collection instead of quantizing.
    """

    scales: dict[str, float] | None = None
    default_scale: float | None = None
    calibrate: bool = False
    include_depthwise: bool = True

    def scale_for(self, path: tuple[str, ...]) -> float | None:
        key = "/".join(path)
        if self.scales is not None and key in self.scales:
            return float(self.scales[key])
        return self.default_scale


def current_ctx() -> QuantCtx | None:
    return _QUANT_CTX.get()


@contextlib.contextmanager
def quantized_eval(ctx: QuantCtx):
    token = _QUANT_CTX.set(ctx)
    try:
        yield
    finally:
        _QUANT_CTX.reset(token)


def quantize_weight_per_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 HWIO weights -> (int8 weights, f32 per-out-channel scale [O])."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    sw = jnp.maximum(absmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127.0, 127.0).astype(jnp.int8)
    return wq, sw


def quantize_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """bf16/f32 activations -> int8 with the given static symmetric scale."""
    inv = jnp.float32(1.0 / scale)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0).astype(
        jnp.int8
    )


def int8_conv(
    x: jnp.ndarray,
    w_folded: jnp.ndarray,
    bias: jnp.ndarray,
    act_scale: float,
    strides,
    padding,
    dn,
    groups: int,
) -> jnp.ndarray:
    """Quantized conv with f32 output: dequant epilogue ``acc*(sx*sw)+b``.

    ``w_folded``/``bias`` are the BN-folded f32 weights/bias ConvBN already
    computes for its eval path (models/common.py); the int8 path slots in
    behind them so folding, padding grids, and head semantics are identical.
    """
    xq = quantize_act(x, act_scale)
    wq, sw = quantize_weight_per_channel(w_folded)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=padding,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sw * jnp.float32(act_scale)) + bias


def collect_calibration_absmax(intermediates) -> dict[str, float]:
    """Flatten a sown "intermediates" tree -> {module path: absmax}."""
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    out: dict[str, float] = {}
    for keypath, leaf in flat:
        names: list[str] = []
        for k in keypath:
            name = getattr(k, "key", None)
            if name is None:
                name = getattr(k, "idx", None)
            if isinstance(name, str):
                names.append(name)
        if _LEAF not in names:
            continue
        path = "/".join(n for n in names if n != _LEAF)
        val = float(jax.device_get(leaf))
        out[path] = max(out.get(path, 0.0), val)
    return out


def calibrate_act_scales(
    model,
    params,
    batch_stats,
    batches,
    *,
    include_depthwise: bool = True,
) -> dict[str, float]:
    """Run full-precision eval over ``batches`` (bf16 [B,S,S,3] arrays),
    collecting per-ConvBN input absmax -> activation scales (absmax/127).

    Max-over-batches calibration; a handful of batches suffices because the
    post-BN activation ranges are stable across inputs.
    """

    @jax.jit
    def probe(params, batch_stats, images):
        _, inter = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=False,
            mutable=["intermediates"],
        )
        return inter["intermediates"] if "intermediates" in inter else inter

    absmax: dict[str, float] = {}
    with quantized_eval(QuantCtx(calibrate=True, include_depthwise=include_depthwise)):
        for images in batches:
            inter = probe(params, batch_stats, images)
            for path, val in collect_calibration_absmax(inter).items():
                absmax[path] = max(absmax.get(path, 0.0), val)
    return {path: max(val, 1e-6) / 127.0 for path, val in absmax.items()}
