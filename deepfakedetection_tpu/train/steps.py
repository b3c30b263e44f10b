"""Jitted train/eval steps.

The reference's eager hot loop (H2D copy → autocast fwd → scaled bwd → step,
trainers/efficientnet.py:265-333) becomes ONE compiled XLA program:
``train_step(state, images, labels, mask, key) -> (state, metrics)``, traced
once per phase, donated state, bf16 compute (no GradScaler — bf16 needs no
loss scaling, a documented delta from CUDA AMP). Under a multi-device mesh
the same program is data-parallel: batches arrive sharded over the "data"
axis and GSPMD inserts gradient/metric all-reduces over ICI.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from deepfakedetection_tpu.train.objectives import accuracy_count, smoothed_cross_entropy


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def init_model_variables(model, rng, input_shape: tuple[int, ...]):
    """Initialize {params, batch_stats} with a jitted init (fast tracing)."""

    @jax.jit
    def _init(key):
        return model.init(
            {"params": key}, jnp.zeros(input_shape, jnp.float32), train=False
        )

    variables = _init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return params, batch_stats


def make_train_step_fn(
    model, tx, *, label_smoothing: float = 0.1, remat: bool = False, mixup=None,
    class_weights=None,
):
    """The raw (unjitted) train step — reusable inside lax.scan (bench).

    ``remat=True`` wraps the forward in jax.checkpoint: activations are
    recomputed in the backward pass, trading ~30% step FLOPs for activation
    memory (lets much larger per-chip batches fit HBM).

    ``mixup`` (a train.mixup.MixupSpec, TPU extension, off by default) mixes
    each batch with its roll-by-one partner on device; the loss becomes
    ``lam*CE(y) + (1-lam)*CE(roll(y))``.

    ``class_weights`` ([C] floats, TPU extension ``training.class_weights``)
    weights the CE by target class (objectives.smoothed_cross_entropy);
    under mixup each of the two CE terms is weighted by its own labels.
    """
    mix_enabled = mixup is not None and mixup.enabled
    cw = (
        jnp.asarray(class_weights, jnp.float32)
        if class_weights is not None
        else None
    )

    def train_step(state: TrainState, images, labels, mask, key):
        step_key = jax.random.fold_in(key, state.step)
        k_drop, k_path = jax.random.split(step_key)
        if mix_enabled:
            from deepfakedetection_tpu.train.mixup import mix_batch

            k_mix = jax.random.fold_in(step_key, 0x303)  # distinct PRNG domain
            images, lam = mix_batch(k_mix, images, mixup)
            labels_b = jnp.roll(labels, shift=1, axis=0)

        def forward(params, images):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop, "droppath": k_path},
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            outputs, mutated = forward(params, images)
            loss = smoothed_cross_entropy(
                outputs, labels, mask, label_smoothing=label_smoothing,
                class_weights=cw,
            )
            if mix_enabled:
                loss_b = smoothed_cross_entropy(
                    outputs, labels_b, mask, label_smoothing=label_smoothing,
                    class_weights=cw,
                )
                loss = lam * loss + (1.0 - lam) * loss_b
            return loss, (mutated["batch_stats"], outputs)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        correct, total = accuracy_count(logits, labels, mask)
        metrics = {"loss": loss, "correct": correct, "total": total}
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def train_compiler_options() -> dict | None:
    """XLA overrides for the train step (TPU only; None elsewhere).

    Measured on v5e (docs/BENCHMARKS.md ledger): a 32 MiB scoped-VMEM
    budget lets XLA build larger backward fusions in the conv/BN-heavy
    steps — B3 train 2,153 → 2,225 img/s (+3.4%); EFv2 and official
    FasterViT neutral (same-day A/Bs); 64 MiB regresses. Eval keeps the
    compiler default (measured neutral-to-negative).
    ``DFD_TRAIN_SCOPED_VMEM_KIB`` overrides the budget (0 disables).
    """
    import os

    raw = os.environ.get("DFD_TRAIN_SCOPED_VMEM_KIB", "32768")
    try:
        kib = int(raw)
    except ValueError as exc:
        raise ValueError(
            f"DFD_TRAIN_SCOPED_VMEM_KIB must be an integer, got {raw!r}"
        ) from exc
    if kib <= 0:
        return None
    # the option only exists in the TPU compiler; CPU (tests) and GPU
    # backends hard-reject unknown compile options
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def make_train_step(
    model, tx, *, label_smoothing: float = 0.1, remat: bool = False, mixup=None,
    class_weights=None,
):
    """Build the donated, jitted train step for one phase."""
    step = make_train_step_fn(
        model, tx, label_smoothing=label_smoothing, remat=remat, mixup=mixup,
        class_weights=class_weights,
    )
    return jax.jit(step, donate_argnums=(0,), compiler_options=train_compiler_options())


def recalibrate_bn(model, params, batch_stats, batch_iter, key):
    """Precise-BN recalibration: replace running statistics with pooled
    fresh statistics over the given batches.

    Short fine-tunes never converge running stats at momentum 0.99 (the
    reference inherits the same lag); this computes exact per-batch stats
    (momentum-0 trace → mutated stats == batch stats) and pools them:
    mean = E[mean_k], var = E[var_k] + Var[mean_k].
    """
    from deepfakedetection_tpu.models.common import bn_momentum_override

    with bn_momentum_override(0.0):

        @jax.jit
        def stats_step(params, batch_stats, images, k):
            k1, k2 = jax.random.split(k)
            _, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k1, "droppath": k2},
            )
            return mutated["batch_stats"]

        sum_tree = None
        sum_sq_mean = None
        count = 0
        for i, images in enumerate(batch_iter):
            fresh = stats_step(params, batch_stats, images, jax.random.fold_in(key, i))
            if sum_tree is None:
                sum_tree = fresh
                sum_sq_mean = jax.tree.map(lambda x: x * x, fresh)
            else:
                sum_tree = jax.tree.map(jnp.add, sum_tree, fresh)
                sum_sq_mean = jax.tree.map(
                    lambda acc, x: acc + x * x, sum_sq_mean, fresh
                )
            count += 1
    if count == 0:
        return batch_stats

    avg = jax.tree.map(lambda s: s / count, sum_tree)
    avg_sq = jax.tree.map(lambda s: s / count, sum_sq_mean)

    # walk scopes: each BN scope holds exactly {mean, var}; var leaves get
    # the between-batch mean-variance correction
    def _correct(avg_node, avg_sq_node):
        if isinstance(avg_node, dict):
            out = {}
            if set(avg_node.keys()) >= {"mean", "var"} and not isinstance(
                avg_node["mean"], dict
            ):
                mean_avg = avg_node["mean"]
                out["mean"] = mean_avg
                out["var"] = avg_node["var"] + (avg_sq_node["mean"] - mean_avg * mean_avg)
                for k in avg_node:
                    if k not in ("mean", "var"):
                        out[k] = _correct(avg_node[k], avg_sq_node[k])
                return out
            return {k: _correct(avg_node[k], avg_sq_node[k]) for k in avg_node}
        return avg_node

    plain = jax.device_get(avg)
    plain_sq = jax.device_get(avg_sq)
    import flax

    avg_dict = flax.core.unfreeze(plain) if hasattr(plain, "unfreeze") else plain
    sq_dict = flax.core.unfreeze(plain_sq) if hasattr(plain_sq, "unfreeze") else plain_sq
    return _correct(avg_dict, sq_dict)


def make_ema_update(decay: float, *, warmup: bool = True):
    """Jitted exponential-moving-average update of a param tree.

    TPU-framework training extension (absent from the reference): when
    ``training.ema_decay`` is set, the trainer maintains
    ``ema = d*ema + (1-d)*params`` after every optimizer step and
    evaluates/exports the averaged weights. The EMA tree is donated so the
    update runs in place (one extra read+write of the param bytes per step).

    ``warmup=True`` ramps the effective decay as
    ``d_t = min(decay, (1+t)/(10+t))`` (the standard timm ModelEMA ramp):
    without it a production decay like 0.999 keeps the average pinned near
    its seed for ~1/(1-decay) steps, which silently breaks short fine-tunes
    — exactly the regime the reference's recipes target.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(ema, params, step):
        d = jnp.asarray(decay, jnp.float32)
        if warmup:
            t = step.astype(jnp.float32)
            d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
        return jax.tree.map(
            lambda e, p: (d * e.astype(jnp.float32)
                          + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            ema, params,
        )

    return update


def make_eval_step(model, tta: str | None = None):
    """Jitted eval step returning f32 softmax probs (reference computes
    softmax then argmax/threshold on host, orchestrator.py:589-607).

    ``tta="hflip"`` (TPU extension, off by default = reference behavior)
    averages softmax probabilities over the image and its horizontal flip —
    the classic test-time augmentation; ~2× eval compute for a small
    accuracy gain. NHWC layout: width is axis 2.
    """

    def probs_of(params, batch_stats, images):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    @jax.jit
    def eval_step(params, batch_stats, images):
        p = probs_of(params, batch_stats, images)
        if tta == "hflip":
            p = 0.5 * (p + probs_of(params, batch_stats, images[:, :, ::-1, :]))
        return p

    return eval_step


