"""Model registry: name → spec (builder, trainer recipe, defaults).

Behavior-compatible with the reference registry
(reference: orchestration/model_registry.py:21-98): exact match for
``efficientnet_b3`` and prefix matches for ``efficientformer*`` /
``faster_vit*``; builders construct nets with a fresh classification head
sized ``num_classes``.

The reference routes per-trainer hyperparameter deltas through three
near-duplicate trainer modules (SURVEY.md §2.3d). Here those deltas are data:
a ``TrainRecipe`` attached to each spec, consumed by one shared trainer.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class TrainRecipe:
    """Per-model training regime deltas (reference: SURVEY.md §2.3d).

    The shared shape everywhere: warmup phase training only the head at
    lr 3e-4 / wd 5e-2 (reference: trainers/efficientnet.py:70-71,440), then a
    fine-tune phase at lr 1e-4 / wd 5e-2 with cosine decay
    (efficientnet.py:492), label-smoothed CE (0.1), val-accuracy improvement
    threshold +1e-4, best/latest checkpointing, optional early stopping.
    """

    warmup_lr: float = 3e-4
    warmup_weight_decay: float = 5e-2
    finetune_lr: float = 1e-4
    finetune_weight_decay: float = 5e-2
    warmup_epochs: int = 1
    label_smoothing: float = 0.1
    improvement_threshold: float = 1e-4
    # Fine-tune gradient accumulation. The reference realizes this as a
    # micro-batch DataLoader + loss/accum_steps (efficientnet.py:84-86,477-485,
    # fastervit.py:437-439 hardcodes 32x4). On TPU we fold micro-batches into
    # one device batch when memory allows, else lax.scan accumulation; the
    # effective batch (micro * accum) is what matters for parity.
    finetune_micro_batch: int | None = None  # None => keep configured batch
    accum_steps: int = 1
    accum_steps_overridable: bool = True  # fastervit.py:437-439 ignores ACCUM_STEPS
    # Which params the warmup head-only phase trains, by name substring
    # (efficientnet.py:435-437 "_fc"; fastervit.py:400-402 "head").
    head_param_substrings: tuple[str, ...] = ("head",)
    # Fine-tune unfreeze policy: "all", or a tuple of name substrings
    # (efficientformer_v2.py:66-74 UNFREEZE_KEYS semantics).
    unfreeze: str | tuple[str, ...] = "all"
    early_stop_patience: int | None = 4  # None => disabled (efficientformer)
    # ColorJitter strengths (brightness, contrast, saturation, hue):
    # (0.2,0.2,0.2,0.05) for EfficientNet (efficientnet.py:180) vs
    # (0.1,0.1,0.1,0.05) for the other two (fastervit.py:172).
    color_jitter: tuple[float, float, float, float] = (0.1, 0.1, 0.1, 0.05)
    # Default transform toggles layered under user config (SURVEY.md §2.3c):
    # EfficientNet defaults rotation/jitter/erasing ON for large images
    # (efficientnet.py:135-137); FasterViT & EfficientFormer default
    # rotation/erasing OFF (fastervit.py:127-129, efficientformer_v2.py:109-111).
    default_train_toggles: dict[str, bool] = field(default_factory=dict)


@dataclass(frozen=True)
class ModelSpec:
    """Registry entry (reference: model_registry.py:21-29)."""

    name: str
    family: str  # "efficientnet" | "efficientformerv2" | "fastervit"
    variant: str
    weights_key: str
    default_image_size: int
    recipe: TrainRecipe
    # builder(num_classes, **kw) -> (flax Module, default input size)
    builder: Callable[..., Any]


def _build_efficientnet(num_classes: int, variant: str = "b3", **kw: Any):
    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    return create_efficientnet(variant, num_classes=num_classes, **kw)


def _build_efficientformer(num_classes: int, variant: str = "s1", **kw: Any):
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    return create_efficientformer_v2(variant, num_classes=num_classes, **kw)


def _build_fastervit(num_classes: int, variant: str = "2", **kw: Any):
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    return create_faster_vit(variant, num_classes=num_classes, **kw)


def _efficientformer_variant(name: str) -> str:
    """'efficientformerv2_s1' / 'efficientformer_v2_l' → 's1'/'l'.

    The reference forwards the full name to timm (model_registry.py:39-40),
    which RAISES for unknown variants — a silent default would build the
    wrong architecture and then strict=False weight loading would hide the
    mismatch as near-chance metrics."""
    tail = name.rsplit("_", 1)[-1].lower()
    if tail in ("s0", "s1", "s2", "l"):
        return tail
    if tail in ("l1", "l3", "l7"):
        raise KeyError(
            f"'{name}' is an EfficientFormer V1 model; this framework "
            "implements V2 (efficientformerv2_{s0,s1,s2,l}) — the family the "
            "reference fine-tunes (trainers/efficientformer_v2.py:327)"
        )
    raise KeyError(
        f"unknown EfficientFormerV2 variant in '{name}' "
        "(known: s0, s1, s2, l)"
    )


def _fastervit_variant(name: str) -> str:
    """'faster_vit_2_224' → '2' (the wheel registers faster_vit_{0..4}_224,
    fastervit.py:371, and raises for anything else — so do we)."""
    import re

    m = re.match(r"faster_vit_(\d)", name)
    if m and m.group(1) in "01234":
        return m.group(1)
    raise KeyError(
        f"unknown FasterViT variant in '{name}' (known: faster_vit_0..4, the wheel's registry)"
    )


_EFFICIENTNET_RECIPE = TrainRecipe(
    finetune_micro_batch=32,
    accum_steps=4,
    accum_steps_overridable=True,
    head_param_substrings=("classifier", "_fc", "fc"),
    unfreeze="all",
    early_stop_patience=4,
    color_jitter=(0.2, 0.2, 0.2, 0.05),
    # No toggle overrides: the reference's EfficientNet defaults are exactly
    # the regime-gated base (rotation/jitter/erasing = not small_images,
    # efficientnet.py:128-144) — unconditional True here would wrongly enable
    # them for img_size<=64 where the reference never applies them.
    default_train_toggles={},
)

_EFFICIENTFORMER_RECIPE = TrainRecipe(
    finetune_micro_batch=None,
    accum_steps=1,
    head_param_substrings=("head",),
    # reference UNFREEZE_KEYS (efficientformer_v2.py:66-74); mapped onto this
    # implementation's parameter naming (stage 4 + final norm + heads).
    unfreeze=("stages_3", "blocks_3", "norm_out", "head"),
    early_stop_patience=None,
    color_jitter=(0.1, 0.1, 0.1, 0.05),
    # rotation/erasing unconditionally off (efficientformer_v2.py:109-111);
    # jitter inherits the base's regime gate (not small_images).
    default_train_toggles={
        "train_random_rotation": False,
        "train_random_erasing": False,
    },
)

_FASTERVIT_RECIPE = TrainRecipe(
    finetune_micro_batch=32,
    accum_steps=4,
    accum_steps_overridable=False,  # fastervit.py:437-439
    head_param_substrings=("head",),
    unfreeze="all",
    early_stop_patience=4,
    color_jitter=(0.1, 0.1, 0.1, 0.05),
    # rotation/erasing unconditionally off (fastervit.py:127,129); jitter
    # inherits the base's regime gate (not small_images).
    default_train_toggles={
        "train_random_rotation": False,
        "train_random_erasing": False,
    },
)

_EXACT: dict[str, ModelSpec] = {
    "efficientnet_b3": ModelSpec(
        name="efficientnet_b3",
        family="efficientnet",
        variant="b3",
        weights_key="efficientnet_b3",
        default_image_size=224,
        recipe=_EFFICIENTNET_RECIPE,
        builder=_build_efficientnet,
    ),
}


def get_model_spec(name: str) -> ModelSpec:
    """Resolve a model name to its spec.

    Matching rules mirror reference model_registry.py:78-98: exact match for
    efficientnet_b3, prefix matches for efficientformer* and faster_vit*.
    """
    if name in _EXACT:
        return _EXACT[name]
    if name.startswith("efficientformer"):
        variant = _efficientformer_variant(name)
        return ModelSpec(
            name=name,
            family="efficientformerv2",
            variant=variant,
            weights_key=name,
            default_image_size=224,
            recipe=_EFFICIENTFORMER_RECIPE,
            builder=functools.partial(_build_efficientformer, variant=variant),
        )
    if name.startswith("faster_vit"):
        variant = _fastervit_variant(name)
        return ModelSpec(
            name=name,
            family="fastervit",
            variant=variant,
            weights_key=name,
            default_image_size=224,
            recipe=_FASTERVIT_RECIPE,
            builder=functools.partial(_build_fastervit, variant=variant),
        )
    raise KeyError(
        f"Unknown model '{name}'. Known: efficientnet_b3, efficientformer*, faster_vit*"
    )
