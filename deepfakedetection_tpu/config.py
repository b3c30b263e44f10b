"""YAML configuration surface.

Behavior-compatible with the reference schema
(reference: orchestration/config_schema.py:8-89) — same keys, same defaults,
same validation rules (non-empty ``models:``, ``selection`` defaulting to all
models and rejecting unknown names) — plus TPU-specific extensions that the
reference has no analogue for (``mesh``, ``precision``, ``profile_dir``).

Unknown keys are tolerated everywhere except ``data`` where they are ignored,
mirroring config_schema.py:10,23,35,47,59.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml
from pydantic import BaseModel, ConfigDict, field_validator, model_validator


class DataConfig(BaseModel):
    model_config = ConfigDict(extra="ignore")

    root: str
    train_split: str = "train"
    val_split: str = "val"
    test_split: str = "test"
    num_classes: int = 2
    img_size: int = 224
    class_labels: dict[str, str] | None = None


class InferenceConfig(BaseModel):
    model_config = ConfigDict(extra="allow")

    weights: str | None = None
    split: str | None = None
    batch_size: int = 64
    num_workers: int = 4
    img_size: int | None = None
    transforms: dict[str, Any] | None = None
    # TPU extension: per-model eval numerics — "bf16" (default) or "int8"
    # (calibrated quantized ConvBN path, ops/quant.py; opt-in serving mode)
    precision: str | None = None
    # TPU extension: int8 activation-range statistic — "absmax" (default),
    # "percentile" (clip outliers at int8_percentile of |x|), or
    # "per-channel" (per-input-channel absmax folded into the weights)
    int8_calibration: str | None = None
    int8_percentile: float | None = None
    # TPU extension: test-time augmentation — None (default) or "hflip"
    # (average softmax probs over the horizontal flip; ~2x eval compute)
    tta: str | None = None
    # TPU extension: probability calibration — None (default) or
    # "temperature" (fit T on the val pass, report calibrated test
    # probabilities + ECE in metrics.jsonl; evaluate/metrics.py)
    calibration: str | None = None
    # TPU extension (serve.py): binary decision threshold — a float in
    # [0, 1], or "auto" to read the newest eval sweep's choice from the
    # model's run dirs. Ignored by the batch-eval job (which sweeps).
    threshold: float | str | None = None

    @field_validator("threshold")
    @classmethod
    def _threshold_valid(cls, value):
        if value is None:
            return value
        if isinstance(value, str):
            if value.lower() != "auto":
                raise ValueError(
                    f"inference.threshold must be a float in [0,1] or 'auto', got {value!r}"
                )
            return value.lower()
        if not 0.0 <= float(value) <= 1.0:
            raise ValueError(f"inference.threshold must be in [0,1], got {value}")
        return float(value)

    @field_validator("precision")
    @classmethod
    def _eval_precision_supported(cls, value: str | None) -> str | None:
        if value is None:
            return value
        allowed = ("bfloat16", "bf16", "int8", "i8")
        if str(value).lower() not in allowed:
            raise ValueError(
                f"inference.precision must be one of {allowed}, got {value!r}"
            )
        return value

    @field_validator("int8_calibration")
    @classmethod
    def _int8_calibration_supported(cls, value: str | None) -> str | None:
        allowed = ("absmax", "percentile", "per-channel")
        if value is not None and str(value).lower() not in allowed:
            raise ValueError(
                f"inference.int8_calibration must be one of {allowed}, got {value!r}"
            )
        return value

    @field_validator("int8_percentile")
    @classmethod
    def _int8_percentile_valid(cls, value: float | None) -> float | None:
        if value is not None and not 0.5 <= float(value) <= 1.0:
            raise ValueError(
                f"inference.int8_percentile must be in [0.5, 1], got {value}"
            )
        return value

    @field_validator("tta")
    @classmethod
    def _tta_supported(cls, value: str | None) -> str | None:
        if value is not None and str(value).lower() not in ("hflip",):
            raise ValueError(f"inference.tta must be 'hflip' or null, got {value!r}")
        return value

    @field_validator("calibration")
    @classmethod
    def _calibration_supported(cls, value: str | None) -> str | None:
        if value is not None and str(value).lower() not in ("temperature",):
            raise ValueError(
                f"inference.calibration must be 'temperature' or null, got {value!r}"
            )
        return value


class TrainingConfig(BaseModel):
    model_config = ConfigDict(extra="allow")

    batch_size: int = 64
    epochs: int = 10
    num_workers: int = 4
    img_size: int | None = None
    transforms: dict[str, Any] | None = None
    resume: str | bool | None = None
    # TPU extension: start the fine-tune from pretrained backbone weights
    # (torch .pth — converted on load — or native msgpack); the fresh head
    # is kept where shapes differ, matching the reference's from_pretrained
    # + head-swap semantics. None = random init.
    init_weights: str | None = None
    # TPU extension: override the recipe's fine-tune unfreeze policy —
    # "all", or name substrings (the reference's UNFREEZE_KEYS semantics,
    # efficientformer_v2.py:66-74, hardcoded per trainer there). E.g.
    # unfreeze: [head] is a linear probe over init_weights. None = recipe.
    unfreeze: str | list[str] | None = None
    # TPU extension: exponential moving average of the fine-tune weights
    # (None = off = reference behavior); see train/loop.py TrainJob.ema_decay
    ema_decay: float | None = None
    # TPU extension: global-norm gradient clipping (None = off = reference)
    grad_clip_norm: float | None = None
    # TPU extension: Mixup/CutMix batch mixing (0 = off = reference)
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    # TPU extension: class-weighted CE for imbalanced data — "auto"
    # (sklearn-"balanced" N/(C·count_c) from the train split) or per-class
    # floats in alphabetical class order. None = unweighted = reference.
    class_weights: str | list[float] | None = None

    @field_validator("class_weights")
    @classmethod
    def _class_weights_valid(cls, value):
        if value is None:
            return value
        if isinstance(value, str):
            if value.lower() != "auto":
                raise ValueError(
                    f"class_weights must be 'auto' or a list of positive floats, got {value!r}"
                )
            return value.lower()
        weights = [float(v) for v in value]
        if not weights or any(not w > 0.0 for w in weights):
            raise ValueError(f"class_weights must all be > 0, got {value!r}")
        return weights

    @field_validator("mixup_alpha", "cutmix_alpha")
    @classmethod
    def _mix_alpha_non_negative(cls, value: float) -> float:
        if value < 0.0:
            raise ValueError(f"mixup/cutmix alpha must be >= 0, got {value}")
        return value

    @field_validator("ema_decay")
    @classmethod
    def _ema_decay_in_unit_interval(cls, value: float | None) -> float | None:
        if value is not None and not (0.0 < value < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {value}")
        return value

    @field_validator("grad_clip_norm")
    @classmethod
    def _grad_clip_norm_positive(cls, value: float | None) -> float | None:
        if value is not None and not value > 0.0:
            raise ValueError(f"grad_clip_norm must be > 0, got {value}")
        return value


class ModelConfig(BaseModel):
    model_config = ConfigDict(extra="allow")

    output_dir: str | None = None
    transforms: dict[str, Any] | None = None
    training: TrainingConfig | None = None
    inference: InferenceConfig | None = None
    display_name: str | None = None
    label: str | None = None


class MeshConfig(BaseModel):
    """TPU extension: device-mesh layout for jax.sharding.

    ``data`` × ``model`` must not exceed the available device count; -1 for
    ``data`` means "all remaining devices". The reference is single-device
    (SURVEY.md §2.x) so the default mesh is data=-1, model=1 which degrades
    to single-chip behavior on one device.
    """

    model_config = ConfigDict(extra="allow")

    data: int = -1
    model: int = 1


class EnsembleConfig(BaseModel):
    """TPU extension: combine the selected models' softmax probabilities
    after inference (weighted mean; threshold re-swept on the ensemble's
    val distribution — evaluate/ensemble.py). The reference evaluates each
    model independently and never combines them."""

    model_config = ConfigDict(extra="allow")

    enabled: bool = True
    weights: dict[str, float] | None = None
    output_dir: str | None = None  # default runs/ensemble

    @field_validator("weights")
    @classmethod
    def _weights_positive(cls, value: dict[str, float] | None):
        if value is not None:
            bad = {k: v for k, v in value.items() if not float(v) > 0.0}
            if bad:
                raise ValueError(f"ensemble.weights must be > 0, got {bad}")
        return value


class OrchestratorConfig(BaseModel):
    model_config = ConfigDict(extra="allow")

    seed: int | None = None
    device: str | None = None
    data: DataConfig
    models: dict[str, ModelConfig]
    selection: list[str] | None = None
    # TPU extensions (absent from the reference YAML surface; optional).
    mesh: MeshConfig | None = None
    precision: str = "bfloat16"
    profile_dir: str | None = None
    # ensemble: true (uniform) or {enabled, weights, output_dir}
    ensemble: EnsembleConfig | bool | None = None

    @field_validator("models")
    @classmethod
    def _models_must_be_non_empty(cls, value: dict[str, ModelConfig]) -> dict[str, ModelConfig]:
        if not value:
            raise ValueError("config.models cannot be empty")
        return value

    @field_validator("precision")
    @classmethod
    def _precision_supported(cls, value: str) -> str:
        allowed = ("bfloat16", "bf16", "float32", "fp32")
        if str(value).lower() not in allowed:
            raise ValueError(f"precision must be one of {allowed}, got {value!r}")
        return value

    @model_validator(mode="after")
    def _resolve_selection(self) -> OrchestratorConfig:
        if self.selection is None:
            self.selection = list(self.models.keys())
        else:
            unknown = [m for m in self.selection if m not in self.models]
            if unknown:
                raise ValueError(
                    f"selection references unknown models: {', '.join(unknown)}"
                )
        if isinstance(self.ensemble, EnsembleConfig) and self.ensemble.weights:
            unknown = [m for m in self.ensemble.weights if m not in self.models]
            if unknown:
                raise ValueError(
                    f"ensemble.weights references unknown models: {', '.join(unknown)}"
                )
        return self


def load_config(path: str | Path) -> dict[str, Any]:
    """Load + validate a YAML config, returning a plain dict.

    Mirrors reference orchestrator.py:112-125: yaml.safe_load then pydantic
    validation then dump back to a dict so downstream code is schema-agnostic.
    """
    path = Path(path)
    with path.open("r", encoding="utf-8") as fh:
        raw = yaml.safe_load(fh) or {}
    validated = OrchestratorConfig(**raw)
    return validated.model_dump(exclude_none=False)
