"""Minimal PyTorch EfficientNet-B3 with efficientnet_pytorch's module naming
and forward semantics — an independent executable spec of the reference
consumer (trainers/efficientnet.py:405 ``EfficientNet.from_pretrained``,
model_registry.py:32-36 swaps ``_fc``).

Used by tests/test_cross_framework.py: the SAME state dict loads into this
model (module-name-strict) AND converts into the Flax model, then logits on
identical inputs must agree. Covers the flagship family's converter, the
TF-SAME asymmetric padding grid, BN eps 1e-3, SE-from-block-input sizing,
and the expand→depthwise→SE→project op order. Forward-only, eval-mode.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# (expand_ratio, channels, repeats, stride, kernel) — base (B0) stages,
# same table as models/efficientnet.py:_BASE_BLOCKS
_BASE_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _make_divisible(value: float, divisor: int = 8) -> int:
    new_value = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


class SamePadConv2d(nn.Conv2d):
    """TF-style SAME padding FROZEN from the construction-time ``image_size``
    trace (efficientnet_pytorch Conv2dStaticSamePadding — what
    ``from_pretrained`` builds, with image_size = the variant's native 300
    for B3). The frozen pads apply verbatim at ANY runtime size; at 224 the
    two k5/stride-2 convs pad (2,2) where dynamic SAME would give (1,2)."""

    def __init__(self, *args, image_size: int, **kwargs):
        super().__init__(*args, **kwargs)
        kh, kw = self.weight.shape[-2:]

        def amount(size, kernel, stride):
            out = math.ceil(size / stride)
            return max((out - 1) * stride + kernel - size, 0)

        ph = amount(image_size, kh, self.stride[0])
        pw = amount(image_size, kw, self.stride[1])
        self._static_pad = [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2]

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        if any(self._static_pad):
            x = F.pad(x, self._static_pad)
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


class MBConvBlock(nn.Module):
    """efficientnet_pytorch MBConvBlock naming: _expand_conv/_bn0,
    _depthwise_conv/_bn1, _se_reduce/_se_expand, _project_conv/_bn2."""

    def __init__(self, cin, cout, expand, kernel, stride, image_size, se_ratio=0.25):
        super().__init__()
        mid = cin * expand
        self.has_expand = expand != 1
        if self.has_expand:
            self._expand_conv = SamePadConv2d(cin, mid, 1, bias=False, image_size=image_size)
            self._bn0 = nn.BatchNorm2d(mid, eps=1e-3)
        self._depthwise_conv = SamePadConv2d(
            mid, mid, kernel, stride=stride, groups=mid, bias=False,
            image_size=image_size,
        )
        self._bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        se_ch = max(1, int(cin * se_ratio))  # sized from the BLOCK input
        self._se_reduce = SamePadConv2d(mid, se_ch, 1, image_size=1)
        self._se_expand = SamePadConv2d(se_ch, mid, 1, image_size=1)
        self._project_conv = SamePadConv2d(mid, cout, 1, bias=False, image_size=image_size)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3)
        self.skip = stride == 1 and cin == cout

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        inp = x
        if self.has_expand:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        se = x.mean(dim=(2, 3), keepdim=True)
        se = self._se_expand(F.silu(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.skip:
            x = x + inp  # no drop-connect in eval
        return x


# (width, depth, native resolution) — efficientnet_pytorch's compound
# scaling table; pads freeze from the native resolution like from_pretrained
_SCALING = {
    "b0": (1.0, 1.0, 224),
    "b1": (1.0, 1.1, 240),
    "b2": (1.1, 1.2, 260),
    "b3": (1.2, 1.4, 300),
}


def efficientnet_variant(variant: str, num_classes: int = 2) -> "EfficientNetB3":
    """Any supported variant through the same parameterized module
    (EfficientNetB3 is the width/depth/trace-parameterized class)."""
    width, depth, res = _SCALING[variant]
    return EfficientNetB3(
        num_classes=num_classes, width=width, depth=depth, image_size=res
    )


class EfficientNetB3(nn.Module):
    """B3 (width 1.2, depth 1.4) with a swapped ``_fc`` head
    (model_registry.py:32-36). Other variants via ``efficientnet_variant``."""

    def __init__(
        self, num_classes: int = 2, width: float = 1.2, depth: float = 1.4,
        image_size: int = 300,  # B3 native resolution: pads freeze from here
    ):
        super().__init__()

        def rf(c):  # round_filters
            return _make_divisible(c * width, 8)

        def rr(r):  # round_repeats
            return int(math.ceil(depth * r))

        stem = rf(32)
        trace = image_size
        self._conv_stem = SamePadConv2d(3, stem, 3, stride=2, bias=False, image_size=trace)
        self._bn0 = nn.BatchNorm2d(stem, eps=1e-3)
        trace = math.ceil(trace / 2)
        blocks = []
        cin = stem
        for expand, channels, repeats, stride, kernel in _BASE_BLOCKS:
            cout = rf(channels)
            for rep in range(rr(repeats)):
                s = stride if rep == 0 else 1
                blocks.append(
                    MBConvBlock(cin, cout, expand, kernel, s, image_size=trace)
                )
                if s > 1:
                    trace = math.ceil(trace / s)
                cin = cout
        self._blocks = nn.ModuleList(blocks)
        head = rf(1280)
        self._conv_head = SamePadConv2d(cin, head, 1, bias=False, image_size=trace)
        self._bn1 = nn.BatchNorm2d(head, eps=1e-3)
        self._fc = nn.Linear(head, num_classes)
        # parameter-free Grad-CAM hook point: the post-BN+SiLU head feature
        # map — the torch-side analogue of the flax model's
        # sow("intermediates", "cam_features") (efficientnet.py:234)
        self._cam_point = nn.Identity()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = F.silu(self._bn0(self._conv_stem(x)))
        for block in self._blocks:
            x = block(x)
        x = self._cam_point(F.silu(self._bn1(self._conv_head(x))))
        x = x.mean(dim=(2, 3))
        return self._fc(x)
