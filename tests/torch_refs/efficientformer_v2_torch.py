"""Minimal PyTorch EfficientFormerV2 with timm's module naming and forward
semantics — an independent executable spec of the reference consumer
(trainers/efficientformer_v2.py:327 `timm.create_model("efficientformerv2_s1")`).

Used by tests/test_cross_framework.py to cross-check the Flax model + weight
converter: the SAME state dict loads into both (strict=True here, so any
name-map drift fails loudly), and logits must agree on identical inputs.
Forward-only, eval-mode, no drop paths.
"""

from __future__ import annotations

import itertools
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvNorm(nn.Module):
    def __init__(self, cin, cout, ks=1, stride=1, padding=0, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, padding, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class Stem(nn.Module):
    """timm Stem4: conv1/act/conv2/act."""

    def __init__(self, cout):
        super().__init__()
        self.conv1 = ConvNorm(3, cout // 2, 3, 2, 1)
        self.conv2 = ConvNorm(cout // 2, cout, 3, 2, 1)

    def forward(self, x):
        return F.gelu(self.conv2(F.gelu(self.conv1(x))))


class ConvMlpWithNorm(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = ConvNorm(dim, hidden, 1)
        self.mid = ConvNorm(hidden, hidden, 3, 1, 1, groups=hidden)
        self.fc2 = ConvNorm(hidden, dim, 1)

    def forward(self, x):
        return self.fc2(F.gelu(self.mid(F.gelu(self.fc1(x)))))


class LayerScale2d(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma.view(1, -1, 1, 1)


def _bias_index(h, w):
    """slot = |dy|*w + |dx| over row-major token pairs (timm encoding)."""
    pts = list(itertools.product(range(h), range(w)))
    idx = [abs(a[0] - b[0]) * w + abs(a[1] - b[1]) for a in pts for b in pts]
    return torch.tensor(idx, dtype=torch.long).view(len(pts), len(pts))


class Attention2d(nn.Module):
    def __init__(self, dim, resolution, stride=None, key_dim=32, num_heads=8, attn_ratio=4):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.d = int(attn_ratio * key_dim)
        self.dh = self.d * num_heads
        self.scale = key_dim ** -0.5
        self.stride = stride
        if stride is not None:
            resolution = math.ceil(resolution / stride)
            self.stride_conv = ConvNorm(dim, dim, 3, stride, 1, groups=dim)
        self.resolution = resolution
        self.q = ConvNorm(dim, key_dim * num_heads, 1)
        self.k = ConvNorm(dim, key_dim * num_heads, 1)
        self.v = ConvNorm(dim, self.dh, 1)
        self.v_local = ConvNorm(self.dh, self.dh, 3, 1, 1, groups=self.dh)
        self.talking_head1 = nn.Conv2d(num_heads, num_heads, 1)
        self.talking_head2 = nn.Conv2d(num_heads, num_heads, 1)
        self.proj = nn.Sequential(nn.GELU(), ConvNorm(self.dh, dim, 1))
        n = resolution * resolution
        self.attention_biases = nn.Parameter(torch.zeros(num_heads, n))
        self.register_buffer(
            "attention_bias_idxs", _bias_index(resolution, resolution), persistent=False
        )

    def forward(self, x):
        B, C, H0, W0 = x.shape
        if self.stride is not None:
            x = self.stride_conv(x)
        B, C, H, W = x.shape
        N = H * W
        q = self.q(x).reshape(B, self.num_heads, self.key_dim, N).permute(0, 1, 3, 2)
        k = self.k(x).reshape(B, self.num_heads, self.key_dim, N)
        v = self.v(x)
        v_local = self.v_local(v)
        v = v.reshape(B, self.num_heads, self.d, N).permute(0, 1, 3, 2)
        attn = (q @ k) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs].unsqueeze(0)
        attn = self.talking_head1(attn)
        attn = attn.softmax(dim=-1)
        attn = self.talking_head2(attn)
        out = (attn @ v).transpose(2, 3).reshape(B, self.dh, H, W) + v_local
        if self.stride is not None:
            out = F.interpolate(out, size=(H0, W0), mode="bilinear", align_corners=False)
        return self.proj(out)


class LocalGlobalQuery(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pool = nn.AvgPool2d(1, 2, 0)
        self.local = nn.Conv2d(cin, cin, 3, 2, 1, groups=cin)
        self.proj = ConvNorm(cin, cout, 1)

    def forward(self, x):
        return self.proj(self.local(x) + self.pool(x))


class Attention2dDownsample(nn.Module):
    def __init__(self, dim, out_dim, resolution, key_dim=16, num_heads=8, attn_ratio=4):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.d = int(attn_ratio * key_dim)
        self.dh = self.d * num_heads
        self.scale = key_dim ** -0.5
        self.resolution = resolution
        self.q = LocalGlobalQuery(dim, key_dim * num_heads)
        self.k = ConvNorm(dim, key_dim * num_heads, 1)
        self.v = ConvNorm(dim, self.dh, 1)
        self.v_local = ConvNorm(self.dh, self.dh, 3, 2, 1, groups=self.dh)
        self.proj = nn.Sequential(nn.GELU(), ConvNorm(self.dh, out_dim, 1))
        H = resolution
        Ho = H // 2
        pts_q = list(itertools.product(range(Ho), range(Ho)))
        pts_k = list(itertools.product(range(H), range(H)))
        idx = [
            abs(a[0] * 2 - b[0]) * H + abs(a[1] * 2 - b[1])
            for a in pts_q
            for b in pts_k
        ]
        self.attention_biases = nn.Parameter(torch.zeros(num_heads, H * H))
        self.register_buffer(
            "attention_bias_idxs",
            torch.tensor(idx, dtype=torch.long).view(len(pts_q), len(pts_k)),
            persistent=False,
        )

    def forward(self, x):
        B, C, H, W = x.shape
        Ho, Wo = H // 2, W // 2
        Nq, Nk = Ho * Wo, H * W
        q = self.q(x).reshape(B, self.num_heads, self.key_dim, Nq).permute(0, 1, 3, 2)
        k = self.k(x).reshape(B, self.num_heads, self.key_dim, Nk)
        v = self.v(x)
        v_local = self.v_local(v)
        v = v.reshape(B, self.num_heads, self.d, Nk).permute(0, 1, 3, 2)
        attn = (q @ k) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs].unsqueeze(0)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(2, 3).reshape(B, self.dh, Ho, Wo) + v_local
        return self.proj(out)


class Downsample(nn.Module):
    def __init__(self, cin, cout, resolution, use_attn=False):
        super().__init__()
        self.conv = ConvNorm(cin, cout, 3, 2, 1)
        self.attn = (
            Attention2dDownsample(cin, cout, resolution) if use_attn else None
        )

    def forward(self, x):
        out = self.conv(x)
        if self.attn is not None:
            return self.attn(x) + out
        return out


class Block(nn.Module):
    def __init__(self, dim, mlp_ratio, resolution, stride=None, use_attn=False):
        super().__init__()
        if use_attn:
            self.token_mixer = Attention2d(dim, resolution, stride=stride)
            self.ls1 = LayerScale2d(dim)
        else:
            self.token_mixer = None
        self.mlp = ConvMlpWithNorm(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale2d(dim)

    def forward(self, x):
        if self.token_mixer is not None:
            x = x + self.ls1(self.token_mixer(x))
        return x + self.ls2(self.mlp(x))


class Stage(nn.Module):
    def __init__(self, cin, dim, depth, ratios, resolution, downsample, downsample_attn, use_attn, num_vit, block_stride):
        super().__init__()
        self.downsample = (
            Downsample(cin, dim, resolution, use_attn=downsample_attn)
            if downsample
            else nn.Identity()
        )
        res = resolution // 2 if downsample else resolution
        blocks = []
        for b in range(depth):
            attn_here = use_attn and b > depth - 1 - num_vit
            blocks.append(
                Block(dim, ratios[b], res, stride=block_stride if attn_here else None,
                      use_attn=attn_here)
            )
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(self.downsample(x))


# timm's width/depth/vit_num/expansion tables (efficientformer_v2.py)
_CONFIGS = {
    "s1": {
        "dims": (32, 48, 120, 224),
        "depths": (3, 3, 9, 6),
        "num_vit": 2,
        "e_ratios": {
            0: [4, 4, 4],
            1: [4, 4, 4],
            2: [4, 4, 3, 3, 3, 3, 4, 4, 4],
            3: [4, 4, 3, 3, 4, 4],
        },
    },
    "s2": {
        "dims": (32, 64, 144, 288),
        "depths": (4, 4, 12, 8),
        "num_vit": 4,
        "e_ratios": {
            0: [4, 4, 4, 4],
            1: [4, 4, 4, 4],
            2: [4, 4, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4],
            3: [4, 4, 3, 3, 3, 3, 4, 4],
        },
    },
}


class EfficientFormerV2S1(nn.Module):
    """efficientformerv2_s1 @ 224px, timm layout (``variant`` selects other
    configs from the same parameterized module)."""

    def __init__(self, num_classes=2, variant="s1"):
        super().__init__()
        cfg = _CONFIGS[variant]
        dims, depths = cfg["dims"], cfg["depths"]
        e_ratios, num_vit = cfg["e_ratios"], cfg["num_vit"]
        self.stem = Stem(dims[0])
        stages = []
        res = 56  # 224 / 4
        for s in range(4):
            stages.append(
                Stage(
                    dims[max(s - 1, 0)], dims[s], depths[s], e_ratios[s],
                    resolution=res,
                    downsample=s > 0,
                    downsample_attn=s >= 2,
                    use_attn=s >= 2,
                    num_vit=num_vit,
                    block_stride=2 if s == 2 else None,
                )
            )
            if s > 0:
                res //= 2
        self.stages = nn.Sequential(*stages)
        self.norm = nn.BatchNorm2d(dims[-1])
        self.head = nn.Linear(dims[-1], num_classes)
        self.head_dist = nn.Linear(dims[-1], num_classes)

    def forward(self, x):
        x = self.stages(self.stem(x))
        x = self.norm(x)
        x = x.mean(dim=(2, 3))
        return (self.head(x) + self.head_dist(x)) / 2.0
