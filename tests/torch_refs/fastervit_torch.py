"""Minimal PyTorch FasterViT-2-224 with the official wheel's module naming
and forward semantics (reference consumer: trainers/fastervit.py:371
`fastervit.create_model("faster_vit_2_224")`, layer_scale=None,
do_propagation=False).

Used by tests/test_cross_framework.py: the SAME state dict loads into this
and (converted) into the Flax official-mode model; logits must agree.
Forward-only, eval-mode.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    """timm channels-first LayerNorm (eps 1e-6)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, x.shape[-1:], self.weight, self.bias, eps=1e-6)
        return x.permute(0, 3, 1, 2)


class PatchEmbed(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.conv_down = nn.Sequential(
            nn.Conv2d(3, in_dim, 3, 2, 1, bias=False),
            nn.BatchNorm2d(in_dim, eps=1e-4),
            nn.ReLU(),
            nn.Conv2d(in_dim, dim, 3, 2, 1, bias=False),
            nn.BatchNorm2d(dim, eps=1e-4),
            nn.ReLU(),
        )

    def forward(self, x):
        return self.conv_down(x)


class ConvBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, dim, 3, 1, 1)
        self.norm1 = nn.BatchNorm2d(dim, eps=1e-5)
        self.conv2 = nn.Conv2d(dim, dim, 3, 1, 1)
        self.norm2 = nn.BatchNorm2d(dim, eps=1e-5)

    def forward(self, x, ct=None):
        h = F.gelu(self.norm1(self.conv1(x)))
        h = self.norm2(self.conv2(h))
        return x + h, ct


class Downsample(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = LayerNorm2d(dim)
        self.reduction = nn.Sequential(nn.Conv2d(dim, 2 * dim, 3, 2, 1, bias=False))

    def forward(self, x):
        return self.reduction(self.norm(x))


def window_partition(x, ws):
    B, C, H, W = x.shape
    x = x.view(B, C, H // ws, ws, W // ws, ws)
    return x.permute(0, 2, 4, 3, 5, 1).reshape(-1, ws * ws, C)


def window_reverse(w, ws, H, W, B):
    C = w.shape[-1]
    x = w.view(B, H // ws, W // ws, ws, ws, C)
    return x.permute(0, 5, 1, 3, 2, 4).reshape(B, C, H, W)


def ct_dewindow(ct, W, H, window_size):
    bs = ct.shape[0]
    N = ct.shape[2]
    ct2 = ct.view(-1, W // window_size, H // window_size, window_size, window_size, N)
    ct2 = ct2.permute(0, 5, 1, 3, 2, 4).reshape(bs, N, W * H).transpose(1, 2)
    return ct2


def ct_window(ct, W, H, window_size):
    bs, N, C = ct.shape
    ct = ct.view(bs, W // window_size, window_size, H // window_size, window_size, C)
    ct = ct.permute(0, 1, 3, 2, 4, 5).reshape(bs, N, C)
    return ct


class PosEmbMLPSwinv1D(nn.Module):
    def __init__(self, dim, seq_length):
        super().__init__()
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(), nn.Linear(512, dim, bias=False)
        )
        s = int(seq_length ** 0.5)
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(s, dtype=torch.float32),
                torch.arange(s, dtype=torch.float32),
                indexing="ij",
            )
        ).unsqueeze(0)  # [1, 2, s, s]
        coords -= s // 2
        coords /= s // 2
        self.register_buffer("relative_coords_table", coords, persistent=False)

    def forward(self, x):
        pos = self.cpb_mlp(self.relative_coords_table.flatten(2).transpose(1, 2))
        return x + pos


class PosEmbMLPSwinv2D(nn.Module):
    def __init__(self, window_size, num_heads, seq_length):
        super().__init__()
        self.num_heads = num_heads
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(), nn.Linear(512, num_heads, bias=False)
        )
        ws = window_size
        rel_h = torch.arange(-(ws[0] - 1), ws[0], dtype=torch.float32)
        rel_w = torch.arange(-(ws[1] - 1), ws[1], dtype=torch.float32)
        table = (
            torch.stack(torch.meshgrid(rel_h, rel_w, indexing="ij"))
            .permute(1, 2, 0)
            .contiguous()
            .unsqueeze(0)
        )
        table[:, :, :, 0] /= ws[0] - 1
        table[:, :, :, 1] /= ws[1] - 1
        table *= 8
        table = torch.sign(table) * torch.log2(torch.abs(table) + 1.0) / 3.0
        self.register_buffer("relative_coords_table", table, persistent=False)
        coords = torch.stack(
            torch.meshgrid(torch.arange(ws[0]), torch.arange(ws[1]), indexing="ij")
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws[0] - 1
        rel[:, :, 1] += ws[1] - 1
        rel[:, :, 0] *= 2 * ws[1] - 1
        self.register_buffer("relative_position_index", rel.sum(-1), persistent=False)
        self.window_size = ws
        self.seq_length = seq_length

    def forward(self, attn, local_window_size):
        table = self.cpb_mlp(self.relative_coords_table).view(-1, self.num_heads)
        n = self.window_size[0] * self.window_size[1]
        bias = table[self.relative_position_index.view(-1)].view(n, n, -1)
        bias = 16 * torch.sigmoid(bias.permute(2, 0, 1))
        pad = attn.shape[2] - local_window_size
        bias = F.pad(bias, (pad, 0, pad, 0))
        return attn + bias.unsqueeze(0)


class WindowAttention(nn.Module):
    def __init__(self, dim, num_heads, resolution, seq_length):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.pos_emb_funct = PosEmbMLPSwinv2D(
            (resolution, resolution), num_heads, seq_length
        )
        self.resolution = resolution

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = self.pos_emb_funct(attn, self.resolution ** 2)
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class HAT(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, sr_ratio, window_size, ct_size):
        super().__init__()
        self.pos_embed = PosEmbMLPSwinv1D(dim, seq_length=window_size ** 2)
        self.norm1 = nn.LayerNorm(dim)
        cr_tokens_per_window = ct_size ** 2 if sr_ratio > 1 else 0
        cr_tokens_total = cr_tokens_per_window * sr_ratio * sr_ratio
        self.cr_window = ct_size
        self.attn = WindowAttention(
            dim, num_heads, resolution=window_size,
            seq_length=window_size ** 2 + cr_tokens_per_window,
        )
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.window_size = window_size
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.hat_norm1 = nn.LayerNorm(dim)
            self.hat_norm2 = nn.LayerNorm(dim)
            self.hat_attn = WindowAttention(
                dim, num_heads, resolution=int(cr_tokens_total ** 0.5),
                seq_length=cr_tokens_total,
            )
            self.hat_mlp = Mlp(dim, int(dim * mlp_ratio))
            self.hat_pos_embed = PosEmbMLPSwinv1D(dim, seq_length=cr_tokens_total)

    def forward(self, x, carrier_tokens):
        B, T, N = x.shape
        ct = carrier_tokens
        x = self.pos_embed(x)
        if self.sr_ratio > 1:
            Bg, Ng, Hg = ct.shape
            ct = ct_dewindow(
                ct, self.cr_window * self.sr_ratio, self.cr_window * self.sr_ratio,
                self.cr_window,
            )
            ct = self.hat_pos_embed(ct)
            ct = ct + self.hat_attn(self.hat_norm1(ct))
            ct = ct + self.hat_mlp(self.hat_norm2(ct))
            ct = ct_window(
                ct, self.cr_window * self.sr_ratio, self.cr_window * self.sr_ratio,
                self.cr_window,
            )
            ct = ct.reshape(x.shape[0], -1, N)
            x = torch.cat((ct, x), dim=1)
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        if self.sr_ratio > 1:
            ctr, x = x.split(
                [x.shape[1] - self.window_size * self.window_size,
                 self.window_size * self.window_size], dim=1,
            )
            ct = ctr.reshape(Bg, Ng, Hg)
        return x, ct


class TokenInitializer(nn.Module):
    def __init__(self, dim, input_resolution, window_size, ct_size):
        super().__init__()
        output_size = int(ct_size * input_resolution / window_size)
        stride_size = int(input_resolution / output_size)
        kernel_size = input_resolution - (output_size - 1) * stride_size
        self.pos_embed = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        to_global_feature = nn.Sequential()
        to_global_feature.add_module("pos", self.pos_embed)
        to_global_feature.add_module("pool", nn.AvgPool2d(kernel_size, stride_size))
        self.to_global_feature = to_global_feature
        self.window_size = ct_size

    def forward(self, x):
        x = self.to_global_feature(x)
        B, C, H, W = x.shape
        ct = x.view(
            B, C, H // self.window_size, self.window_size,
            W // self.window_size, self.window_size,
        )
        ct = (
            ct.permute(0, 2, 4, 3, 5, 1)
            .reshape(-1, H * W, C)
        )
        return ct


class Level(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, ct_size, conv,
                 downsample, input_resolution, only_local):
        super().__init__()
        self.conv = conv
        if conv:
            self.blocks = nn.ModuleList([ConvBlock(dim) for _ in range(depth)])
            self.transformer_block = False
        else:
            sr_ratio = input_resolution // window_size if not only_local else 1
            self.blocks = nn.ModuleList(
                [HAT(dim, num_heads, 4.0, sr_ratio, window_size, ct_size)
                 for _ in range(depth)]
            )
            self.transformer_block = True
        self.downsample = Downsample(dim) if downsample else None
        do_gt = (
            not conv and not only_local and input_resolution // window_size > 1
        )
        self.global_tokenizer = (
            TokenInitializer(dim, input_resolution, window_size, ct_size)
            if do_gt else None
        )
        self.do_gt = do_gt
        self.window_size = window_size

    def forward(self, x):
        ct = self.global_tokenizer(x) if self.do_gt else None
        B, C, H, W = x.shape
        if self.transformer_block:
            x = window_partition(x, self.window_size)
        for blk in self.blocks:
            x, ct = blk(x, ct)
        if self.transformer_block:
            x = window_reverse(x, self.window_size, H, W, B)
        if self.downsample is None:
            return x
        return self.downsample(x)


# the wheel's per-variant dims (fastervit faster_vit_*_224 configs)
_CONFIGS = {
    "0": {"dim": 64, "in_dim": 64, "depths": (2, 3, 6, 5)},
    "1": {"dim": 80, "in_dim": 32, "depths": (1, 3, 8, 5)},
    "2": {"dim": 96, "in_dim": 64, "depths": (3, 3, 8, 5)},
}


class FasterViT2(nn.Module):
    """faster_vit_2_224: dim 96, depths (3,3,8,5), heads (2,4,8,16);
    ``variant`` selects the other 224 configs through the same module."""

    def __init__(self, num_classes=2, variant="2"):
        super().__init__()
        cfg = _CONFIGS[variant]
        dim, in_dim = cfg["dim"], cfg["in_dim"]
        depths = cfg["depths"]
        heads = (2, 4, 8, 16)
        self.patch_embed = PatchEmbed(in_dim, dim)
        self.levels = nn.ModuleList()
        for i in range(4):
            self.levels.append(
                Level(
                    int(dim * 2 ** i), depths[i], heads[i], window_size=7,
                    ct_size=2, conv=i < 2, downsample=i < 3,
                    input_resolution=int(2 ** (-2 - i) * 224),
                    only_local=i != 2,
                )
            )
        self.norm = nn.BatchNorm2d(int(dim * 2 ** 3))
        self.head = nn.Linear(int(dim * 2 ** 3), num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        for level in self.levels:
            x = level(x)
        x = self.norm(x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.head(x)
