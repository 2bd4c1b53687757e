"""Compact, independent torch implementation of the HTS-AT *eval* forward and
the COLA projector, used solely as a conversion-parity oracle in tests.

Written from the published HTS-AT/Swin architecture (arXiv 2202.00874 /
2103.14030) with reference-compatible state_dict key names so that
extract.convert can consume its state_dict like a real OPERA-CT checkpoint.
Eval-mode only: no dropout/droppath, running BN stats.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(x, ws, H, W):
    C = x.shape[-1]
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.view(B, H // ws, W // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("rel_idx", rel.sum(-1), persistent=False)

    def forward(self, x, mask=None):
        Bn, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(Bn, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (C // h) ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rel_idx.view(-1)]
        attn = attn + bias.view(N, N, h).permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(Bn, h, N, N)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(Bn, N, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class SwinBlock(nn.Module):
    def __init__(self, dim, res, heads, ws, shift):
        super().__init__()
        self.res, self.ws, self.shift = res, ws, shift
        if min(res) <= ws:
            self.ws, self.shift = min(res), 0
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, self.ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, dim * 4)
        if self.shift > 0:
            H, W = res
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (
                slice(0, -self.ws),
                slice(-self.ws, -self.shift),
                slice(-self.shift, None),
            ):
                for wsl in (
                    slice(0, -self.ws),
                    slice(-self.ws, -self.shift),
                    slice(-self.shift, None),
                ):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(img, self.ws).view(-1, self.ws * self.ws)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am, persistent=False)
        else:
            self.attn_mask = None

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = window_partition(x, self.ws)
        xw = self.attn(xw, self.attn_mask)
        x = window_reverse(xw, self.ws, H, W)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.reshape(B, L, C)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, res):
        H, W = res
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            -1,
        ).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class HTSATEval(nn.Module):
    """Eval-only HTSAT with reference state_dict key layout (htsat.* subtree)."""

    def __init__(self, num_classes=527):
        super().__init__()
        dims = (96, 192, 384, 768)
        depths = (2, 2, 6, 2)
        heads = (4, 8, 16, 32)
        self.bn0 = nn.BatchNorm2d(64)
        pe = nn.Module()
        pe.proj = nn.Conv2d(1, 96, 4, 4)
        pe.norm = nn.LayerNorm(96)
        self.patch_embed = pe
        self.layers = nn.ModuleList()
        res = (64, 64)
        for i, d in enumerate(depths):
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                SwinBlock(dims[i], res, heads[i], 8, 0 if b % 2 == 0 else 4)
                for b in range(d)
            )
            if i < 3:
                layer.downsample = PatchMerging(dims[i])
            self.layers.append(layer)
            self._res_at = res
            res = (res[0] // 2, res[1] // 2) if i < 3 else res
        self.norm = nn.LayerNorm(768)
        self.tscam_conv = nn.Conv2d(768, num_classes, (2, 3), padding=(0, 1))
        self.head = nn.Linear(num_classes, num_classes)

    def forward(self, mel):  # mel: (B, T, 64)
        x = mel[:, None]  # (B,1,T,F)
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        B, C, T, Fb = x.shape
        if T < 1024:
            x = F.interpolate(x, (1024, Fb), mode="bicubic", align_corners=True)
        x = x.permute(0, 1, 3, 2).reshape(B, 1, Fb, 4, 256)
        x = x.permute(0, 1, 3, 2, 4).reshape(B, 1, 4 * Fb, 256)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        res = (64, 64)
        for i, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x, res)
                res = (res[0] // 2, res[1] // 2)
        x = self.norm(x)
        return x.mean(1)


class ColaHTSATEval(nn.Module):
    """Cola(htsat) with reference key layout: encoder.encoder.htsat.*, g, ..."""

    def __init__(self):
        super().__init__()
        inner = nn.Module()
        inner.htsat = HTSATEval()
        enc = nn.Module()
        enc.encoder = inner
        self.encoder = enc
        self.g = nn.Linear(768, 512)
        self.layer_norm = nn.LayerNorm(512)
        self.linear = nn.Linear(512, 512, bias=False)

    def extract_feature(self, mel, dim=768):
        h = self.encoder.encoder.htsat(mel)
        if dim == 768:
            return h
        return self.g(h)
