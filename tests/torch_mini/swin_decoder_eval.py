"""Compact independent torch swin-v2-cr block (eval-only) — oracle for the
MAE decoder conversion. Semantics per the swin-v2-cr design: scaled-cosine
window attention with per-head tau (clamped at 0.01), continuous log-spaced
relative position bias from a 2->hidden->heads ReLU meta-MLP (drop 0 at eval),
post-norm residuals. Reference state_dict key names (attn.qkv, attn.proj,
attn.meta_mlp.fc1/fc2, attn.tau, norm1, norm2, mlp.fc1, mlp.fc2)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def window_partition(x, wh, ww):
    B, H, W, C = x.shape
    x = x.view(B, H // wh, wh, W // ww, ww, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(x, wh, ww, H, W):
    C = x.shape[-1]
    B = x.shape[0] // ((H // wh) * (W // ww))
    x = x.view(B, H // wh, W // ww, wh, ww, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class MetaMlp(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.fc1 = nn.Linear(2, hidden)
        self.fc2 = nn.Linear(hidden, heads)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class CosineWindowAttention(nn.Module):
    def __init__(self, dim, heads, wh, ww, meta_hidden=384):
        super().__init__()
        self.heads, self.wh, self.ww = heads, wh, ww
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.meta_mlp = MetaMlp(meta_hidden, heads)
        self.tau = nn.Parameter(torch.ones(heads))
        coords = torch.stack(
            torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing="ij")
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).reshape(-1, 2).float()
        self.register_buffer(
            "rel_log", torch.sign(rel) * torch.log1p(rel.abs()), persistent=False
        )

    def forward(self, x, mask=None):
        Bw, L, C = x.shape
        h = self.heads
        qkv = self.qkv(x).view(Bw, L, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        denom = torch.norm(q, dim=-1, keepdim=True) @ torch.norm(
            k, dim=-1, keepdim=True
        ).transpose(-2, -1)
        attn = (q @ k.transpose(-2, -1)) / denom.clamp(min=1e-6)
        attn = attn / self.tau.clamp(min=0.01).view(1, h, 1, 1)
        bias = self.meta_mlp(self.rel_log).transpose(1, 0).reshape(h, L, L)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bw // nW, nW, h, L, L) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(Bw, h, L, L)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(Bw, L, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class SwinV2CRBlockEval(nn.Module):
    def __init__(self, dim, heads, feat_size, window, shift):
        super().__init__()
        H, W = feat_size
        self.feat = feat_size
        self.window = (min(window[0], H), min(window[1], W))
        self.shift = (
            0 if H <= window[0] else shift[0],
            0 if W <= window[1] else shift[1],
        )
        self.attn = CosineWindowAttention(dim, heads, *self.window)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * 4)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        if any(self.shift):
            img = torch.zeros(H, W)
            cnt = 0
            wh, ww = self.window
            sh, sw = self.shift
            hs = [slice(0, -wh), slice(-wh, -sh), slice(-sh, None)] if sh else [slice(None)]
            ws = [slice(0, -ww), slice(-ww, -sw), slice(-sw, None)] if sw else [slice(None)]
            for a in hs:
                for b in ws:
                    img[a, b] = cnt
                    cnt += 1
            win = window_partition(img[None, :, :, None], wh, ww).view(-1, wh * ww)
            m = win.unsqueeze(1) - win.unsqueeze(2)
            self.register_buffer(
                "attn_mask",
                m.masked_fill(m != 0, -100.0).masked_fill(m == 0, 0.0),
                persistent=False,
            )
        else:
            self.attn_mask = None

    def _attn(self, x):
        H, W = self.feat
        B, L, C = x.shape
        h = x.view(B, H, W, C)
        sh, sw = self.shift
        if sh or sw:
            h = torch.roll(h, (-sh, -sw), dims=(1, 2))
        hw = window_partition(h, *self.window)
        hw = self.attn(hw, self.attn_mask)
        h = window_reverse(hw, *self.window, H, W)
        if sh or sw:
            h = torch.roll(h, (sh, sw), dims=(1, 2))
        return h.reshape(B, L, C)

    def forward(self, x):
        x = x + self.norm1(self._attn(x))
        x = x + self.norm2(self.mlp(x))
        return x
