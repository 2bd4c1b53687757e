"""Compact independent torch EfficientNet-B0 (eval-only) used as the
OPERA-CE conversion-parity oracle. Written from the published EfficientNet
architecture (arXiv 1905.11946) with the reference-compatible state_dict key
names (lukemelas efficientnet-pytorch layout: _conv_stem, _blocks.N._*, ...).
TF-style SAME padding, BN eps 1e-3, swish."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]


def same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class ConvSame(nn.Conv2d):
    def forward(self, x):
        x = same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0, 1, self.groups)


def bn(ch):
    return nn.BatchNorm2d(ch, eps=1e-3, momentum=0.01)


class MBConv(nn.Module):
    def __init__(self, ci, co, k, s, e, se):
        super().__init__()
        self.s, self.ci, self.co = s, ci, co
        c = ci * e
        if e != 1:
            self._expand_conv = ConvSame(ci, c, 1, bias=False)
            self._bn0 = bn(c)
        self.e = e
        self._depthwise_conv = ConvSame(c, c, k, stride=s, groups=c, bias=False)
        self._bn1 = bn(c)
        sc = max(1, int(ci * se))
        self._se_reduce = ConvSame(c, sc, 1)
        self._se_expand = ConvSame(sc, c, 1)
        self._project_conv = ConvSame(c, co, 1, bias=False)
        self._bn2 = bn(co)

    def forward(self, x):
        inp = x
        if self.e != 1:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        s = x.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.s == 1 and self.ci == self.co:
            x = x + inp
        return x


class EffNetB0(nn.Module):
    def __init__(self):
        super().__init__()
        self._conv_stem = ConvSame(3, 32, 3, stride=2, bias=False)
        self._bn0 = bn(32)
        self._blocks = nn.ModuleList()
        for r, k, s, e, ci, co, se in B0_BLOCKS:
            for j in range(r):
                self._blocks.append(
                    MBConv(ci if j == 0 else co, co, k, s if j == 0 else 1, e, se)
                )
        self._conv_head = ConvSame(320, 1280, 1, bias=False)
        self._bn1 = bn(1280)

    def forward(self, x):
        x = F.silu(self._bn0(self._conv_stem(x)))
        for b in self._blocks:
            x = b(x)
        x = F.silu(self._bn1(self._conv_head(x)))
        return x.mean((2, 3))


class ColaCEEval(nn.Module):
    """Cola(efficientnet) with reference key layout: encoder.cnn1,
    encoder.efficientnet.*, g, layer_norm, linear."""

    def __init__(self):
        super().__init__()
        enc = nn.Module()
        enc.cnn1 = nn.Conv2d(1, 3, 3)
        enc.efficientnet = EffNetB0()
        self.encoder = enc
        self.g = nn.Linear(1280, 512)
        self.layer_norm = nn.LayerNorm(512)
        self.linear = nn.Linear(512, 512, bias=False)

    def extract_feature(self, mel, dim=1280):
        x = mel[:, None]  # (B,1,T,F)
        x = self.encoder.cnn1(x)
        h = self.encoder.efficientnet(x)
        if dim == 1280:
            return h
        return self.g(h)
