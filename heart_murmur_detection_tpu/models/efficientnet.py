"""EfficientNet (B0 by default) in Flax — the OPERA-CE encoder backbone.

Behavioral spec from efficientnet-pytorch 0.7.1 as used by the reference
(src/model/models_cola.py:42-59): ``EfficientNet.from_name('efficientnet-b0',
include_top=False)`` preceded by a 1->3 channel 3x3 VALID conv. Dynamic SAME
padding in torch matches flax/TF "SAME". BN eps 1e-3, momentum 0.01 (torch) ->
flax momentum 0.99. Activation silu ("swish"). include_top=False ends at the
1x1 head conv + BN + swish + global average pool -> 1280-d.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax.numpy as jnp

# (num_repeat, kernel, stride, expand, in_ch, out_ch, se_ratio)
_B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    width_mult: float = 1.0
    depth_mult: float = 1.0
    drop_connect_rate: float = 0.2
    depth_divisor: int = 8


def _round_filters(f: int, cfg: EfficientNetConfig) -> int:
    f *= cfg.width_mult
    d = cfg.depth_divisor
    new_f = max(d, int(f + d / 2) // d * d)
    if new_f < 0.9 * f:
        new_f += d
    return int(new_f)


def _round_repeats(r: int, cfg: EfficientNetConfig) -> int:
    return int(math.ceil(cfg.depth_mult * r))


class _BN(nn.Module):
    # under mixed precision BN is an f32 island: stats and normalization in
    # f32 regardless of (bf16) conv outputs feeding it
    force_f32: bool = False

    @nn.compact
    def __call__(self, x, use_running_average=True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32 if self.force_f32 else None,
        )(x)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    drop_connect: float
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        inp = x
        dt = self.dtype
        f32bn = dt is not None
        c = self.in_ch * self.expand
        if self.expand != 1:
            x = nn.Conv(c, (1, 1), use_bias=False, dtype=dt, name="_expand_conv")(x)
            x = _BN(force_f32=f32bn, name="_bn0")(x, ura)
            x = nn.silu(x)
        x = nn.Conv(
            c,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            feature_group_count=c,
            padding="SAME",
            use_bias=False,
            dtype=dt,
            name="_depthwise_conv",
        )(x)
        x = _BN(force_f32=f32bn, name="_bn1")(x, ura)
        x = nn.silu(x)

        if 0 < self.se_ratio <= 1:
            se_ch = max(1, int(self.in_ch * self.se_ratio))
            s = x.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(se_ch, (1, 1), dtype=dt, name="_se_reduce")(s)
            s = nn.silu(s)
            s = nn.Conv(c, (1, 1), dtype=dt, name="_se_expand")(s)
            x = x * nn.sigmoid(s.astype(x.dtype))

        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=dt, name="_project_conv")(x)
        x = _BN(force_f32=f32bn, name="_bn2")(x, ura)

        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.drop_connect > 0:
                keep = 1.0 - self.drop_connect
                rng = self.make_rng("dropout")
                import jax

                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype)
                )
                x = x / keep * mask
            x = x + inp
        return x


class EfficientNet(nn.Module):
    """Headless EfficientNet. Input NHWC; returns (B, head_ch) pooled features."""

    config: EfficientNetConfig = EfficientNetConfig()
    drop_connect_rate: float = 0.2
    return_map: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        ura = not train
        x = nn.Conv(
            _round_filters(32, cfg),
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="_conv_stem",
        )(x)
        x = _BN(force_f32=self.dtype is not None, name="_bn0")(x, ura)
        x = nn.silu(x)

        total = sum(_round_repeats(r, cfg) for r, *_ in _B0_BLOCKS)
        idx = 0
        for r, k, s, e, ci, co, se in _B0_BLOCKS:
            ci, co = _round_filters(ci, cfg), _round_filters(co, cfg)
            for j in range(_round_repeats(r, cfg)):
                x = MBConv(
                    in_ch=ci if j == 0 else co,
                    out_ch=co,
                    kernel=k,
                    stride=s if j == 0 else 1,
                    expand=e,
                    se_ratio=se,
                    drop_connect=self.drop_connect_rate * idx / total,
                    dtype=self.dtype,
                    name=f"_blocks_{idx}",
                )(x, train)
                idx += 1

        x = nn.Conv(
            _round_filters(1280, cfg), (1, 1), use_bias=False, dtype=self.dtype,
            name="_conv_head",
        )(x)
        x = _BN(force_f32=self.dtype is not None, name="_bn1")(x, ura)
        x = nn.silu(x)
        if self.return_map:
            return x
        return x.mean(axis=(1, 2))  # include_top=False -> global avg pool


class ColaEfficientNetEncoder(nn.Module):
    """The OPERA-CE encoder: 1->3 chan VALID 3x3 conv then EfficientNet-B0
    (models_cola.py:42-59). Input mel (B, T, F) -> (B, 1280)."""

    drop_connect_rate: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray, n_frames=None, train: bool = False):
        x = mel[..., None]  # (B, T, F, 1)
        x = nn.Conv(3, (3, 3), padding="VALID", dtype=self.dtype, name="cnn1")(x)
        fmap = EfficientNet(
            drop_connect_rate=self.drop_connect_rate,
            return_map=n_frames is not None,
            dtype=self.dtype,
            name="efficientnet",
        )(x, train)
        if n_frames is None:
            return fmap
        # masked global pool over valid rows: the VALID 3x3 stem drops 2 frames,
        # the 5 stride-2 SAME convs each halve with ceil -> ceil((n-2)/32) rows.
        # Boundary rows mix a little zero-padding through conv receptive fields;
        # exact parity requires per-length compilation (extract docs).
        B, Tm, Wm, C = fmap.shape
        valid = jnp.ceil((n_frames - 2) / 32.0).astype(jnp.int32)
        valid = jnp.clip(valid, 1, Tm)
        row_ok = jnp.arange(Tm)[None, :] < valid[:, None]  # (B, Tm)
        w = row_ok[:, :, None, None]
        s = jnp.sum(fmap * w, axis=(1, 2))
        denom = (valid * Wm).astype(fmap.dtype)[:, None]
        return s / denom
