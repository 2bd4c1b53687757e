"""HTS-AT (hierarchical token-semantic audio transformer) in Flax — the
OPERA-CT encoder.

Re-designed from the behavior of src/model/htsat/htsat.py (reference):
- 4-stage Swin with dims 96/192/384/768, depths (2,2,6,2), heads (4,8,16,32),
  window 8, patch 4x4 on a 256x256 "image" (htsat.py:517-541)
- input is a precomputed log-mel (B, T, 64); the in-module STFT of the
  reference is dead code (its forward comments it out, htsat.py:886-887)
- per-mel-bin BatchNorm (bn0, htsat.py:610,889-891)
- reshape_wav2img: bicubic align_corners time-resize to 1024 frames then fold
  freq_ratio=4 time blocks onto the freq axis -> (256, 256) (htsat.py:829-858)
- latent_output = mean over final 8x8 tokens after the final LayerNorm
  (htsat.py:726-735; the tscam reshape does not change the mean)
- tscam conv head for clipwise/framewise outputs (htsat.py:671-684,754-782)

TPU-first choices: window partition is pure reshape/transpose; the shifted
window uses jnp.roll + a precomputed additive mask (static constant folded by
XLA); attention runs as batched MXU matmuls over all windows at once; dynamic
clip lengths are handled by the shared resize_bicubic_time gather so one
compiled graph serves every length <= 1024 frames.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import resize_bicubic_time


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    mel_bins: int = 64
    enable_tscam: bool = True
    # mixed-precision training/inference: None = exact f32; jnp.bfloat16
    # computes Dense/Conv in bf16 with f32 LayerNorms, softmax and
    # residual carries (the standard TPU training recipe; XLA's f32
    # matmul default is already one bf16 MXU pass, so the win is halved
    # activation storage for fwd+bwd, not matmul passes)
    compute_dtype: Optional[object] = None

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins  # 4

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))  # 768


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static (wh*ww, wh*ww) index into the (2wh-1)(2ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def _shift_attn_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, win^2, win^2) for shifted windows (0 / -100)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(H // window, window, W // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window*window, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(x: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, window*window, C) -> (B, H, W, C)."""
    C = x.shape[-1]
    B = x.shape[0] // ((H // window) * (W // window))
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray], deterministic: bool = True):
        Bn, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(Bn, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((2 * self.window - 1) ** 2, nh),
        )
        rel_idx = _relative_position_index(self.window, self.window).reshape(-1)
        bias = bias_table[rel_idx].reshape(N, N, nh).transpose(2, 0, 1)

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (hd**-0.5), k,
            preferred_element_type=jnp.float32,
        ) + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1)  # f32 logits even under bf16
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        out = nn.Dense(C, name="proj", dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        H, W = self.input_resolution
        window, shift = self.window, self.shift
        if min(H, W) <= window:
            window, shift = min(H, W), 0

        B, L, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, window)
        mask = (
            jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift > 0 else None
        )
        xw = WindowAttention(
            C, window, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            dtype=self.dtype, name="attn",
        )(xw, mask, deterministic)
        x = window_reverse(xw, window, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x.astype(shortcut.dtype), deterministic)
        y = Mlp(int(C * self.mlp_ratio), C, self.drop, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x), deterministic
        )
        return x + dp(y.astype(x.dtype), deterministic)


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dim: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, name="reduction", dtype=self.dtype)(x)
        # residual carry between blocks stays f32 under bf16 compute
        return x if self.dtype is None else x.astype(jnp.float32)


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    patch_stride: Tuple[int, int]
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1). padding (p - s)//2 each side (htsat_util.py:95-106).
        p, (sh, sw) = self.patch_size, self.patch_stride
        pad = ((p - sh) // 2, (p - sw) // 2)
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(sh, sw),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            name="proj",
            dtype=self.dtype,
        )(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x), (Hp, Wp)


def htsat_forward_long(
    model: "HTSAT",
    variables,
    mel: jnp.ndarray,
    crop_size: int = 1024,
    overlap: int = 512,
):
    """Sliding-window inference for clips longer than freq_ratio*spec_size
    frames (htsat.py:939-979): crops of `crop_size` frames every `overlap`
    frames, outputs averaged over crops. One jittable lax.map over static crop
    positions (the reference loops in python per clip).

    mel: (B, T, F) with T > crop_size. Returns averaged output dict.
    """
    B, T, F = mel.shape
    starts = np.arange(0, T - crop_size - 1, overlap)
    if len(starts) == 0:
        return model.apply(variables, mel)

    def one(start):
        crop = jax.lax.dynamic_slice_in_dim(mel, start, crop_size, axis=1)
        return model.apply(variables, crop)

    outs = jax.lax.map(one, jnp.asarray(starts, jnp.int32))
    return jax.tree.map(lambda x: x.mean(axis=0), outs)


class HTSAT(nn.Module):
    """Returns dict with latent_output (B, 768) [+ clipwise/framewise if tscam]."""

    config: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        n_frames: Optional[jnp.ndarray] = None,
        train: bool = False,
        use_running_average: Optional[bool] = None,
    ):
        cfg = self.config
        B, T, F = mel.shape
        deterministic = not train
        ura = (not train) if use_running_average is None else use_running_average

        # bn0: per-mel-bin batchnorm (stats over batch+time), htsat.py:889-891
        x = nn.BatchNorm(
            use_running_average=ura, axis=-1, momentum=0.9, epsilon=1e-5, name="bn0"
        )(mel)

        # reshape_wav2img: time -> spec_size*freq_ratio via bicubic, fold freq
        target_T = cfg.spec_size * cfg.freq_ratio  # 1024
        if n_frames is None:
            n_frames = jnp.full((B,), T, dtype=jnp.int32)
        if T < target_T:
            x = jnp.pad(x, ((0, 0), (0, target_T - T), (0, 0)))
        x = resize_bicubic_time(x, n_frames, target_T)  # (B, 1024, F)
        # fold: blocks of spec_size frames stack along freq (htsat.py:845-857)
        x = x.reshape(B, cfg.freq_ratio, cfg.spec_size, F)
        x = x.transpose(0, 1, 3, 2).reshape(B, cfg.freq_ratio * F, cfg.spec_size)
        x = x[..., None]  # (B, 256, 256, 1) NHWC

        x, (Hp, Wp) = PatchEmbed(
            cfg.embed_dim, cfg.patch_size, cfg.patch_stride,
            dtype=cfg.compute_dtype, name="patch_embed"
        )(x)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
        res = (Hp, Wp)
        for i_layer, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2**i_layer)
            for b in range(depth):
                x = SwinBlock(
                    dim=dim,
                    input_resolution=res,
                    num_heads=cfg.num_heads[i_layer],
                    window=cfg.window_size,
                    shift=0 if b % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate,
                    attn_drop=cfg.attn_drop_rate,
                    drop_path=float(dpr[sum(cfg.depths[:i_layer]) + b]),
                    dtype=cfg.compute_dtype,
                    name=f"layers_{i_layer}_blocks_{b}",
                )(x, deterministic)
            if i_layer < len(cfg.depths) - 1:
                x = PatchMerging(
                    res, dim, dtype=cfg.compute_dtype,
                    name=f"layers_{i_layer}_downsample",
                )(x)
                res = (res[0] // 2, res[1] // 2)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)  # (B, 64, 768)
        latent = x.mean(axis=1)  # == avgpool over the folded SFxST map

        out = {"latent_output": latent}
        if cfg.enable_tscam:
            SF = cfg.spec_size // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride[0]
            ST = SF  # square map (8, 8)
            c_freq_bin = SF // cfg.freq_ratio  # 2
            # (B, N, C) -> (B, SF, ST, C); unfold freq groups onto time
            fmap = x.reshape(B, SF, ST, -1)
            fmap = fmap.reshape(B, SF // c_freq_bin, c_freq_bin, ST, -1)
            fmap = fmap.transpose(0, 2, 1, 3, 4).reshape(B, c_freq_bin, -1, fmap.shape[-1])
            # tscam conv: kernel (c_freq_bin, 3), padding (0, 1) (htsat.py:678-683)
            logits_map = nn.Conv(
                cfg.num_classes,
                (c_freq_bin, 3),
                padding=((0, 0), (1, 1)),
                name="tscam_conv",
            )(fmap)  # (B, 1, 4*ST, num_classes)
            logits_map = logits_map.reshape(B, -1, cfg.num_classes)
            fpx = jax.nn.sigmoid(logits_map)
            fpx = jnp.repeat(fpx, 8 * cfg.patch_stride[1], axis=1)  # interpolate
            clip = logits_map.mean(axis=1)
            out["framewise_output"] = fpx
            out["clipwise_output"] = jax.nn.sigmoid(clip)
            out["clipwise_logits"] = clip
        return out
