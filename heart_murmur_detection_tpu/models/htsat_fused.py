"""Fused-inference HTS-AT forward: same variables tree as models.htsat.HTSAT,
but swin blocks run through the fused Pallas kernel (ops.pallas_swin) for the
bandwidth-bound stages (C <= 384); the last stage (C=768, whose weights exceed
VMEM) uses an inline jnp block. Eval-mode only (extraction / LP feature path).

Numerics match HTSAT.apply to ~1e-4 (tests/test_pallas_swin.py::TestFusedHTSAT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import resize_bicubic_time
from ..ops.pallas_swin import (
    fused_swin_block,
    fused_swin_block_split,
    fused_swin_pair,
    pair_plan,
)
from .htsat import HTSATConfig, _relative_position_index, _shift_attn_mask

HI = jax.lax.Precision.HIGHEST


def _ln(x, p, eps=1e-5):
    x = x.astype(jnp.float32)  # stats in f32 for the bf16 activation flow
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _block_jnp(x, p, H, W, heads, window, shift, bias, mask):
    """Plain jnp swin block (fallback for VMEM-oversized stages)."""
    B, L, C = x.shape
    hd = C // heads
    shortcut = x
    h = _ln(x, p["norm1"]).reshape(B, H, W, C)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    hw = (
        h.reshape(B, H // window, window, W // window, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, window * window, C)
    )
    qkv = hw @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]
    q, k, v = [
        qkv[..., i * C : (i + 1) * C]
        .reshape(-1, window * window, heads, hd)
        .transpose(0, 2, 1, 3)
        for i in range(3)
    ]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd**-0.5, k, precision=HI) + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(-1, nW, heads, window * window, window * window)
        attn = (attn + mask[None, :, None]).reshape(-1, heads, window * window, window * window)
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=HI)
    o = o.transpose(0, 2, 1, 3).reshape(-1, window * window, C)
    o = o @ p["attn"]["proj"]["kernel"] + p["attn"]["proj"]["bias"]
    h = (
        o.reshape(B, H // window, W // window, window, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    if shift:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h.reshape(B, L, C)
    m = _ln(x, p["norm2"])
    m = jax.nn.gelu(m @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"], approximate=False)
    m = m @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
    return x + m


def htsat_apply_fused(
    variables: dict,
    mel: jnp.ndarray,
    n_frames=None,
    cfg: HTSATConfig = HTSATConfig(),
    max_fused_dim: int = None,
    mm_dtype=jnp.float32,
    use_pair: bool = True,
    fast_softmax: bool = False,
    act_dtype=None,
    use_split: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """mel (B, T, F) [+ per-clip frame counts] -> latent_output (B, 768).

    max_fused_dim: widest stage routed through the fused Pallas kernel.
    None = auto: 384 for bfloat16 matmuls (fused wins every VMEM-feasible
    stage), 192 for f32 (the C=384 stage is faster in XLA at f32 —
    measured, RESULTS.md round-2 table). Stages past max_fused_dim (C=768,
    whose whole-block weights exceed the 16MB scoped-VMEM limit) run the
    split (attn, MLP) kernel pair under the bf16 flow when use_split, else
    the inline jnp block.

    use_pair: fuse (regular, shifted) block pairs — including both cyclic
    rolls — into one kernel when VMEM permits (ops.pallas_swin.pair_plan),
    cutting HBM passes per pair from ~8 to 2. Falls back per-pair to the
    single-block kernel when infeasible.
    """
    if max_fused_dim is None:
        max_fused_dim = 384 if mm_dtype == jnp.bfloat16 else 192
    params = variables["params"]
    stats = variables["batch_stats"]
    B, T, F = mel.shape

    # bn0 (eval: running stats)
    bn = params["bn0"]
    x = (mel - stats["bn0"]["mean"]) * jax.lax.rsqrt(
        stats["bn0"]["var"] + 1e-5
    ) * bn["scale"] + bn["bias"]

    # bf16 activation flow: from the bicubic resize on, x lives in bf16
    # (preamble conv, kernel maps, HBM hand-offs, downsample) — halves
    # bandwidth and VMEM footprint, with f32 islands for LN stats / softmax
    # / gelu. The jnp fallback stages (C=768) compute in f32 as before.
    # act_dtype=None follows mm_dtype (bf16 matmuls -> bf16 storage).
    if act_dtype is None:
        act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    bf16_flow = act_dtype == jnp.bfloat16

    target_T = cfg.spec_size * cfg.freq_ratio
    if n_frames is None:
        n_frames = jnp.full((B,), T, dtype=jnp.int32)
    if T < target_T:
        x = jnp.pad(x, ((0, 0), (0, target_T - T), (0, 0)))
    x = resize_bicubic_time(
        x, n_frames, target_T,
        compute_dtype=act_dtype if bf16_flow else None,
    )
    x = x.reshape(B, cfg.freq_ratio, cfg.spec_size, F)
    x = x.transpose(0, 1, 3, 2).reshape(B, cfg.freq_ratio * F, cfg.spec_size)
    x = x[..., None]

    pe = params["patch_embed"]
    if bf16_flow:
        # bf16 in / f32 MXU accumulation / bf16 out (tiny K=16 contraction)
        x = jax.lax.conv_general_dilated(
            x, pe["proj"]["kernel"].astype(act_dtype),
            window_strides=cfg.patch_stride,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=act_dtype,
        ) + pe["proj"]["bias"].astype(act_dtype)
    else:
        x = jax.lax.conv_general_dilated(
            x, pe["proj"]["kernel"],
            window_strides=cfg.patch_stride,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=HI,
        ) + pe["proj"]["bias"]
    B_, Hp, Wp, D = x.shape
    x = _ln(x.reshape(B, Hp * Wp, D), pe["norm"]).astype(act_dtype)

    res = (Hp, Wp)
    for i_layer, depth in enumerate(cfg.depths):
        dim = int(cfg.embed_dim * 2**i_layer)
        heads = cfg.num_heads[i_layer]
        H, W = res
        window = cfg.window_size if min(H, W) > cfg.window_size else min(H, W)
        rel_idx = _relative_position_index(window, window).reshape(-1)
        N = window * window

        def block_bias(p):
            table = p["attn"]["relative_position_bias_table"]
            return table[rel_idx].reshape(N, N, heads).transpose(2, 0, 1)

        fuse_ok = dim <= max_fused_dim and window == cfg.window_size
        # VMEM-oversized stages (C=768): split (attn, MLP) kernel pair under
        # the bf16 flow — each half's weights fit where the full block's
        # don't. At f32 the wide stage is faster in XLA (same measurement
        # that set max_fused_dim), so keep the jnp fallback there.
        split_ok = (
            use_split
            and not fuse_ok
            and window == cfg.window_size
            and act_dtype == jnp.bfloat16
        )
        hidden = int(4 * dim)
        b = 0
        while b < depth:
            shift = 0 if b % 2 == 0 else (cfg.window_size // 2 if min(H, W) > cfg.window_size else 0)
            shift_next = cfg.window_size // 2 if min(H, W) > cfg.window_size else 0
            p = params[f"layers_{i_layer}_blocks_{b}"]
            if (
                use_pair and fuse_ok and shift == 0 and b + 1 < depth
                and shift_next
                and pair_plan(B, H, W, dim, heads, hidden, mm_dtype, window,
                              act_dtype=act_dtype)
            ):
                p2 = params[f"layers_{i_layer}_blocks_{b + 1}"]
                mask = jnp.asarray(_shift_attn_mask(H, W, window, shift_next))
                xs = fused_swin_pair(
                    x.reshape(B, H, W, dim), p, p2,
                    block_bias(p), block_bias(p2), mask,
                    window=window, num_heads=heads, shift=shift_next,
                    mm_dtype=mm_dtype, fast_softmax=fast_softmax,
                    interpret=interpret,
                )
                x = xs.reshape(B, H * W, dim)
                b += 2
                continue
            bias = block_bias(p)
            mask = (
                jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift else None
            )
            if fuse_ok or split_ok:
                xs = x.reshape(B, H, W, dim)
                if shift:
                    # H-axis roll only; the W roll happens in VMEM inside
                    # the kernel (roll_w), halving the rolls' HBM traffic
                    xs = jnp.roll(xs, -shift, axis=1)
                block_fn = fused_swin_block if fuse_ok else fused_swin_block_split
                xs = block_fn(
                    xs, p, bias, mask, window=window, num_heads=heads,
                    mm_dtype=mm_dtype, roll_w=shift, fast_softmax=fast_softmax,
                    interpret=interpret,
                )
                if shift:
                    xs = jnp.roll(xs, shift, axis=1)
                x = xs.reshape(B, H * W, dim)
            else:
                x = _block_jnp(
                    x.astype(jnp.float32), p, H, W, heads, window, shift,
                    bias, mask,
                )
            b += 1
        if i_layer < len(cfg.depths) - 1:
            pm = params[f"layers_{i_layer}_downsample"]
            xs = x.reshape(B, H, W, dim)
            xs = jnp.concatenate(
                [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]],
                axis=-1,
            ).reshape(B, -1, 4 * dim)
            m = _ln(xs, pm["norm"])
            if act_dtype == jnp.bfloat16:
                # every stage is a kernel under the bf16 flow now (wide
                # stages via the split pair), so keep the bf16 hand-off
                x = jnp.matmul(
                    m.astype(act_dtype),
                    pm["reduction"]["kernel"].astype(act_dtype),
                    preferred_element_type=jnp.float32,
                ).astype(act_dtype)
            else:
                # next stage runs in the jnp fallback: stay f32
                x = m @ pm["reduction"]["kernel"]
            res = (H // 2, W // 2)

    x = _ln(x, params["norm"])
    return x.mean(axis=1)
