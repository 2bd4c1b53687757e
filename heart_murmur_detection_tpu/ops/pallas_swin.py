"""Fused Pallas swin-block kernel for HTS-AT.

Why: the encoder is HBM-bandwidth-bound, not FLOP-bound (stage-1 alone —
4096 tokens at C=96 — costs 26 ms of the 61 ms batch-64 extraction graph at
~2.5 TF/s effective). Each XLA block round-trips x through HBM ~10x (norms,
qkv, attention, proj, MLP, window partition/reverse transposes). This kernel
computes LN1 -> windowed attention (+relative-position bias, +shift mask) ->
proj -> residual -> LN2 -> MLP -> residual for a tile of windows entirely in
VMEM: HBM traffic becomes one read + one write of x per block.

Layout: x stays spatial (B, H, W, C); the window partition happens via VMEM
reshapes inside the kernel (no HBM transpose). The cyclic shift (shifted
blocks) is a jnp.roll outside — one unavoidable data movement.

Numerics: all matmuls run at Precision.HIGHEST with f32 accumulation —
bandwidth, not FLOPs, is the constraint, so exactness is free. Matches
models.htsat.SwinBlock (eval mode) to ~1e-5; tested in tests/test_pallas_swin.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max err 1.5e-7) — Mosaic lowers
    neither erf nor erfc, so implement it (pallas guide: 'implement it')."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # jax.nn.gelu(approximate=False) == 0.5 x (1 + erf(x/sqrt2))
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(
    x_ref, mask_ref,
    w_qkv, b_qkv, w_proj, b_proj, bias_ref,
    ln1_s, ln1_b, ln2_s, ln2_b,
    w_fc1, b_fc1, w_fc2, b_fc2,
    out_ref,
    *, bb: int, tw: int, win: int, heads: int, use_mask: bool,
):
    C = x_ref.shape[-1]
    hd = C // heads
    N = win * win
    nw = bb * tw  # windows processed per kernel instance
    # (bb, win, win*tw, C) -> windows (bb*tw, N, C) via VMEM reshapes
    x = x_ref[:]  # (bb, win, win*tw, C)
    xw = x.reshape(bb, win, tw, win, C).transpose(0, 2, 1, 3, 4).reshape(nw, N, C)
    tw = nw  # downstream treats the fused (batch x window) axis uniformly

    h = _ln(xw, ln1_s[0], ln1_b[0])
    qkv = (
        jnp.dot(h.reshape(tw * N, C), w_qkv[:], precision=HI,
                preferred_element_type=jnp.float32)
        + b_qkv[0]
    ).reshape(tw, N, 3 * C)  # sublane split only; Mosaic can't split lanes
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    # per-head loop: lane-dim slices keep reshapes legal; matmuls get a
    # single batch dim (tw), which Mosaic supports
    outs = []
    for hh in range(heads):
        qh = qkv[:, :, hh * hd : (hh + 1) * hd]
        kh = qkv[:, :, C + hh * hd : C + (hh + 1) * hd]
        vh = qkv[:, :, 2 * C + hh * hd : 2 * C + (hh + 1) * hd]
        a = jax.lax.dot_general(
            qh * (hd ** -0.5), kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=HI, preferred_element_type=jnp.float32,
        )  # (tw, N, N)
        a = a + bias_ref[hh]
        if mask is not None:
            a = a + mask
        a = jax.nn.softmax(a, axis=-1)
        outs.append(
            jax.lax.dot_general(
                a, vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=HI, preferred_element_type=jnp.float32,
            )
        )  # (tw, N, hd)
    o = jnp.concatenate(outs, axis=-1).reshape(tw * N, C)
    o = (
        jnp.dot(o, w_proj[:], precision=HI, preferred_element_type=jnp.float32)
        + b_proj[0]
    ).reshape(tw, N, C)

    h1 = xw + o
    m = _ln(h1, ln2_s[0], ln2_b[0]).reshape(tw * N, C)
    m = (
        jnp.dot(m, w_fc1[:], precision=HI, preferred_element_type=jnp.float32)
        + b_fc1[0]
    )
    m = _gelu_exact(m)
    m = (
        jnp.dot(m, w_fc2[:], precision=HI, preferred_element_type=jnp.float32)
        + b_fc2[0]
    ).reshape(tw, N, C)
    out = h1 + m

    # back to spatial (bb, win, win*tw, C)
    out_ref[:] = out.reshape(bb, tw // bb, win, win, C).transpose(
        0, 2, 1, 3, 4
    ).reshape(bb, win, (tw // bb) * win, C)


def fused_swin_block(
    x: jnp.ndarray,
    params: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    window: int = 8,
    num_heads: int,
    tw: Optional[int] = None,
    bb: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One swin block on spatial input x (B, H, W, C).

    params: flax SwinBlock param subtree (norm1/attn/norm2/mlp). bias:
    precomputed relative-position bias (heads, N, N). mask: shifted-window
    additive mask (nW, N, N) or None — the caller rolls x before/after.
    """
    B, H, W, C = x.shape
    win = window
    nwh, nww = H // win, W // win
    if tw is None:
        tw = min(nww, 8)
    assert nww % tw == 0
    N = win * win
    if bb is None:
        # batch rows per kernel instance: amortizes weight DMAs across the
        # grid; bounded by a ~8MB VMEM activation budget
        hidden = params["mlp"]["fc1"]["kernel"].shape[1]
        per_row = tw * N * (14 * C + hidden) * 4
        bb = max(1, min(B, (8 << 20) // max(per_row, 1)))
        while B % bb:
            bb -= 1
    assert B % bb == 0
    use_mask = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((nwh, nww // tw, tw, N, N), jnp.float32)
    else:
        mask_arr = mask.reshape(nwh, nww // tw, tw, N, N)

    p = params
    v1 = lambda a: jnp.asarray(a).reshape(1, -1)  # 1-D params as 2-D rows
    args = (
        x, mask_arr,
        p["attn"]["qkv"]["kernel"], v1(p["attn"]["qkv"]["bias"]),
        p["attn"]["proj"]["kernel"], v1(p["attn"]["proj"]["bias"]),
        bias,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        p["mlp"]["fc1"]["kernel"], v1(p["mlp"]["fc1"]["bias"]),
        p["mlp"]["fc2"]["kernel"], v1(p["mlp"]["fc2"]["bias"]),
    )
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid = (B // bb, nwh, nww // tw)
    return pl.pallas_call(
        functools.partial(
            _kernel, bb=bb, tw=tw, win=win, heads=num_heads, use_mask=use_mask
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tw, N, N), lambda b, i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            full((C, 3 * C)), full((1, 3 * C)),
            full((C, C)), full((1, C)),
            full((num_heads, N, N)),
            full((1, C)), full((1, C)), full((1, C)), full((1, C)),
            full((C, hidden)), full((1, hidden)),
            full((hidden, C)), full((1, C)),
        ],
        out_specs=pl.BlockSpec(
            (bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*args)
