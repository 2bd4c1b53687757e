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

Numerics: f32 matmuls run at Precision.HIGHEST with f32 accumulation;
bfloat16 mode (mm_dtype) halves MXU passes and keeps f32 accumulation via
preferred_element_type. Interpret-mode output matches models.htsat.SwinBlock
(eval) to ~1e-5 (tests/test_pallas_swin.py); on real TPU hardware Mosaic's
transcendental approximations (exp/rsqrt in softmax+LN) give ~2e-2 absolute
block-output deltas that wash out to feature cosine >= 0.99999 end-to-end
(RESULTS.md round-2 table) — an inference-path tolerance, documented in
PARITY.md.
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
    hdp: int, mm_dtype, roll_w: int,
):
    C = x_ref.shape[-1]
    hd = C // heads
    N = win * win
    nw = bb * tw  # windows processed per kernel instance
    Cp = heads * hdp  # lane-padded q/k/v width (hdp=32-aligned head dim)
    mm = lambda a: a.astype(mm_dtype)
    # Mosaic rejects fp32 contract_precision on bf16 operands ("Bad lhs
    # type"); bf16 matmuls use default precision + f32 accumulation instead
    prec = HI if mm_dtype == jnp.float32 else None
    # (bb, win, win*tw, C) -> windows (bb*tw, N, C) via VMEM reshapes
    x = x_ref[:]  # (bb, win, win*tw, C)
    if roll_w:
        # shifted blocks: the W-axis cyclic shift happens here in VMEM (the
        # instance sees the full width when tw == W//win); the H-axis roll
        # stays an XLA op outside (it crosses grid tiles). Left-roll by
        # roll_w == two slices + concat.
        x = jnp.concatenate([x[:, :, roll_w:], x[:, :, :roll_w]], axis=2)
    xw = x.reshape(bb, win, tw, win, C).transpose(0, 2, 1, 3, 4).reshape(nw, N, C)
    tw = nw  # downstream treats the fused (batch x window) axis uniformly

    h = _ln(xw, ln1_s[0], ln1_b[0])
    qkv = (
        jnp.dot(mm(h.reshape(tw * N, C)), mm(w_qkv[:]), precision=prec,
                preferred_element_type=jnp.float32)
        + b_qkv[0]
    ).reshape(tw, N, 3 * Cp)  # sublane split only; Mosaic can't split lanes
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    # per-head loop: lane-dim slices (32-aligned via hdp padding) keep
    # reshapes legal; matmuls get a single batch dim (tw), which Mosaic
    # supports
    outs = []
    for hh in range(heads):
        qh = qkv[:, :, hh * hdp : hh * hdp + hdp]
        kh = qkv[:, :, Cp + hh * hdp : Cp + hh * hdp + hdp]
        vh = qkv[:, :, 2 * Cp + hh * hdp : 2 * Cp + hh * hdp + hdp]
        a = jax.lax.dot_general(
            mm(qh * (hd ** -0.5)), mm(kh),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (tw, N, N); padded tail dims are exact zeros -> no logit change
        a = a + bias_ref[hh]
        if mask is not None:
            a = a + mask
        a = jax.nn.softmax(a, axis=-1)
        outs.append(
            jax.lax.dot_general(
                mm(a), mm(vh),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32,
            )
        )  # (tw, N, hdp)
    o = jnp.concatenate(outs, axis=-1).reshape(tw * N, Cp)
    o = (
        jnp.dot(mm(o), mm(w_proj[:]), precision=prec,
                preferred_element_type=jnp.float32)
        + b_proj[0]
    ).reshape(tw, N, C)

    h1 = xw + o
    m = _ln(h1, ln2_s[0], ln2_b[0]).reshape(tw * N, C)
    m = (
        jnp.dot(mm(m), mm(w_fc1[:]), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1[0]
    )
    m = _gelu_exact(m)
    m = (
        jnp.dot(mm(m), mm(w_fc2[:]), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc2[0]
    ).reshape(tw, N, C)
    out = h1 + m

    # back to spatial (bb, win, win*tw, C); undo the W roll
    out = out.reshape(bb, tw // bb, win, win, C).transpose(
        0, 2, 1, 3, 4
    ).reshape(bb, win, (tw // bb) * win, C)
    if roll_w:
        out = jnp.concatenate([out[:, :, -roll_w:], out[:, :, :-roll_w]], axis=2)
    out_ref[:] = out


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
    pad_head_dim: bool = True,
    mm_dtype=jnp.float32,
    roll_w: int = 0,
) -> jnp.ndarray:
    """One swin block on spatial input x (B, H, W, C).

    params: flax SwinBlock param subtree (norm1/attn/norm2/mlp). bias:
    precomputed relative-position bias (heads, N, N). mask: shifted-window
    additive mask (nW, N, N) or None — the caller rolls x before/after.

    pad_head_dim: zero-pad each head's qkv columns (and proj rows) from
    head_dim to the next multiple of 32 so every in-kernel slice is
    lane-aligned (HTS-AT's head_dim is 24 at every stage — a 128-lane VPU
    pathology). Exact numerics: padded q/k columns are zero so logits are
    unchanged; padded v columns produce zeros that hit zero proj rows.
    mm_dtype: matmul input dtype (bfloat16 halves MXU passes; accumulation
    stays f32 via preferred_element_type — feature cosine vs f32 > 0.9999).
    roll_w: cyclic left-shift along W applied inside the kernel (and undone
    on the output) — for shifted blocks the caller then only rolls the H
    axis outside: jnp.roll(x, -s, axis=1); fused(..., roll_w=s); roll back.
    Requires tw == W//window (the default) so each instance sees full W.
    """
    B, H, W, C = x.shape
    win = window
    nwh, nww = H // win, W // win
    if tw is None:
        tw = min(nww, 8)
    assert nww % tw == 0
    if roll_w:
        assert tw == nww, "in-kernel W roll needs the full width per instance"
    N = win * win
    hd = C // num_heads
    hdp = ((hd + 31) // 32) * 32 if pad_head_dim else hd
    Cp = num_heads * hdp
    hidden = params["mlp"]["fc1"]["kernel"].shape[1]
    if bb is None:
        # batch rows per kernel instance: amortizes weight DMAs across the
        # grid, bounded by the 16MB scoped-VMEM limit. Model (calibrated on
        # observed Mosaic stack sizes): per-instance activations + double-
        # buffered in/out tiles + one copy of the weights, kept <= 13MB.
        weights = (C * 3 * Cp + Cp * C + 2 * C * hidden) * 4
        act_row = tw * N * (13 * C + 4 * Cp + hidden + num_heads * N) * 4
        io_row = 4 * tw * N * C * 4
        bb = ((13 << 20) - weights) // max(act_row + io_row, 1)
        bb = max(1, min(B, bb))
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
    w_qkv = jnp.asarray(p["attn"]["qkv"]["kernel"])  # (C, 3C), cols [3][h][d]
    b_qkv = jnp.asarray(p["attn"]["qkv"]["bias"])
    w_proj = jnp.asarray(p["attn"]["proj"]["kernel"])  # (C, C), rows [h][d]
    if hdp != hd:
        pad = ((0, 0), (0, 0), (0, 0), (0, hdp - hd))
        w_qkv = jnp.pad(w_qkv.reshape(C, 3, num_heads, hd), pad).reshape(
            C, 3 * Cp
        )
        b_qkv = jnp.pad(
            b_qkv.reshape(3, num_heads, hd), pad[1:]
        ).reshape(3 * Cp)
        w_proj = jnp.pad(
            w_proj.reshape(num_heads, hd, C),
            ((0, 0), (0, hdp - hd), (0, 0)),
        ).reshape(Cp, C)
    args = (
        x, mask_arr,
        w_qkv, b_qkv.reshape(1, -1),
        w_proj, v1(p["attn"]["proj"]["bias"]),
        bias,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        p["mlp"]["fc1"]["kernel"], v1(p["mlp"]["fc1"]["bias"]),
        p["mlp"]["fc2"]["kernel"], v1(p["mlp"]["fc2"]["bias"]),
    )

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid = (B // bb, nwh, nww // tw)
    return pl.pallas_call(
        functools.partial(
            _kernel, bb=bb, tw=tw, win=win, heads=num_heads, use_mask=use_mask,
            hdp=hdp, mm_dtype=mm_dtype, roll_w=roll_w,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tw, N, N), lambda b, i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            full((C, 3 * Cp)), full((1, 3 * Cp)),
            full((Cp, C)), full((1, C)),
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
