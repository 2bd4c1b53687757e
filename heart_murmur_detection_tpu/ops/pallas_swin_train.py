"""Training-path fused Pallas swin block: forward + hand-written backward
kernels under jax.custom_vjp.

Why: the COLA CP / fine-tune step is entirely HTS-AT encoder fwd+bwd
(bench/cp_step_decomp.py: B=64 f32 — forward 103 ms, backward 235 ms,
optimizer 2 ms), while the fused *eval* kernel (ops/pallas_swin.py) runs the
same encoder forward in ~12 ms. XLA's autodiff backward inherits the eval
path's pathology (HBM round-trips per op, 24-wide head slices) and adds its
own saved-activation traffic. These kernels fuse each direction into one
VMEM-resident pass per spatial tile:

- forward: LN1 -> windowed attention -> proj -> +k1*x residual -> LN2 -> MLP
  -> +k2 residual, emitting (y, h1) where h1 is the post-attention residual
  (saved for backward — the only extra HBM write vs the eval kernel).
- backward: two kernels. The MLP half consumes (h1, dy) and recomputes
  LN2/fc1/gelu in VMEM (flash-style: cheaper than saving them); the
  attention half consumes (x, dh1) and recomputes LN1/qkv/softmax. Weight
  gradients accumulate in f32 VMEM across the sequential TPU grid
  (constant-index output blocks stay resident; init on the first step).

DropPath (stochastic depth, reference htsat.py SwinTransformerBlock) enters
as per-sample keep multipliers k1/k2 of shape (B, 1) with values in
{0, 1/keep_prob} — the branch output is scaled before the residual add, so
the backward scales the incoming gradient identically. The H/W cyclic rolls
of shifted blocks stay OUTSIDE as jnp.roll (XLA differentiates a roll as the
inverse roll; fusing them into the training kernels is a later optimization).

custom_vjp boundary: kernel-layout weights (head-dim lane-padded to hdp, 1-D
params as (1, n) rows — ops.pallas_swin._prep_weights). The padding/reshape
happens outside in jnp, so XLA's autodiff of pad/slice maps padded-layout
gradients back to the flax param tree; padded q/k/v columns are exact zeros
in both directions (see pallas_swin.fused_swin_block notes).

Parity: tests/test_pallas_swin_train.py checks y and every gradient against
jax.grad of the plain jnp block (interpret mode, f32, HIGHEST) to ~1e-4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_swin import _erf, _gelu_exact, _prep_weights

HI = jax.lax.Precision.HIGHEST


def _gelu_grad(x):
    # d/dx [0.5 x (1 + erf(x/sqrt2))] = Phi(x) + x phi(x)
    phi = jnp.exp(-0.5 * x * x) * (2.0 * jnp.pi) ** -0.5
    return 0.5 * (1.0 + _erf(x * (2.0 ** -0.5))) + x * phi


def _ln_fwd(x, scale, bias, eps=1e-5):
    """LayerNorm returning (out, xhat, rstd) with f32 stats."""
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd_input(dh, xhat, rstd, scale):
    """dL/dx of LayerNorm given dL/d(out), recomputed xhat/rstd."""
    dxhat = dh * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _partition(x, win):
    """(bb, win, cw, C) spatial tile of whole windows -> (nw, N, C)."""
    bb, _, cw, C = x.shape
    tw = cw // win
    return (
        x.reshape(bb, win, tw, win, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bb * tw, win * win, C)
    )


def _reverse(xw, bb, win, cw, C):
    tw = cw // win
    return (
        xw.reshape(bb, tw, win, win, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bb, win, cw, C)
    )


def _head_batch(t, heads, hdp, off=0):
    """(nw, N, k*Cp) lane-sliced head hh at off+hh*hdp -> (heads*nw, N, hdp)."""
    return jnp.concatenate(
        [t[:, :, off + hh * hdp : off + hh * hdp + hdp] for hh in range(heads)], 0
    )


def _head_unbatch(t, heads):
    """(heads*nw, N, hdp) -> (nw, N, heads*hdp), inverse of _head_batch."""
    nw = t.shape[0] // heads
    return jnp.concatenate(
        [t[hh * nw : (hh + 1) * nw] for hh in range(heads)], axis=-1
    )


def _attn_scores(xw, mask, bias, w_qkv, b_qkv, ln1_s, ln1_b,
                 *, heads, hdp, hd, mm_dtype, pack2=None):
    """Shared fwd/bwd recompute: window tokens -> (h, xhat1, rstd1, qs, ks,
    vs, P, packed). Matmul dtype/precision policy matches the eval kernel.

    pack2 (None = auto: C < 128, like the eval kernel): two consecutive
    64-token windows per attention instance fill all 128 VPU lanes; cross-
    window logits get -1e9 so their softmax weights are exact zeros — every
    downstream contraction and the softmax backward stay exact, so packed
    q/k/v/P reshape back losslessly. When packed, qs/ks/vs/P come back as
    (heads*nw/2, 2N, ...)."""
    nw, N, C = xw.shape
    Cp = heads * hdp
    if pack2 is None:
        pack2 = C < 128
    pack2 = pack2 and N == 64 and nw % 2 == 0
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    h, xhat1, rstd1 = _ln_fwd(xw, ln1_s, ln1_b)
    qkv = (
        jnp.dot(mm(h.reshape(nw * N, C)), mm(w_qkv), precision=prec,
                preferred_element_type=jnp.float32)
        + b_qkv
    ).reshape(nw, N, 3 * Cp)
    qs = _head_batch(qkv, heads, hdp, 0)
    ks = _head_batch(qkv, heads, hdp, Cp)
    vs = _head_batch(qkv, heads, hdp, 2 * Cp)
    if pack2:
        neg = jnp.full((heads, N, N), -1e9, jnp.float32)
        bd = jnp.concatenate(
            [
                jnp.concatenate([bias, neg], axis=2),
                jnp.concatenate([neg, bias], axis=2),
            ],
            axis=1,
        )
        qs = qs.reshape(heads * nw // 2, 2 * N, hdp)
        ks = ks.reshape(heads * nw // 2, 2 * N, hdp)
        vs = vs.reshape(heads * nw // 2, 2 * N, hdp)
        bias_add = jnp.repeat(bd, nw // 2, axis=0)
        if mask is not None:
            mp = mask.reshape(nw // 2, 2, N, N)
            m0, m1 = mp[:, 0], mp[:, 1]
            z = jnp.zeros_like(m0)
            mask = jnp.concatenate(
                [
                    jnp.concatenate([m0, z], axis=2),
                    jnp.concatenate([z, m1], axis=2),
                ],
                axis=1,
            )
    else:
        bias_add = jnp.repeat(bias, nw, axis=0)
    s = jax.lax.dot_general(
        mm(qs * (hd ** -0.5)), mm(ks),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    s = s + bias_add
    if mask is not None:
        s = s + jnp.tile(mask, (heads, 1, 1))
    p = jax.nn.softmax(s, axis=-1)
    return h, xhat1, rstd1, qs, ks, vs, p, pack2


def _attn_branch(x, mask, bias, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
                 *, win, heads, hdp, mm_dtype, pack2=None):
    """Attention branch WITHOUT the residual add: (bb, win, cw, C) -> same."""
    bb, _, cw, C = x.shape
    hd = C // heads
    Cp = heads * hdp
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    xw = _partition(x, win)
    nw, N = xw.shape[0], xw.shape[1]
    _, _, _, _, _, vs, p, packed = _attn_scores(
        xw, mask, bias, w_qkv, b_qkv, ln1_s, ln1_b,
        heads=heads, hdp=hdp, hd=hd, mm_dtype=mm_dtype, pack2=pack2,
    )
    ost = jax.lax.dot_general(
        mm(p), mm(vs),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if packed:
        ost = ost.reshape(heads * nw, N, hdp)
    o = _head_unbatch(ost, heads).reshape(nw * N, Cp)
    o = (
        jnp.dot(mm(o), mm(w_proj), precision=prec,
                preferred_element_type=jnp.float32)
        + b_proj
    ).reshape(nw, N, C)
    return _reverse(o, bb, win, cw, C)


def _mlp_branch(x, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, *, mm_dtype):
    """MLP branch WITHOUT the residual add (per-token)."""
    bb, win_, cw, C = x.shape
    n = bb * win_ * cw
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    m, _, _ = _ln_fwd(x, ln2_s, ln2_b)
    m = (
        jnp.dot(mm(m.reshape(n, C)), mm(w_fc1), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1
    )
    m = _gelu_exact(m).astype(x.dtype)
    m = (
        jnp.dot(mm(m), mm(w_fc2), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc2
    )
    return m.reshape(bb, win_, cw, C)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _train_fwd_kernel(
    x_ref, k1_ref, k2_ref, mask_ref,
    w_qkv, b_qkv, w_proj, b_proj, bias_ref,
    ln1_s, ln1_b, ln2_s, ln2_b,
    w_fc1, b_fc1, w_fc2, b_fc2,
    y_ref, h1_ref,
    *, bb, tw, win, heads, hdp, use_mask, mm_dtype, pack2=None,
):
    x = x_ref[:]
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    k1 = k1_ref[:, 0, :1].reshape(bb, 1, 1, 1)
    k2 = k2_ref[:, 0, :1].reshape(bb, 1, 1, 1)
    a = _attn_branch(
        x, mask, bias_ref[:], w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], win=win, heads=heads, hdp=hdp, mm_dtype=mm_dtype,
        pack2=pack2,
    )
    h1 = (x.astype(jnp.float32) + k1 * a.astype(jnp.float32)).astype(x.dtype)
    m = _mlp_branch(
        h1, ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )
    y_ref[:] = (h1.astype(jnp.float32) + k2 * m.astype(jnp.float32)).astype(x.dtype)
    h1_ref[:] = h1


def _acc(ref, val):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (
        pl.program_id(2) == 0
    )

    @pl.when(first)
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += val


def _bwd_mlp_kernel(
    h1_ref, dy_ref, k2_ref,
    ln2_s, ln2_b, w_fc1, b_fc1, w_fc2,
    dh1_ref, d_ln2s, d_ln2b, d_w1, d_b1, d_w2, d_b2,
    *, bb, mm_dtype,
):
    """y = h1 + k2*mlp(LN2(h1)): given dy -> dh1 + weight-grad accumulation."""
    h1 = h1_ref[:]
    _, win_, cw, C = h1.shape
    hidden = w_fc1.shape[1]
    n = bb * win_ * cw
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    k2 = k2_ref[:, 0, :1].reshape(bb, 1, 1, 1)
    dy = dy_ref[:].astype(jnp.float32)

    mfull, xhat, rstd = _ln_fwd(h1, ln2_s[0], ln2_b[0])
    m = mfull.reshape(n, C)
    a1 = (
        jnp.dot(mm(m), mm(w_fc1[:]), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1[0]
    )
    g = _gelu_exact(a1)

    dyk = (k2 * dy).reshape(n, C)
    # weight grads: token-dim contractions (f32 accumulate on the MXU)
    _acc(d_w2, jax.lax.dot_general(
        mm(g), mm(dyk), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc(d_b2, jnp.sum(dyk, axis=0, keepdims=True))
    dg = jax.lax.dot_general(  # dyk @ W2^T without a VMEM transpose
        mm(dyk), mm(w_fc2[:]), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)
    da1 = dg * _gelu_grad(a1)
    _acc(d_w1, jax.lax.dot_general(
        mm(m), mm(da1), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc(d_b1, jnp.sum(da1, axis=0, keepdims=True))
    dm = jax.lax.dot_general(
        mm(da1), mm(w_fc1[:]), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(bb, win_, cw, C)
    _acc(d_ln2s, jnp.sum((dm * xhat).reshape(n, C), axis=0, keepdims=True))
    _acc(d_ln2b, jnp.sum(dm.reshape(n, C), axis=0, keepdims=True))
    dh1 = dy + _ln_bwd_input(dm, xhat, rstd, ln2_s[0])
    dh1_ref[:] = dh1.astype(dh1_ref.dtype)


def _bwd_attn_kernel(
    x_ref, dh1_ref, k1_ref, mask_ref,
    w_qkv, b_qkv, w_proj, bias_ref, ln1_s, ln1_b,
    dx_ref, d_qkvw, d_qkvb, d_projw, d_projb, d_bias, d_ln1s, d_ln1b,
    *, bb, tw, win, heads, hdp, use_mask, mm_dtype, pack2=None,
):
    """h1 = x + k1*attn(x): given dh1 -> dx + weight/bias-grad accumulation."""
    x = x_ref[:]
    _, win_, cw, C = x.shape
    hd = C // heads
    Cp = heads * hdp
    N = win * win
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    k1 = k1_ref[:, 0, :1].reshape(bb, 1, 1, 1)
    dh1 = dh1_ref[:].astype(jnp.float32)

    xw = _partition(x, win)
    nw = xw.shape[0]
    h, xhat1, rstd1, qs, ks, vs, p, packed = _attn_scores(
        xw, mask, bias_ref[:], w_qkv[:], b_qkv[0], ln1_s[0], ln1_b[0],
        heads=heads, hdp=hdp, hd=hd, mm_dtype=mm_dtype, pack2=pack2,
    )
    # recompute pre-proj concat (needed for dWproj)
    ost = jax.lax.dot_general(
        mm(p), mm(vs), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    if packed:
        ost = ost.reshape(heads * nw, N, hdp)
    o_pre = _head_unbatch(ost, heads).reshape(nw * N, Cp)

    dw = _partition(k1 * dh1, win).reshape(nw * N, C)  # branch-output grad
    _acc(d_projw, jax.lax.dot_general(
        mm(o_pre), mm(dw), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc(d_projb, jnp.sum(dw, axis=0, keepdims=True))
    do = jax.lax.dot_general(
        mm(dw), mm(w_proj[:]), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(nw, N, Cp)
    dost = _head_batch(do, heads, hdp, 0)  # (heads*nw, N, hdp)
    if packed:
        # cross-window P entries are exact zeros, so the packed softmax
        # backward and q/k/v contractions are exact (see _attn_scores)
        dost = dost.reshape(heads * nw // 2, 2 * N, hdp)

    dp = jax.lax.dot_general(
        mm(dost), mm(vs), dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(
        mm(p), mm(dost), dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if packed:
        # diagonal blocks via plain slices (a 6-D reshape+slice trips
        # Mosaic's layout inference: "unsupported shape cast")
        d00 = ds[:, :N, :N].reshape(heads, nw // 2, N, N)
        d11 = ds[:, N:, N:].reshape(heads, nw // 2, N, N)
        _acc(d_bias, d00.sum(axis=1) + d11.sum(axis=1))
    else:
        _acc(d_bias, ds.reshape(heads, nw, N, N).sum(axis=1))
    scale = hd ** -0.5
    dq = scale * jax.lax.dot_general(
        mm(ds), mm(ks), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        mm(ds), mm(qs), dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )
    if packed:
        dq = dq.reshape(heads * nw, N, hdp)
        dk = dk.reshape(heads * nw, N, hdp)
        dv = dv.reshape(heads * nw, N, hdp)
    dqkv = jnp.concatenate(
        [
            _head_unbatch(dq, heads),
            _head_unbatch(dk, heads),
            _head_unbatch(dv, heads),
        ],
        axis=-1,
    ).reshape(nw * N, 3 * Cp)
    h_flat = h.reshape(nw * N, C)
    _acc(d_qkvw, jax.lax.dot_general(
        mm(h_flat), mm(dqkv), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc(d_qkvb, jnp.sum(dqkv, axis=0, keepdims=True))
    dh = jax.lax.dot_general(
        mm(dqkv), mm(w_qkv[:]), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(nw, N, C)
    _acc(d_ln1s, jnp.sum((dh * xhat1).reshape(nw * N, C), axis=0, keepdims=True))
    _acc(d_ln1b, jnp.sum(dh.reshape(nw * N, C), axis=0, keepdims=True))
    dxw = _ln_bwd_input(dh, xhat1, rstd1, ln1_s[0])
    dx = dh1 + _reverse(dxw, bb, win, cw, C).astype(jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------


def _tile_bb(B, per_row_bytes, fixed_bytes, budget=13 << 20):
    bb = max(1, min(B, (budget - fixed_bytes) // max(per_row_bytes, 1)))
    while B % bb:
        bb -= 1
    return bb


def _specs(bb, win, tw, N, C, nwh):
    xspec = pl.BlockSpec(
        (bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    # k multipliers ship lane-broadcast as (B, 1, 128): Mosaic constrains a
    # block's LAST TWO dims (must be (8,128)-divisible or full-size) — the
    # (1, 128) tail is always legal, leaving the leading bb unconstrained
    kspec = pl.BlockSpec(
        (bb, 1, 128), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec(
        (1, 1, tw, N, N), lambda b, i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return xspec, kspec, mspec, full


@functools.lru_cache(maxsize=None)
def _make_block_train(win, heads, hdp, use_mask, mm_name, interpret, pack2=None):
    """custom_vjp fused train block for a static geometry. mm_name in
    ('float32','bfloat16'). All array args are kernel-layout (padded)."""
    mm_dtype = jnp.float32 if mm_name == "float32" else jnp.bfloat16

    def _geom(x, tw):
        B, H, W, C = x.shape
        nwh = H // win
        if tw is None:
            tw = min(W // win, 8)
        assert (W // win) % tw == 0
        return B, H, W, C, nwh, tw

    def _fwd_call(x, k1, k2, mask_arr, kargs, tw):
        B, H, W, C, nwh, tw = _geom(x, tw)
        N = win * win
        Cp = heads * hdp
        hidden = kargs[9].shape[1]
        ab = jnp.dtype(x.dtype).itemsize
        wb = 2 if mm_dtype == jnp.bfloat16 else 4
        weights = (C * 3 * Cp + Cp * C + 2 * C * hidden) * wb
        act_row = tw * N * ((15 * C + 4 * Cp + hidden) * ab + heads * N * 4)
        io_row = 6 * tw * N * C * ab  # x in + y/h1 out, double-buffered
        bb = _tile_bb(B, act_row + io_row, weights)
        xspec, kspec, mspec, full = _specs(bb, win, tw, N, C, nwh)
        wspecs = [full(a.shape) for a in kargs]
        y, h1 = pl.pallas_call(
            functools.partial(
                _train_fwd_kernel, bb=bb, tw=tw, win=win, heads=heads,
                hdp=hdp, use_mask=use_mask, mm_dtype=mm_dtype, pack2=pack2,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            ],
            grid=(B // bb, nwh, (W // win) // tw),
            in_specs=[xspec, kspec, kspec, mspec] + wspecs,
            out_specs=[xspec, xspec],
            interpret=interpret,
        )(x, k1, k2, mask_arr, *kargs)
        return y, h1

    @jax.custom_vjp
    def block(x, k1, k2, mask_arr,
              w_qkv, b_qkv, w_proj, b_proj, bias,
              ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2):
        kargs = (w_qkv, b_qkv, w_proj, b_proj, bias,
                 ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2)
        y, _ = _fwd_call(x, k1, k2, mask_arr, kargs, None)
        return y

    def block_fwd(x, k1, k2, mask_arr,
                  w_qkv, b_qkv, w_proj, b_proj, bias,
                  ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2):
        kargs = (w_qkv, b_qkv, w_proj, b_proj, bias,
                 ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2)
        y, h1 = _fwd_call(x, k1, k2, mask_arr, kargs, None)
        return y, (x, h1, k1, k2, mask_arr,
                   w_qkv, b_qkv, w_proj, bias, ln1_s, ln1_b,
                   ln2_s, ln2_b, w_fc1, b_fc1, w_fc2)

    def block_bwd(res, dy):
        (x, h1, k1, k2, mask_arr, w_qkv, b_qkv, w_proj, bias,
         ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2) = res
        B, H, W, C, nwh, tw = _geom(x, None)
        N = win * win
        Cp = heads * hdp
        hidden = w_fc1.shape[1]
        ab = jnp.dtype(x.dtype).itemsize
        wb = 2 if mm_dtype == jnp.bfloat16 else 4
        xspec, kspec, mspec, full = _specs(1, win, tw, N, C, nwh)

        # ---- MLP half: (h1, dy) -> dh1 + fc/ln2 grads
        mlp_w = (2 * C * hidden) * wb
        mlp_acc = (2 * C * hidden + 2 * C + hidden + C) * 4
        mlp_row = tw * N * ((10 * C + 4 * hidden) * 4 + 6 * C * ab)
        bb_m = _tile_bb(B, mlp_row, mlp_w + mlp_acc)
        xspec_m, kspec_m, _, _ = _specs(bb_m, win, tw, N, C, nwh)
        outs = pl.pallas_call(
            functools.partial(_bwd_mlp_kernel, bb=bb_m, mm_dtype=mm_dtype),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((C, hidden), jnp.float32),
                jax.ShapeDtypeStruct((1, hidden), jnp.float32),
                jax.ShapeDtypeStruct((hidden, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ],
            grid=(B // bb_m, nwh, (W // win) // tw),
            in_specs=[xspec_m, xspec_m, kspec_m,
                      full((1, C)), full((1, C)),
                      full((C, hidden)), full((1, hidden)), full((hidden, C))],
            out_specs=[xspec_m,
                       full((1, C)), full((1, C)),
                       full((C, hidden)), full((1, hidden)),
                       full((hidden, C)), full((1, C))],
            interpret=interpret,
        )(h1, dy, k2, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2)
        dh1, dln2s, dln2b, dw1, db1, dw2, db2 = outs

        # ---- attention half: (x, dh1) -> dx + qkv/proj/ln1/bias grads
        at_w = (C * 3 * Cp + Cp * C) * wb
        at_acc = (C * 3 * Cp + 3 * Cp + Cp * C + 2 * C + C) * 4 + heads * N * N * 4
        at_row = tw * N * ((12 * C + 12 * Cp) * 4 + 6 * C * ab + heads * N * 12)
        bb_a = _tile_bb(B, at_row, at_w + at_acc)
        xspec_a, kspec_a, mspec_a, _ = _specs(bb_a, win, tw, N, C, nwh)
        outs = pl.pallas_call(
            functools.partial(
                _bwd_attn_kernel, bb=bb_a, tw=tw, win=win, heads=heads,
                hdp=hdp, use_mask=use_mask, mm_dtype=mm_dtype, pack2=pack2,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                jax.ShapeDtypeStruct((C, 3 * Cp), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * Cp), jnp.float32),
                jax.ShapeDtypeStruct((Cp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((heads, N, N), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ],
            grid=(B // bb_a, nwh, (W // win) // tw),
            in_specs=[xspec_a, xspec_a, kspec_a, mspec_a,
                      full((C, 3 * Cp)), full((1, 3 * Cp)),
                      full((Cp, C)), full((heads, N, N)),
                      full((1, C)), full((1, C))],
            out_specs=[xspec_a,
                       full((C, 3 * Cp)), full((1, 3 * Cp)),
                       full((Cp, C)), full((1, C)),
                       full((heads, N, N)),
                       full((1, C)), full((1, C))],
            interpret=interpret,
        )(x, dh1, k1, mask_arr, w_qkv, b_qkv, w_proj, bias, ln1_s, ln1_b)
        dx, dqkvw, dqkvb, dprojw, dprojb, dbias, dln1s, dln1b = outs

        z = lambda a: jnp.zeros_like(a)
        # cotangent dtypes must match the primals (bf16 matmul weights)
        dqkvw = dqkvw.astype(w_qkv.dtype)
        dprojw = dprojw.astype(w_proj.dtype)
        dw1 = dw1.astype(w_fc1.dtype)
        dw2 = dw2.astype(w_fc2.dtype)
        return (dx, z(res[2]), z(res[3]), z(res[4]),
                dqkvw, dqkvb, dprojw, dprojb, dbias,
                dln1s, dln1b, dln2s, dln2b, dw1, db1, dw2, db2)

    block.defvjp(block_fwd, block_bwd)
    return block


def fused_swin_block_train(
    x: jnp.ndarray,
    params: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    window: int = 8,
    num_heads: int,
    interpret: bool = False,
    mm_dtype=jnp.float32,
    pack2=None,
) -> jnp.ndarray:
    """Differentiable fused swin block on spatial x (B, H, W, C).

    params: flax SwinBlock param subtree (norm1/attn/norm2/mlp) — gradients
    flow back into the same tree via the jnp pad/reshape outside the
    custom_vjp. bias (heads, N, N) from the relative-position table (table
    grads via the outer gather's VJP). mask (nW, N, N) additive or None —
    the caller rolls x before/after for shifted blocks. k1/k2 (B, 1) f32
    DropPath keep multipliers (values 0 or 1/keep; pass ones when
    deterministic).
    """
    B, H, W, C = x.shape
    win = window
    nwh, nww = H // win, W // win
    N = win * win
    hd = C // num_heads
    hdp = ((hd + 31) // 32) * 32
    tw = min(nww, 8)
    use_mask = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((nwh, nww // tw, tw, N, N), jnp.float32)
    else:
        mask_arr = mask.reshape(nwh, nww // tw, tw, N, N)
    kargs = _prep_weights(params, C, num_heads, hdp, bias, wdtype=mm_dtype)
    block = _make_block_train(
        win, num_heads, hdp, use_mask,
        "bfloat16" if mm_dtype == jnp.bfloat16 else "float32", interpret,
        pack2,
    )
    k1v = jnp.broadcast_to(k1.astype(jnp.float32).reshape(B, 1, 1), (B, 1, 128))
    k2v = jnp.broadcast_to(k2.astype(jnp.float32).reshape(B, 1, 1), (B, 1, 128))
    return block(x, k1v, k2v, mask_arr, *kargs)
