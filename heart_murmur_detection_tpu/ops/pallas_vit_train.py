"""Training-path fused Pallas ViT block: forward + hand-written backward
kernels under jax.custom_vjp — the MAE-family analog of pallas_swin_train.

Why: the MAE / Audio-MAE CP steps (pretrain/mae_training.py, reference
src/pretrain/mae_training.py:141-368) are dominated by the 12 encoder ViT
blocks' fwd+bwd, which XLA runs with ~10 HBM round-trips of the (B, N, C)
activation per block per direction plus saved-activation traffic. The fused
*eval* kernels (ops/pallas_vit.py) already won 2.8x (ViT-S) / 1.9x (ViT-B)
on the extraction forward; these kernels extend that to both directions of
the train step:

- forward: LN1 -> qkv -> full-sequence attention (query-chunked, exact
  softmax — all keys resident, no flash rescale) -> proj -> +x -> LN2 ->
  MLP -> +h1, emitting (y, h1) where h1 is the post-attention residual
  (the only extra HBM write vs the eval kernel).
- backward: two kernels. The MLP half consumes (h1, dy) and recomputes
  LN2/fc1/gelu in VMEM; the attention half consumes (x, dh1) and recomputes
  LN1/qkv/softmax chunk-by-chunk (flash-style recompute, exact numerics).

Two weight-gradient strategies, chosen by a VMEM plan:
- "acc" (ViT-S class, C<=384): weight grads accumulate in f32 VMEM across
  the sequential batch grid (constant-index output blocks stay resident),
  exactly like pallas_swin_train.
- "emit" (ViT-B class, C=768): the f32 accumulators alone (d_qkvw 7 MB,
  d_w1/d_w2 19 MB) exceed VMEM, so the kernels instead EMIT the small
  per-token residuals the weight grads contract against (h=LN1(x), o_pre,
  dqkv, m=LN2(h1), g=gelu(a1), da1) in the activation dtype, and the
  (tokens x tokens)-free weight-grad matmuls run OUTSIDE in XLA — pure MXU
  contractions XLA already runs at speed-of-light; what the kernels keep
  fused is everything XLA does badly (LN stats + their backwards, softmax
  backward, gelu backward, the attention layout chain).

Attention scale: 1/sqrt(hd) is folded into the q columns of w_qkv (and
b_qkv) OUTSIDE the custom_vjp in plain jnp, so the kernels never scale and
XLA's autodiff of the fold maps gradients back to the flax tree. Same
boundary trick as pallas_swin_train's pad/reshape prep.

Sequence padding: tokens padded to a tile-aligned Np with n_real masking
padded key columns to -1e9 (exact softmax zeros). Correctness of gradients
at padded rows relies on the caller slicing y[:, :n_real] downstream — the
slice pullback delivers dy = 0 on padded rows, which (because padded key
columns of P are exact zeros) zeroes every padded-row contribution to
weight grads and keeps dx = 0 on padded rows (see tests).

Numerics class: identical to ops.pallas_swin_train — bf16 matmul inputs
with f32 accumulation, f32 LN stats/softmax/gelu islands, erf via the
A&S 7.1.26 polynomial. Interpret-mode parity of y and EVERY gradient vs
jax.grad of models.vit_mae.ViTBlock to ~2e-4 (tests/test_pallas_vit_train.py).

Reference context: trains the timm-Block encoder of
/root/reference/src/model/models_mae.py:29-552 (ViT-S) and
src/benchmark/baseline/audioMAE/models_mae.py (ViT-B).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_swin import _gelu_exact
from .pallas_swin_train import _gelu_grad, _ln_bwd_input
from .pallas_vit import _attn_half, _mlp_half, _chunks

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
HI = jax.lax.Precision.HIGHEST


def _ln_fwd6(x, scale, bias):
    """LayerNorm (eps 1e-6, the ViT value) returning (out, xhat, rstd)."""
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-6)
    xhat = (x - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _acc1(ref, val):
    """Accumulate into a constant-index output block over a 1-D grid."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += val


def _acc2(ref, val):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += val


def _hb(t, heads, hd, off=0):
    """(bb, Np, k*C) lane slice of head hh at off+hh*hd -> (heads*bb, Np, hd)."""
    return jnp.concatenate(
        [t[:, :, off + hh * hd : off + (hh + 1) * hd] for hh in range(heads)], 0
    )


def _hub(t, heads):
    """(heads*bb, Np, hd) -> (bb, Np, heads*hd)."""
    bb = t.shape[0] // heads
    return jnp.concatenate(
        [t[hh * bb : (hh + 1) * bb] for hh in range(heads)], axis=-1
    )


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _fwd_full_kernel(
    x_ref,
    w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
    ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2,
    y_ref, h1_ref,
    *, heads, q_chunk, mm_dtype, n_real,
):
    x = x_ref[:]
    h1 = _attn_half(
        x, n_real, w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
    )
    h1_ref[:] = h1
    y_ref[:] = _mlp_half(
        h1, ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )


def _fwd_attn_kernel(
    x_ref, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b, h1_ref,
    *, heads, q_chunk, mm_dtype, n_real,
):
    h1_ref[:] = _attn_half(
        x_ref[:], n_real, w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
    )


def _fwd_mlp_kernel(x_ref, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, y_ref,
                    *, mm_dtype):
    y_ref[:] = _mlp_half(
        x_ref[:], ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )


# ---------------------------------------------------------------------------
# backward: MLP half   y = h1 + mlp(LN2(h1)),  (h1, dy) -> dh1 (+ grads)
# ---------------------------------------------------------------------------


def _bwd_mlp_common(h1, dy, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, *, mm_dtype):
    """Shared recompute: returns (m, xhat, g, da1, dm, dh1) with f32 islands."""
    bb, nt, C = h1.shape
    n = bb * nt
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    dy = dy.astype(jnp.float32)
    mfull, xhat, rstd = _ln_fwd6(h1, ln2_s, ln2_b)
    m = mfull.reshape(n, C)
    a1 = (
        jnp.dot(mm(m), mm(w_fc1), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1
    )
    g = _gelu_exact(a1)
    dyf = dy.reshape(n, C)
    dg = jax.lax.dot_general(  # dy @ W2^T without a VMEM transpose
        mm(dyf), mm(w_fc2), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)
    da1 = dg * _gelu_grad(a1)
    dm = jax.lax.dot_general(
        mm(da1), mm(w_fc1), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(bb, nt, C)
    dh1 = dy + _ln_bwd_input(dm, xhat, rstd, ln2_s)
    return m, xhat, g, da1, dm, dh1


def _bwd_mlp_acc_kernel(
    h1_ref, dy_ref, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2,
    dh1_ref, d_ln2s, d_ln2b, d_w1, d_b1, d_w2, d_b2,
    *, mm_dtype,
):
    h1 = h1_ref[:]
    bb, nt, C = h1.shape
    n = bb * nt
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    m, xhat, g, da1, dm, dh1 = _bwd_mlp_common(
        h1, dy_ref[:], ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:],
        mm_dtype=mm_dtype,
    )
    dyf = dy_ref[:].astype(jnp.float32).reshape(n, C)
    _acc2(d_w2, jax.lax.dot_general(
        mm(g), mm(dyf), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc2(d_b2, jnp.sum(dyf, axis=0, keepdims=True))
    _acc2(d_w1, jax.lax.dot_general(
        mm(m), mm(da1), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc2(d_b1, jnp.sum(da1, axis=0, keepdims=True))
    _acc2(d_ln2s, jnp.sum((dm * xhat).reshape(n, C), axis=0, keepdims=True))
    _acc2(d_ln2b, jnp.sum(dm.reshape(n, C), axis=0, keepdims=True))
    dh1_ref[:] = dh1.astype(dh1_ref.dtype)


def _bwd_mlp_emit_kernel(
    h1_ref, dy_ref, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2,
    dh1_ref, m_ref, g_ref, da1_ref, d_ln2s, d_ln2b,
    *, mm_dtype,
):
    """Emit (m, g, da1) for outside weight-grad matmuls; LN grads (tiny)
    still accumulate in-kernel."""
    h1 = h1_ref[:]
    bb, nt, C = h1.shape
    n = bb * nt
    m, xhat, g, da1, dm, dh1 = _bwd_mlp_common(
        h1, dy_ref[:], ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:],
        mm_dtype=mm_dtype,
    )
    m_ref[:] = m.reshape(bb, nt, C).astype(m_ref.dtype)
    g_ref[:] = g.reshape(bb, nt, -1).astype(g_ref.dtype)
    da1_ref[:] = da1.reshape(bb, nt, -1).astype(da1_ref.dtype)
    _acc2(d_ln2s, jnp.sum((dm * xhat).reshape(n, C), axis=0, keepdims=True))
    _acc2(d_ln2b, jnp.sum(dm.reshape(n, C), axis=0, keepdims=True))
    dh1_ref[:] = dh1.astype(dh1_ref.dtype)


# ---------------------------------------------------------------------------
# backward: attention half   h1 = x + proj(attn(LN1(x))),  (x, dh1) -> dx
# ---------------------------------------------------------------------------


def _attn_bwd_core(x, dh1, w_qkv, b_qkv, w_proj, ln1_s, ln1_b,
                   *, heads, q_chunk, mm_dtype, n_real):
    """Chunked exact-softmax attention backward. Returns
    (h_flat, xhat1, o_pre (bb,Np,C), dqkv_flat, dh, dx) in act/f32."""
    bb, Np, C = x.shape
    hd = C // heads
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    act = x.dtype

    h, xhat1, rstd1 = _ln_fwd6(x, ln1_s, ln1_b)
    h = h.astype(act)
    qkv = (
        jnp.dot(mm(h.reshape(bb * Np, C)), mm(w_qkv), precision=prec,
                preferred_element_type=jnp.float32)
        + b_qkv
    ).astype(act).reshape(bb, Np, 3 * C)
    qs, ks, vs = _hb(qkv, heads, hd, 0), _hb(qkv, heads, hd, C), _hb(qkv, heads, hd, 2 * C)

    dh1f = dh1.astype(jnp.float32)
    do = jax.lax.dot_general(  # dh1 @ Wproj^T
        mm(dh1f.reshape(bb * Np, C)), mm(w_proj),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(act).reshape(bb, Np, C)
    dost = _hb(do, heads, hd, 0)  # (heads*bb, Np, hd)

    dk = jnp.zeros((heads * bb, Np, hd), jnp.float32)
    dv = jnp.zeros((heads * bb, Np, hd), jnp.float32)
    dq_chunks = []
    o_pre_chunks = []
    for o, qc in _chunks(Np, q_chunk):
        s = jax.lax.dot_general(
            mm(qs[:, o : o + qc]), mm(ks),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        if n_real is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_real, s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        o_pre_chunks.append(
            _hub(
                jax.lax.dot_general(
                    mm(p), mm(vs),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    precision=prec, preferred_element_type=jnp.float32,
                ).astype(act),
                heads,
            )
        )
        dost_c = dost[:, o : o + qc]
        dp = jax.lax.dot_general(
            mm(dost_c), mm(vs),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsa = ds.astype(act)
        dq_chunks.append(
            jax.lax.dot_general(
                mm(dsa), mm(ks),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32,
            ).astype(act)
        )
        dk = dk + jax.lax.dot_general(
            mm(dsa), mm(qs[:, o : o + qc]),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        dv = dv + jax.lax.dot_general(
            mm(p.astype(act)), mm(dost_c),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
    dq = jnp.concatenate(dq_chunks, axis=1) if len(dq_chunks) > 1 else dq_chunks[0]
    o_pre = jnp.concatenate(o_pre_chunks, axis=1) if len(o_pre_chunks) > 1 else o_pre_chunks[0]
    dqkv = jnp.concatenate(
        [_hub(dq, heads), _hub(dk.astype(act), heads), _hub(dv.astype(act), heads)],
        axis=-1,
    ).reshape(bb * Np, 3 * C)
    dh = jax.lax.dot_general(  # dqkv @ Wqkv^T
        mm(dqkv), mm(w_qkv), dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).reshape(bb, Np, C)
    dx = dh1f + _ln_bwd_input(dh, xhat1, rstd1, ln1_s)
    return h.reshape(bb * Np, C), xhat1, o_pre, dqkv, dh, dx


def _bwd_attn_acc_kernel(
    x_ref, dh1_ref, w_qkv, b_qkv, w_proj, ln1_s, ln1_b,
    dx_ref, d_qkvw, d_qkvb, d_projw, d_projb, d_ln1s, d_ln1b,
    *, heads, q_chunk, mm_dtype, n_real,
):
    x = x_ref[:]
    bb, Np, C = x.shape
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    h_flat, xhat1, o_pre, dqkv, dh, dx = _attn_bwd_core(
        x, dh1_ref[:], w_qkv[:], b_qkv[0], w_proj[:], ln1_s[0], ln1_b[0],
        heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype, n_real=n_real,
    )
    dwf = dh1_ref[:].astype(jnp.float32).reshape(bb * Np, C)
    _acc1(d_projw, jax.lax.dot_general(
        mm(o_pre.reshape(bb * Np, C)), mm(dwf),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc1(d_projb, jnp.sum(dwf, axis=0, keepdims=True))
    _acc1(d_qkvw, jax.lax.dot_general(
        mm(h_flat), mm(dqkv), dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32))
    _acc1(d_qkvb, jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True))
    _acc1(d_ln1s, jnp.sum((dh * xhat1).reshape(bb * Np, C), axis=0, keepdims=True))
    _acc1(d_ln1b, jnp.sum(dh.reshape(bb * Np, C), axis=0, keepdims=True))
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _bwd_attn_emit_kernel(
    x_ref, dh1_ref, w_qkv, b_qkv, w_proj, ln1_s, ln1_b,
    dx_ref, h_ref, opre_ref, dqkv_ref, d_ln1s, d_ln1b,
    *, heads, q_chunk, mm_dtype, n_real,
):
    x = x_ref[:]
    bb, Np, C = x.shape
    h_flat, xhat1, o_pre, dqkv, dh, dx = _attn_bwd_core(
        x, dh1_ref[:], w_qkv[:], b_qkv[0], w_proj[:], ln1_s[0], ln1_b[0],
        heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype, n_real=n_real,
    )
    h_ref[:] = h_flat.reshape(bb, Np, C).astype(h_ref.dtype)
    opre_ref[:] = o_pre.astype(opre_ref.dtype)
    dqkv_ref[:] = dqkv.reshape(bb, Np, 3 * C).astype(dqkv_ref.dtype)
    _acc1(d_ln1s, jnp.sum((dh * xhat1).reshape(bb * Np, C), axis=0, keepdims=True))
    _acc1(d_ln1b, jnp.sum(dh.reshape(bb * Np, C), axis=0, keepdims=True))
    dx_ref[:] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# plans + pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------


def _tile_bb(B, per_row, fixed, budget=13 << 20):
    bb = max(1, min(B, (budget - fixed) // max(per_row, 1)))
    while B % bb:
        bb -= 1
    return bb


def _nt_for(Np, cap=256):
    # NB audiomae's 513 tokens pad to 528 = 16*33, whose only 16-multiple
    # divisor is 16 — small tiles, more grid steps. Padding further to 576
    # (nt=64) would trade ~19% extra attention FLOPs for 4x fewer MLP grid
    # steps — an untested alternative if the ViT-B MLP tiles show up hot.
    nt = max(d for d in range(16, min(Np, cap) + 1, 16) if Np % d == 0)
    return nt


def train_plan(Np: int, C: int, hidden: int, heads: int, mm_dtype, act_dtype):
    """'acc' when the f32 weight-grad accumulators + weights + one row of
    activations fit the VMEM budget in BOTH backward kernels, else 'emit'."""
    wb = 2 if mm_dtype == jnp.bfloat16 else 4
    ab = jnp.dtype(act_dtype).itemsize
    # attention backward, bb=1: weights + accums + activation working set
    at = (
        (C * 3 * C + C * C) * wb            # w_qkv + w_proj
        + (C * 3 * C + C * C + 8 * C) * 4   # d_qkvw + d_projw + 1-D accums
        + Np * C * (3 * ab + 4)             # x/dh1/dx tiles + xhat f32
        + Np * C * 10 * ab                  # h, qkv, qs/ks/vs, dq, o_pre, dqkv
        + Np * C * 2 * 4                    # dk/dv f32 accumulators
        + heads * 128 * Np * 4 * 3          # one score chunk: s/p/ds + dp
    )
    # mlp backward, nt=128 token tile
    nt = 128
    ml = (
        2 * C * hidden * wb
        + (2 * C * hidden + 2 * C + hidden + C) * 4
        + nt * (3 * C * ab + (2 * hidden + C) * 4 + hidden * 4)
    )
    budget = 13 << 20
    return "acc" if (at <= budget and ml <= budget) else "emit"


def _xspec3(bb, Np, C):
    return pl.BlockSpec((bb, Np, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _tspec(bb, nt, C):
    return pl.BlockSpec((bb, nt, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)


def _full1(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)


def _full2(shape):
    return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_vit_block_train(heads, q_chunk, mm_name, n_real, mode, interpret):
    """custom_vjp fused ViT train block for a static geometry.

    Array args are kernel-layout: w_qkv/b_qkv with the attention scale
    pre-folded into the q columns, 1-D params as (1, n) rows, matmul
    weights in mm_dtype.
    """
    mm_dtype = jnp.float32 if mm_name == "float32" else jnp.bfloat16

    def _fwd_call(x, kargs):
        B, Np, C = x.shape
        hidden = kargs[8].shape[1]
        ab = jnp.dtype(x.dtype).itemsize
        wb = 2 if mm_dtype == jnp.bfloat16 else 4
        if mode == "acc":
            # whole-block forward (emits y + h1)
            weights = (C * 3 * C + C * C + 2 * C * hidden) * wb
            row = Np * ((10 * C + 2 * hidden) * ab + hidden * 4
                        + 6 * C * ab) + heads * q_chunk * Np * 8
            bb = _tile_bb(B, row, weights)
            y, h1 = pl.pallas_call(
                functools.partial(
                    _fwd_full_kernel, heads=heads, q_chunk=q_chunk,
                    mm_dtype=mm_dtype, n_real=n_real,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                ],
                grid=(B // bb,),
                in_specs=[_xspec3(bb, Np, C)] + [_full1(a.shape) for a in kargs],
                out_specs=[_xspec3(bb, Np, C), _xspec3(bb, Np, C)],
                compiler_params=_VMEM_LIMIT,
                interpret=interpret,
            )(x, *kargs)
            return y, h1
        # split: attention kernel then token-tiled MLP kernel
        at_w = (C * 3 * C + C * C) * wb
        at_row = Np * (10 * C * ab + 2 * C * 4) + heads * q_chunk * Np * 8
        bb = _tile_bb(B, at_row, at_w)
        h1 = pl.pallas_call(
            functools.partial(
                _fwd_attn_kernel, heads=heads, q_chunk=q_chunk,
                mm_dtype=mm_dtype, n_real=n_real,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
            grid=(B // bb,),
            in_specs=[_xspec3(bb, Np, C)] + [_full1(a.shape) for a in kargs[:6]],
            out_specs=_xspec3(bb, Np, C),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(x, *kargs[:6])
        nt = _nt_for(Np)
        y = pl.pallas_call(
            functools.partial(_fwd_mlp_kernel, mm_dtype=mm_dtype),
            out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
            grid=(B, Np // nt),
            in_specs=[_tspec(1, nt, C)] + [_full2(a.shape) for a in kargs[6:]],
            out_specs=_tspec(1, nt, C),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(h1, *kargs[6:])
        return y, h1

    @jax.custom_vjp
    def block(x, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
              ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2):
        y, _ = _fwd_call(x, (w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
                             ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2))
        return y

    def block_fwd(x, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
                  ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2):
        y, h1 = _fwd_call(x, (w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
                              ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2))
        return y, (x, h1, w_qkv, b_qkv, w_proj, ln1_s, ln1_b,
                   ln2_s, ln2_b, w_fc1, b_fc1, w_fc2)

    def block_bwd(res, dy):
        (x, h1, w_qkv, b_qkv, w_proj, ln1_s, ln1_b,
         ln2_s, ln2_b, w_fc1, b_fc1, w_fc2) = res
        B, Np, C = x.shape
        hidden = w_fc1.shape[1]
        ab = jnp.dtype(x.dtype).itemsize
        wb = 2 if mm_dtype == jnp.bfloat16 else 4
        mmj = lambda a: a.astype(mm_dtype)
        nt = _nt_for(Np)

        if mode == "acc":
            # ---- MLP half with in-kernel weight-grad accumulation
            outs = pl.pallas_call(
                functools.partial(_bwd_mlp_acc_kernel, mm_dtype=mm_dtype),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((C, hidden), jnp.float32),
                    jax.ShapeDtypeStruct((1, hidden), jnp.float32),
                    jax.ShapeDtypeStruct((hidden, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                ],
                grid=(B, Np // nt),
                in_specs=[_tspec(1, nt, C), _tspec(1, nt, C),
                          _full2((1, C)), _full2((1, C)),
                          _full2((C, hidden)), _full2((1, hidden)),
                          _full2((hidden, C))],
                out_specs=[_tspec(1, nt, C),
                           _full2((1, C)), _full2((1, C)),
                           _full2((C, hidden)), _full2((1, hidden)),
                           _full2((hidden, C)), _full2((1, C))],
                compiler_params=_VMEM_LIMIT,
                interpret=interpret,
            )(h1, dy, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2)
            dh1, dln2s, dln2b, dw1, db1, dw2, db2 = outs

            at_w = (C * 3 * C + C * C) * wb
            at_acc = (C * 3 * C + C * C + 8 * C) * 4
            at_row = Np * ((13 * C) * ab + C * 4 + 2 * C * 4) + heads * q_chunk * Np * 16
            bb = _tile_bb(B, at_row, at_w + at_acc)
            outs = pl.pallas_call(
                functools.partial(
                    _bwd_attn_acc_kernel, heads=heads, q_chunk=q_chunk,
                    mm_dtype=mm_dtype, n_real=n_real,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                    jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                    jax.ShapeDtypeStruct((C, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                ],
                grid=(B // bb,),
                in_specs=[_xspec3(bb, Np, C), _xspec3(bb, Np, C),
                          _full1((C, 3 * C)), _full1((1, 3 * C)),
                          _full1((C, C)), _full1((1, C)), _full1((1, C))],
                out_specs=[_xspec3(bb, Np, C),
                           _full1((C, 3 * C)), _full1((1, 3 * C)),
                           _full1((C, C)), _full1((1, C)),
                           _full1((1, C)), _full1((1, C))],
                compiler_params=_VMEM_LIMIT,
                interpret=interpret,
            )(x, dh1, w_qkv, b_qkv, w_proj, ln1_s, ln1_b)
            dx, dqkvw, dqkvb, dprojw, dprojb, dln1s, dln1b = outs
        else:
            # ---- emit variant: kernels emit residuals; weight grads outside
            outs = pl.pallas_call(
                functools.partial(_bwd_mlp_emit_kernel, mm_dtype=mm_dtype),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, hidden), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, hidden), x.dtype),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                ],
                grid=(B, Np // nt),
                in_specs=[_tspec(1, nt, C), _tspec(1, nt, C),
                          _full2((1, C)), _full2((1, C)),
                          _full2((C, hidden)), _full2((1, hidden)),
                          _full2((hidden, C))],
                out_specs=[_tspec(1, nt, C), _tspec(1, nt, C),
                           _tspec(1, nt, hidden), _tspec(1, nt, hidden),
                           _full2((1, C)), _full2((1, C))],
                compiler_params=_VMEM_LIMIT,
                interpret=interpret,
            )(h1, dy, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2)
            dh1, m, g, da1, dln2s, dln2b = outs
            dyf = dy.astype(mm_dtype).reshape(B * Np, C)
            gf = g.reshape(B * Np, hidden)
            mf = m.reshape(B * Np, C)
            da1f = da1.reshape(B * Np, hidden)
            dw2 = jax.lax.dot_general(
                mmj(gf), dyf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db2 = jnp.sum(dy.astype(jnp.float32).reshape(B * Np, C), axis=0,
                          keepdims=True)
            dw1 = jax.lax.dot_general(
                mmj(mf), mmj(da1f), dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db1 = jnp.sum(da1f.astype(jnp.float32), axis=0, keepdims=True)

            at_w = (C * 3 * C + C * C) * wb
            at_row = Np * (18 * C * ab + C * 4 + 2 * C * 4) + heads * q_chunk * Np * 16
            bb = _tile_bb(B, at_row, at_w)
            outs = pl.pallas_call(
                functools.partial(
                    _bwd_attn_emit_kernel, heads=heads, q_chunk=q_chunk,
                    mm_dtype=mm_dtype, n_real=n_real,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, C), x.dtype),
                    jax.ShapeDtypeStruct((B, Np, 3 * C), x.dtype),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                ],
                grid=(B // bb,),
                in_specs=[_xspec3(bb, Np, C), _xspec3(bb, Np, C),
                          _full1((C, 3 * C)), _full1((1, 3 * C)),
                          _full1((C, C)), _full1((1, C)), _full1((1, C))],
                out_specs=[_xspec3(bb, Np, C), _xspec3(bb, Np, C),
                           _xspec3(bb, Np, C), _xspec3(bb, Np, 3 * C),
                           _full1((1, C)), _full1((1, C))],
                compiler_params=_VMEM_LIMIT,
                interpret=interpret,
            )(x, dh1, w_qkv, b_qkv, w_proj, ln1_s, ln1_b)
            dx, hout, o_pre, dqkv, dln1s, dln1b = outs
            dwf = dh1.astype(mm_dtype).reshape(B * Np, C)
            dprojw = jax.lax.dot_general(
                mmj(o_pre.reshape(B * Np, C)), dwf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dprojb = jnp.sum(dh1.astype(jnp.float32).reshape(B * Np, C),
                             axis=0, keepdims=True)
            dqkvf = dqkv.reshape(B * Np, 3 * C)
            dqkvw = jax.lax.dot_general(
                mmj(hout.reshape(B * Np, C)), mmj(dqkvf),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkvb = jnp.sum(dqkvf.astype(jnp.float32), axis=0, keepdims=True)

        return (dx,
                dqkvw.astype(w_qkv.dtype), dqkvb.astype(b_qkv.dtype),
                dprojw.astype(w_proj.dtype), dprojb,
                dln1s, dln1b, dln2s, dln2b,
                dw1.astype(w_fc1.dtype), db1, dw2.astype(w_fc2.dtype), db2)

    block.defvjp(block_fwd, block_bwd)
    return block


def _prep_vit_train_weights(p, C, heads, mm_dtype):
    """Kernel-layout args from a flax ViTBlock subtree, differentiable jnp:
    attention scale folded into q columns/bias, 1-D params as rows, matmul
    weights cast to mm_dtype (cast has a trivial VJP back to f32)."""
    scale = (C // heads) ** -0.5
    w_qkv = jnp.asarray(p["attn_qkv"]["kernel"])
    b_qkv = jnp.asarray(p["attn_qkv"]["bias"])
    w_qkv = jnp.concatenate([w_qkv[:, :C] * scale, w_qkv[:, C:]], axis=1)
    b_qkv = jnp.concatenate([b_qkv[:C] * scale, b_qkv[C:]])
    v1 = lambda a: jnp.asarray(a).reshape(1, -1)
    return (
        w_qkv.astype(mm_dtype), v1(b_qkv),
        jnp.asarray(p["attn_proj"]["kernel"]).astype(mm_dtype),
        v1(p["attn_proj"]["bias"]),
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(p["mlp_fc1"]["kernel"]).astype(mm_dtype),
        v1(p["mlp_fc1"]["bias"]),
        jnp.asarray(p["mlp_fc2"]["kernel"]).astype(mm_dtype),
        v1(p["mlp_fc2"]["bias"]),
    )


def fused_vit_block_train(
    x: jnp.ndarray,
    params: dict,
    n_real: Optional[int] = None,
    *,
    num_heads: int,
    q_chunk: int = 128,
    mm_dtype=jnp.float32,
    mode: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused ViT block on tokens x (B, Np, C); Np must be
    tile-aligned (ops.pallas_vit.pad_tokens). n_real < Np masks padded key
    columns; gradient exactness at padded rows requires downstream code to
    use only y[:, :n_real] (see module docstring). params: flax ViTBlock
    subtree — gradients flow back through the jnp weight prep.
    """
    B, Np, C = x.shape
    hidden = params["mlp_fc1"]["kernel"].shape[1]
    if n_real is not None and n_real >= Np:
        n_real = None
    if mode is None:
        mode = train_plan(Np, C, hidden, num_heads, mm_dtype, x.dtype)
    block = _make_vit_block_train(
        num_heads, q_chunk,
        "bfloat16" if mm_dtype == jnp.bfloat16 else "float32",
        n_real, mode, interpret,
    )
    kargs = _prep_vit_train_weights(params, C, num_heads, mm_dtype)
    return block(x, *kargs)
