"""Fused Pallas ViT-block kernels for the MAE encoders (operaGT ViT-S,
Audio-MAE ViT-B extraction paths).

Why: the XLA ViT block round-trips the (B, N, C) activation through HBM
~10x per block (2 LNs, qkv, per-head attention layouts, proj, 2 MLP
matmuls, 2 residual adds), and the (B, heads, N, N) logits — 25 MB/batch-row
at ViT-S geometry — are its bandwidth ceiling even with XLA's own attention
fusion (RESULTS.md round-2: the Pallas *flash* kernel lost to XLA 2x because
it re-streamed k/v per query block; here the whole sequence lives in VMEM so
softmax needs no streaming rescale at all). These kernels compute
LN1 -> qkv -> full-sequence attention (query-chunked scores, exact softmax)
-> proj -> residual -> LN2 -> MLP -> residual with x read once and written
once per kernel.

Two granularities, chosen by weight footprint (16 MB scoped VMEM):
- `fused_vit_block`: the whole transformer block in one kernel (ViT-S:
  ~3.5 MB of bf16 weights). HBM traffic per block = 1 read + 1 write of x.
- `fused_vit_attn` + `fused_vit_mlp`: split halves for ViT-B, whose block
  weights alone are ~14 MB bf16 (qkv+proj ~4.6 MB, fc1+fc2 ~9 MB). Two
  reads + two writes of x per block — still ~3x fewer HBM passes than XLA.

Sequence padding: callers pad tokens to a sublane-aligned length n_pad and
pass the real count (static); padded key columns get -1e9 (exp underflows to
exact zero — real rows' softmax sums are untouched), padded query rows
produce garbage that stays in padded rows and is sliced off after the stack.

Numerics class: identical to ops.pallas_swin — bf16 matmul inputs with f32
accumulation (preferred_element_type), f32 LN stats/softmax/gelu islands,
erf via the A&S 7.1.26 polynomial (Mosaic lowers no erf). Interpret mode
matches models.vit_mae.ViTBlock(eval) to ~1e-5 (tests/test_pallas_vit.py);
on hardware, Mosaic transcendental deltas wash out to feature cosine
>= 0.9999 end-to-end — the documented inference-path tolerance (PARITY.md).

Reference context: these blocks implement the timm-Block semantics used by
/root/reference/src/model/models_mae.py:29-552 (ViT-S encoder) and
src/benchmark/baseline/audioMAE/models_mae.py (ViT-B), eval path only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

from .pallas_swin import _gelu_exact, _ln

HI = jax.lax.Precision.HIGHEST


def _chunks(n: int, step: int):
    """Static (offset, size) query chunks covering n rows."""
    out = []
    o = 0
    while o < n:
        out.append((o, min(step, n - o)))
        o += step
    return out


def _attn_half(x, n_real, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
               *, heads: int, q_chunk: int, mm_dtype, fast_softmax=False):
    """LN1 -> qkv -> full-seq attention -> proj -> +x on values.

    x (bb, Np, C); n_real (static int) masks key columns >= n_real via an
    in-kernel iota compare (a (1, Np) mask INPUT trips a Mosaic tiling
    assert — "limits[i] <= dim(i) (16 vs. 1)" — on bf16 kernels; the iota
    costs one VPU compare per score tile and needs no operand). None = no
    padding. Returns (bb, Np, C) in x.dtype.
    """
    bb, Np, C = x.shape
    act_dtype = x.dtype
    hd = C // heads
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None

    h = _ln(x, ln1_s, ln1_b, eps=1e-6).astype(act_dtype)
    qkv = (
        (
            jnp.dot(mm(h.reshape(bb * Np, C)), mm(w_qkv), precision=prec,
                    preferred_element_type=jnp.float32)
            + b_qkv
        )
        .astype(act_dtype)
        .reshape(bb, Np, 3 * C)
    )
    # head-batched layout: stack per-head lane slices (hd=64, 32-aligned —
    # no padding needed, unlike HTS-AT's head_dim 24) on the batch axis
    hcat = lambda off: jnp.concatenate(
        [qkv[:, :, off + hh * hd : off + (hh + 1) * hd] for hh in range(heads)], 0
    )  # (heads*bb, Np, hd), head-major
    qs, ks, vs = hcat(0), hcat(C), hcat(2 * C)
    # query-chunked exact attention: all keys/values are resident, so each
    # chunk's softmax is final (no flash rescan); scores VMEM is bounded by
    # (heads*bb, q_chunk, Np) f32 instead of the full Np^2 map
    outs = []
    for o, qc in _chunks(Np, q_chunk):
        s = jax.lax.dot_general(
            mm(qs[:, o : o + qc]), mm(ks),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (heads*bb, qc, Np)
        if n_real is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_real, s, -1e9)
        if fast_softmax:
            # skip the rowwise max pass — one fewer full sweep of the score
            # chunk — and normalize AFTER the av matmul: out = (e @ v) * 1/sum
            # touches (qc, hd) elements instead of rewriting the (qc, Np)
            # score chunk (measured +2-3% on the GT attn half,
            # bench/gt_attn_opt.py v3/v4). Exact while logits < ~80 (f32
            # overflow of the unnormalized e-sums against exp(88)·|v|); the
            # masked -1e9 columns underflow to literal zeros either way. Same
            # policy/acceptance bar as ops.pallas_swin fast_softmax.
            e = jnp.exp(s)
            recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                mm(e), mm(vs),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32,
            )
            outs.append((av * recip).astype(act_dtype))
        else:
            s = jax.nn.softmax(s, axis=-1)
            outs.append(
                jax.lax.dot_general(
                    mm(s), mm(vs),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    precision=prec, preferred_element_type=jnp.float32,
                ).astype(act_dtype)
            )
    ost = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    o = jnp.concatenate(
        [ost[hh * bb : (hh + 1) * bb] for hh in range(heads)], axis=-1
    ).reshape(bb * Np, C)
    o = (
        jnp.dot(mm(o), mm(w_proj), precision=prec,
                preferred_element_type=jnp.float32)
        + b_proj
    ).reshape(bb, Np, C)
    return (x.astype(jnp.float32) + o).astype(act_dtype)


def _mlp_half(x, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, *, mm_dtype):
    """LN2 -> fc1 -> gelu -> fc2 -> +x on values. x (bb, Nt, C)."""
    bb, Nt, C = x.shape
    act_dtype = x.dtype
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    m = _ln(x, ln2_s, ln2_b, eps=1e-6).astype(act_dtype).reshape(bb * Nt, C)
    m = (
        jnp.dot(mm(m), mm(w_fc1), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1
    )
    m = _gelu_exact(m).astype(act_dtype)
    m = (
        jnp.dot(mm(m), mm(w_fc2), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc2
    ).reshape(bb, Nt, C)
    return (x.astype(jnp.float32) + m).astype(act_dtype)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _full_kernel(
    x_ref,
    w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
    ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2,
    out_ref,
    *, heads: int, q_chunk: int, mm_dtype, n_real, fast_softmax=False,
):
    x = x_ref[:]
    h1 = _attn_half(
        x, n_real, w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
        fast_softmax=fast_softmax,
    )
    out_ref[:] = _mlp_half(
        h1, ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )


def _attn_kernel(
    x_ref, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b, out_ref,
    *, heads: int, q_chunk: int, mm_dtype, n_real, fast_softmax=False,
):
    out_ref[:] = _attn_half(
        x_ref[:], n_real, w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], heads=heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
        fast_softmax=fast_softmax,
    )


def _mlp_kernel(x_ref, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, out_ref,
                *, mm_dtype):
    out_ref[:] = _mlp_half(
        x_ref[:], ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _v1(a):
    return jnp.asarray(a).reshape(1, -1)


def _attn_weights(p, wdtype, heads=None):
    w_qkv = jnp.asarray(p["attn_qkv"]["kernel"])
    b_qkv = jnp.asarray(p["attn_qkv"]["bias"])
    if heads:
        # fold the 1/sqrt(hd) attention scale into the q columns (and their
        # bias) so the kernel never materializes a scaled copy of q
        C = w_qkv.shape[0]
        scale = (C // heads) ** -0.5
        w_qkv = jnp.concatenate([w_qkv[:, :C] * scale, w_qkv[:, C:]], axis=1)
        b_qkv = jnp.concatenate([b_qkv[:C] * scale, b_qkv[C:]])
    return (
        w_qkv.astype(wdtype),
        b_qkv.reshape(1, -1),
        jnp.asarray(p["attn_proj"]["kernel"]).astype(wdtype),
        _v1(p["attn_proj"]["bias"]),
        _v1(p["norm1"]["scale"]), _v1(p["norm1"]["bias"]),
    )


def _mlp_weights(p, wdtype):
    return (
        _v1(p["norm2"]["scale"]), _v1(p["norm2"]["bias"]),
        jnp.asarray(p["mlp_fc1"]["kernel"]).astype(wdtype),
        _v1(p["mlp_fc1"]["bias"]),
        jnp.asarray(p["mlp_fc2"]["kernel"]).astype(wdtype),
        _v1(p["mlp_fc2"]["bias"]),
    )


def _full(shape):
    return pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _xspec(bb, Np, C):
    return pl.BlockSpec((bb, Np, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def pad_tokens(x: jnp.ndarray, multiple: int = 16):
    """Pad (B, N, C) tokens to a tile-aligned count; returns (padded, N)."""
    B, N, C = x.shape
    Np = ((N + multiple - 1) // multiple) * multiple
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    return x, N


def block_plan(Np: int, C: int, hidden: int, heads: int, mm_dtype, act_dtype,
               budget: int = 13 << 20, q_chunk: int = 128):
    """(bb, q_chunk) for the full-block kernel, or None if its weights +
    one row's activations exceed the VMEM budget (then use the split pair).

    Peak-liveness model (calibrated the same way as pallas_swin's bb
    heuristic): weights + double-buffered in/out tiles + the attention
    working set (qkv copy, head-stacked q/k/v, one score chunk + its
    softmax copy) + the MLP hidden row.
    """
    wbytes = 2 if mm_dtype == jnp.bfloat16 else 4
    abytes = jnp.dtype(act_dtype).itemsize
    weights = (C * 3 * C + C * C + 2 * C * hidden) * wbytes
    io_row = 4 * Np * C * abytes
    act_row = (
        Np * (3 * C + 3 * C + C + 2 * C) * abytes  # qkv + q/k/v stack + o + ln
        + heads * q_chunk * Np * 2 * 4             # scores + softmax copy
        + Np * hidden * abytes                     # mlp hidden (gelu in f32
        + Np * hidden * 4                          #  + stored copy)
    )
    bb = (budget - weights) // max(io_row + act_row, 1)
    if bb < 1:
        return None
    return int(bb), q_chunk


def fused_vit_block(
    x: jnp.ndarray,
    params: dict,
    n_real: Optional[int] = None,
    *,
    num_heads: int,
    bb: Optional[int] = None,
    q_chunk: int = 128,
    mm_dtype=jnp.float32,
    fast_softmax: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One full ViT block on x (B, Np, C); Np must be 8/16-tile aligned
    (pad_tokens). n_real < Np masks padded key columns. params: flax
    ViTBlock subtree (norm1/attn_qkv/attn_proj/norm2/mlp_fc1/mlp_fc2).
    """
    B, Np, C = x.shape
    hidden = params["mlp_fc1"]["kernel"].shape[1]
    if bb is None:
        plan = block_plan(Np, C, hidden, num_heads, mm_dtype, x.dtype,
                          q_chunk=q_chunk)
        assert plan is not None, "full-block kernel exceeds VMEM; use split"
        bb = min(B, plan[0])
        while B % bb:
            bb -= 1
    if n_real is not None and n_real >= Np:
        n_real = None
    args = (x,) + _attn_weights(params, mm_dtype, num_heads) + (
        _mlp_weights(params, mm_dtype)
    )
    return pl.pallas_call(
        functools.partial(
            _full_kernel, heads=num_heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
            n_real=n_real, fast_softmax=fast_softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
        grid=(B // bb,),
        in_specs=[_xspec(bb, Np, C)]
        + [_full(a.shape) for a in args[1:]],
        out_specs=_xspec(bb, Np, C),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*args)


def fused_vit_attn(
    x: jnp.ndarray,
    params: dict,
    n_real: Optional[int] = None,
    *,
    num_heads: int,
    bb: int = 1,
    q_chunk: int = 128,
    mm_dtype=jnp.float32,
    fast_softmax: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention half (LN1+qkv+attention+proj+residual) of one ViT block."""
    B, Np, C = x.shape
    if n_real is not None and n_real >= Np:
        n_real = None
    args = (x,) + _attn_weights(params, mm_dtype, num_heads)
    return pl.pallas_call(
        functools.partial(
            _attn_kernel, heads=num_heads, q_chunk=q_chunk, mm_dtype=mm_dtype,
            n_real=n_real, fast_softmax=fast_softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
        grid=(B // bb,),
        in_specs=[_xspec(bb, Np, C)]
        + [_full(a.shape) for a in args[1:]],
        out_specs=_xspec(bb, Np, C),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*args)


def fused_vit_mlp(
    x: jnp.ndarray,
    params: dict,
    *,
    bb: int = 1,
    nt: Optional[int] = None,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """MLP half (LN2+fc1+gelu+fc2+residual); token-tiled (pointwise across
    tokens, so the grid splits the sequence to keep the fc1 row in VMEM)."""
    B, Np, C = x.shape
    if nt is None:
        # largest 16-aligned divisor of Np that is <= 256 (Np is 16-aligned
        # by pad_tokens, so 16 always qualifies)
        nt = max(
            d for d in range(16, min(Np, 256) + 1, 16) if Np % d == 0
        )
    assert Np % nt == 0
    args = (x,) + _mlp_weights(params, mm_dtype)
    spec = pl.BlockSpec((bb, nt, C), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
        grid=(B // bb, Np // nt),
        in_specs=[spec] + [
            pl.BlockSpec(a.shape, lambda b, t, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in args[1:]
        ],
        out_specs=spec,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*args)
