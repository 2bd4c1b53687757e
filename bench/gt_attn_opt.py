"""Attention-chain micro-optimization hunt at the operaGT shape (bb=1,
Np=1040, C=384, 6 heads, hd=64): the qk/av matmuls measure ~34% MFU vs the
~50% structural ceiling for hd=64. Candidates:
  v0  current production chain (dot_general contract last-dims, q-chunked)
  v1  k pre-transposed once per layer (rhs native layout: K sublanes, N lanes)
  v2  v1 + single q chunk (no per-chunk python loop)
  v3  v1 + normalize AFTER av: out = (exp(s) @ v) * (1/sum) — the divide
      touches (qc, hd) instead of (qc, Np), saving a full score-size VPU
      pass + the f32 score rewrite before the bf16 cast
  v4  v3 + single q chunk
  v5  v4 + exp computed in bf16 (halves the score-pass width)
  noattn  upper bound: skip qk/softmax/av entirely (out = q) — quantifies
      the attention chain's share of the half in the same process
Each variant: 8 chained attn-half kernels, same-process min."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heart_murmur_detection_tpu.ops.pallas_swin import _ln

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
r = np.random.default_rng(0)


def timeit(name, fn, *args):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f"  {name:14s} FAIL {str(e).splitlines()[0][:100]}", flush=True)
        return None
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(6):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / 6 * 1000)
    print(f"  {name:14s} {best:8.2f} ms", flush=True)
    return best


def kernel(x_ref, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b, out_ref,
           *, heads, q_chunk, mode):
    x = x_ref[:]
    bb, Np, C = x.shape
    hd = C // heads
    mm = lambda a: a.astype(jnp.bfloat16)
    h = _ln(x, ln1_s[0], ln1_b[0], eps=1e-6).astype(jnp.bfloat16)
    qkv = (
        jnp.dot(mm(h.reshape(bb * Np, C)), mm(w_qkv[:]),
                preferred_element_type=jnp.float32) + b_qkv[0]
    ).astype(jnp.bfloat16).reshape(bb, Np, 3 * C)
    hcat = lambda off: jnp.concatenate(
        [qkv[:, :, off + hh * hd : off + (hh + 1) * hd] for hh in range(heads)], 0
    )
    qs, ks, vs = hcat(0), hcat(C), hcat(2 * C)
    if mode != "v0":
        ksr = jnp.swapaxes(ks, 1, 2)  # (heads, hd, Np): rhs-native layout
        qk_dims = (((2,), (1,)), ((0,), (0,)))
    else:
        ksr = ks
        qk_dims = (((2,), (2,)), ((0,), (0,)))
    outs = []
    o_ = 0
    step = Np if mode in ("v2", "v4", "v5") else q_chunk
    while o_ < Np:
        qc = min(step, Np - o_)
        if mode == "noattn":
            outs.append(qs[:, o_ : o_ + qc])
            o_ += qc
            continue
        s = jax.lax.dot_general(
            mm(qs[:, o_ : o_ + qc]), mm(ksr),
            dimension_numbers=qk_dims, preferred_element_type=jnp.float32,
        )
        if mode == "v5":
            e = jnp.exp(s.astype(jnp.bfloat16))
            recip = 1.0 / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                e, mm(vs),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            outs.append((av * recip).astype(jnp.bfloat16))
            o_ += qc
            continue
        e = jnp.exp(s)
        if mode in ("v3", "v4"):
            recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                mm(e), mm(vs),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            outs.append((av * recip).astype(jnp.bfloat16))
        else:
            s = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    mm(s), mm(vs),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            )
        o_ += qc
    ost = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    o = jnp.concatenate(
        [ost[hh * bb : (hh + 1) * bb] for hh in range(heads)], axis=-1
    ).reshape(bb * Np, C)
    o = (
        jnp.dot(mm(o), mm(w_proj[:]), preferred_element_type=jnp.float32)
        + b_proj[0]
    ).reshape(bb, Np, C)
    out_ref[:] = (x.astype(jnp.float32) + o).astype(x.dtype)


def build(B, Np, C, heads, mode, q_chunk=208, depth=8):
    g = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.02)
    w = (g(C, 3 * C).astype(jnp.bfloat16), g(1, 3 * C),
         g(C, C).astype(jnp.bfloat16), g(1, C),
         jnp.ones((1, C)), jnp.zeros((1, C)))
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Np, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def one(x):
        return pl.pallas_call(
            functools.partial(kernel, heads=heads, q_chunk=q_chunk, mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
            grid=(B,),
            in_specs=[xspec] + [full(a) for a in w],
            out_specs=xspec,
            compiler_params=_VMEM,
        )(x, *w)

    @jax.jit
    def f(x):
        h = x
        for _ in range(depth):
            h = one(h)
        return h.astype(jnp.float32).sum()
    return f


B, Np, C, heads = 64, 1040, 384, 6
x = jnp.asarray(r.standard_normal((B, Np, C)).astype(np.float32)).astype(jnp.bfloat16)
print(f"=== attn-chain variants (GT shape {B}x{Np}x{C}, 8 chained) ===", flush=True)
for mode in ("v0", "v1", "v2", "v3", "v4", "v5", "noattn"):
    timeit(mode, build(B, Np, C, heads, mode), x)
