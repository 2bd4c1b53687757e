"""Same-process config sweep of the fused ViT kernels at the REAL operaGT
geometry (Np=1040 — patch 4 on 256x64 mel, not 16; the earlier vit_sweep ran
a wrong 80-token shape) and the audiomae geometry (Np=528). Knobs: split vs
whole kernel, bb rows/instance, q_chunk (1040 % 128 != 0 leaves a ragged
16-row score chunk; 208 divides evenly — 5 clean chunks)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.ops.pallas_vit import (
    fused_vit_attn, fused_vit_block, fused_vit_mlp,
)

r = np.random.default_rng(0)


def timeit(name, fn, *args):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f"  {name:34s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(6):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / 6 * 1000)
    print(f"  {name:34s} {best:8.2f} ms", flush=True)
    return best


def mk_params(C, hidden, depth):
    def blk(i):
        g = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.02)
        return {
            "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
            "attn_qkv": {"kernel": g(C, 3 * C), "bias": g(3 * C)},
            "attn_proj": {"kernel": g(C, C), "bias": g(C)},
            "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
            "mlp_fc1": {"kernel": g(C, hidden), "bias": g(hidden)},
            "mlp_fc2": {"kernel": g(hidden, C), "bias": g(C)},
        }
    return [blk(i) for i in range(depth)]


def stack(depth, heads, n_real, mode, bb, qc, mlp_bb=None):
    @jax.jit
    def f(params, x):
        h = x
        for i in range(depth):
            p = params[i]
            if mode == "whole":
                h = fused_vit_block(h, p, n_real, num_heads=heads, bb=bb,
                                    q_chunk=qc, mm_dtype=jnp.bfloat16,
                                    fast_softmax=True)
            else:
                h = fused_vit_attn(h, p, n_real, num_heads=heads, bb=bb,
                                   q_chunk=qc, mm_dtype=jnp.bfloat16,
                                   fast_softmax=True)
                h = fused_vit_mlp(h, p, bb=mlp_bb or bb, mm_dtype=jnp.bfloat16)
        return h.astype(jnp.float32).sum()
    return f


for name, B, Np, n_real, C, heads, depth, cands in (
    ("operaGT", 64, 1040, 1025, 384, 6, 12, [
        ("split", 1, 128, 1),   # production default today
        ("split", 1, 208, 1),
        ("split", 2, 208, 2),
        ("split", 4, 208, 4),
        ("split", 1, 1040, 1),
        ("whole", 1, 208, None),
        ("whole", 2, 208, None),
        ("whole", 1, 1040, None),
    ]),
    ("audiomae", 32, 528, 513, 768, 12, 12, [
        ("split", 1, 128, 1),   # production default today
        ("split", 1, 176, 1),
        ("split", 2, 176, 2),
        ("split", 1, 528, 1),
        ("whole", 1, 176, None),
    ]),
):
    params = mk_params(C, 4 * C, depth)
    x = jnp.asarray(r.standard_normal((B, Np, C)).astype(np.float32)).astype(
        jnp.bfloat16)
    print(f"=== {name}: B={B} Np={Np} C={C} h={heads} d={depth} ===", flush=True)
    for mode, bb, qc, mbb in cands:
        f = stack(depth, heads, n_real, mode, bb, qc, mbb)
        timeit(f"{mode} bb={bb} q={qc}", f, params, x)
