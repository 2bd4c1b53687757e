"""Sweep the fused ViT kernels' instance geometry (bb rows/instance, whole vs
split, q_chunk) at the three MAE-tower shapes, plus a cumulative decomposition
of the operaGT production graph. Same-process minima over rounds — the zoo
towers' next perf lever hunt (VERDICT r3 item 9).

Shapes (production extraction geometry):
  operaGT  ViT-S: B=64, Np=80  (65 real), C=384,  h=6,  depth 12
  audiomae ViT-B: B=32, Np=528 (513 real), C=768, h=12, depth 12
  hear     ViT-L: B=64, Np=112 (97 real), C=1024, h=16, depth 24
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.ops.pallas_vit import (
    fused_vit_attn, fused_vit_block, fused_vit_mlp,
)

ROUNDS = int(_os.environ.get("ROUNDS", 6))
REPS = 8
r = np.random.default_rng(0)


def mk_params(C, hidden, depth, dtype=jnp.float32):
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


def time_fn(fn, *args):
    np.asarray(fn(*args))  # compile + warm (block_until_ready: no-op on axon)
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.time()
        for _ in range(REPS):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / REPS * 1000)
    return best


def stack_fn(depth, heads, n_real, *, mode, bb, q_chunk, mlp_bb=None, mlp_nt=None):
    @jax.jit
    def f(x, params):
        h = x
        for i in range(depth):
            p = params[i]
            if mode == "whole":
                h = fused_vit_block(
                    h, p, n_real, num_heads=heads, bb=bb, q_chunk=q_chunk,
                    mm_dtype=jnp.bfloat16, fast_softmax=True,
                )
            else:
                h = fused_vit_attn(
                    h, p, n_real, num_heads=heads, bb=bb, q_chunk=q_chunk,
                    mm_dtype=jnp.bfloat16, fast_softmax=True,
                )
                h = fused_vit_mlp(h, p, bb=mlp_bb or bb, nt=mlp_nt,
                                  mm_dtype=jnp.bfloat16)
        return h.astype(jnp.float32).sum()
    return f


TOWERS = [
    ("operaGT", 64, 80, 65, 384, 6, 12),
    ("audiomae", 32, 528, 513, 768, 12, 12),
    ("hear", 64, 112, 97, 1024, 16, 24),
]

for name, B, Np, n_real, C, heads, depth in TOWERS:
    hidden = 4 * C
    params = mk_params(C, hidden, depth)
    x = jnp.asarray(r.standard_normal((B, Np, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    print(f"\n=== {name}: B={B} Np={Np} C={C} h={heads} d={depth} ===", flush=True)
    if name == "operaGT":
        cand = [("whole", 4), ("whole", 16), ("whole", 32), ("whole", 64),
                ("split", 16)]
    elif name == "audiomae":
        cand = [("split", 1), ("split", 2), ("split", 4), ("whole", 1),
                ("whole", 2)]
    else:
        cand = [("split", 1), ("split", 4), ("split", 8), ("whole", 2),
                ("whole", 4)]
    configs = [(m, bb, 128, bb, None) for m, bb in cand if bb <= B and B % bb == 0]
    for mode, bb, qc, mbb, mnt in configs:
        try:
            f = stack_fn(depth, heads, n_real, mode=mode, bb=bb, q_chunk=qc,
                         mlp_bb=mbb, mlp_nt=mnt)
            ms = time_fn(f, x, params)
            print(f"  {mode:5s} bb={bb:2d} q={qc:3d}: {ms:7.2f} ms"
                  f"  ({B/ms*1000:6.0f} clips/s-equiv)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"  {mode:5s} bb={bb:2d} q={qc:3d}: FAIL {msg}", flush=True)
