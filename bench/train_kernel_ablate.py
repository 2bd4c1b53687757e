"""Per-stage A/B of the fused TRAIN swin kernels (ops/pallas_swin_train)
vs the eval kernel and vs XLA autodiff of the jnp block, at HTS-AT
production geometry, B=64.

Usage: [DTYPE=f32|bf16] [STAGES=0,1,2] python bench/train_kernel_ablate.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.ops import pallas_swin_train as pst
from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_block
from heart_murmur_detection_tpu.models.htsat import _shift_attn_mask

DTYPE = os.environ.get("DTYPE", "f32")
mm_dtype = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
B = int(os.environ.get("B", 64))
STAGES = [int(s) for s in os.environ.get("STAGES", "0,1,2").split(",")]

GEOM = {  # stage -> (H, W, C, heads)
    0: (64, 64, 96, 4),
    1: (32, 32, 192, 8),
    2: (16, 16, 384, 16),
    3: (8, 8, 768, 32),
}


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(3):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, (time.time() - t0) / 3 * 1000)
    print(f"  {name:34s} {best:8.2f} ms", flush=True)
    return best


def ref_block(x, p, bias, mask, k1, k2, heads):
    # jnp train block for XLA autodiff comparison (spatial in/out)
    B_, H, W, C = x.shape
    from heart_murmur_detection_tpu.models.htsat_train_fused import _block_jnp_train
    y = _block_jnp_train(
        x.reshape(B_, H * W, C), p, H, W, heads, 8, 0, bias, mask,
        k1, k2,
    )
    return y.reshape(B_, H, W, C)


for s in STAGES:
    H, W, C, heads = GEOM[s]
    hidden = 4 * C
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, H, W, C)), jnp.float32)
    g = lambda *sh: jnp.asarray(r.standard_normal(sh) * 0.05, jnp.float32)
    p = {
        "norm1": {"scale": 1.0 + g(C), "bias": g(C)},
        "attn": {"qkv": {"kernel": g(C, 3 * C), "bias": g(3 * C)},
                 "proj": {"kernel": g(C, C), "bias": g(C)}},
        "norm2": {"scale": 1.0 + g(C), "bias": g(C)},
        "mlp": {"fc1": {"kernel": g(C, hidden), "bias": g(hidden)},
                "fc2": {"kernel": g(hidden, C), "bias": g(C)}},
    }
    bias = g(heads, 64, 64)
    ones = jnp.ones((B, 1), jnp.float32)
    print(f"stage {s}: H=W={H} C={C} heads={heads} dtype={DTYPE}")

    @jax.jit
    def tr_fwd(x, p):
        y = pst.fused_swin_block_train(
            x, p, bias, None, ones, ones, window=8, num_heads=heads,
            mm_dtype=mm_dtype,
        )
        return y.sum()

    @jax.jit
    def tr_grad(x, p):
        def f(x, p):
            y = pst.fused_swin_block_train(
                x, p, bias, None, ones, ones, window=8, num_heads=heads,
                mm_dtype=mm_dtype,
            )
            return y.sum()
        l, (dx, dp) = jax.value_and_grad(f, argnums=(0, 1))(x, p)
        return l + dx.sum() + jax.tree.reduce(
            lambda a, t: a + t.sum().astype(jnp.float32), dp, jnp.float32(0))

    @jax.jit
    def ev_fwd(x, p):
        return fused_swin_block(
            x.astype(mm_dtype if mm_dtype == jnp.bfloat16 else jnp.float32),
            p, bias, None, num_heads=heads, mm_dtype=mm_dtype,
        ).sum()

    @jax.jit
    def xla_grad(x, p):
        def f(x, p):
            return ref_block(x, p, bias, None, ones, ones, heads).sum()
        l, (dx, dp) = jax.value_and_grad(f, argnums=(0, 1))(x, p)
        return l + dx.sum() + jax.tree.reduce(
            lambda a, t: a + t.sum().astype(jnp.float32), dp, jnp.float32(0))

    @jax.jit
    def xla_fwd(x, p):
        return ref_block(x, p, bias, None, ones, ones, heads).sum()

    t_ef = timeit("eval fused fwd", ev_fwd, x, p)
    t_tf = timeit("train fused fwd (+h1 write)", tr_fwd, x, p)
    t_tg = timeit("train fused fwd+bwd", tr_grad, x, p)
    t_xf = timeit("xla jnp fwd", xla_fwd, x, p)
    t_xg = timeit("xla jnp fwd+bwd", xla_grad, x, p)
    print(f"  -> train bwd {t_tg - t_tf:.2f} ms vs xla bwd {t_xg - t_xf:.2f} ms; "
          f"fwd ratio train/eval {t_tf / t_ef:.2f}")
