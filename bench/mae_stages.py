"""Where do the MAE-ViT extraction milliseconds go? Stage decomposition of
the operaGT ViT-S forward_feature at production shape (B=64, 1025 tokens,
384 dim) plus attention variants, same-process min-over-rounds on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from heart_murmur_detection_tpu.models.vit_mae import (
    MaskedAutoencoderViT,
    ViTBlock,
    mae_vit_small_config,
)

REPS = 8
ROUNDS = int(os.environ.get("ROUNDS", 6))
r = np.random.default_rng(0)
dev = jax.devices()[0]

B, N, C, NH = 64, 1025, 384, 6
CD = jnp.bfloat16

cfg = mae_vit_small_config(compute_dtype=CD)
model = MaskedAutoencoderViT(cfg)
x = r.random((B, 256, 64)).astype(np.float32)
with jax.default_device(jax.devices("cpu")[0]):
    v = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}, x[:1]
    )
v = jax.device_put(v, dev)
xj = jax.device_put(jnp.asarray(x), dev)

h0 = jax.device_put(jnp.asarray(r.standard_normal((B, N, C)).astype(np.float32)), dev)

blk = ViTBlock(dim=C, num_heads=NH, compute_dtype=CD)
with jax.default_device(jax.devices("cpu")[0]):
    vb = blk.init(jax.random.PRNGKey(0), h0[:1])
vb = jax.device_put(vb, dev)


def timeit(name, fn, *args):
    y = fn(*args)
    np.asarray(y)  # compile+sync
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.time()
        for _ in range(REPS):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / REPS * 1000)
    print(f"{name:42s} {best:8.2f} ms", flush=True)
    return best


full = timeit("full forward_feature (bf16 blocks)",
              jax.jit(lambda v, x: model.apply(v, x, method=MaskedAutoencoderViT.forward_feature)), v, xj)

timeit("patch embed + pos (via _embed_patches)",
       jax.jit(lambda v, x: model.apply(v, x, method=lambda m, x: m._embed_patches(x))), v, xj)

one = timeit("one ViTBlock (bf16)", jax.jit(lambda v, h: blk.apply(v, h)), vb, h0)
print(f"{'12 x one block':42s} {12 * one:8.2f} ms", flush=True)


# attention sub-stages at (B, N, C)
def qkv_only(v, h):
    p = v["params"]
    return h @ p["attn_qkv"]["kernel"].astype(CD) + p["attn_qkv"]["bias"]


def attn_xla(v, h):
    p = v["params"]
    qkv = (h @ p["attn_qkv"]["kernel"].astype(CD)).astype(jnp.float32)
    hd = C // NH
    q = qkv[..., 0 * C : 1 * C].reshape(B, N, NH, hd)
    k = qkv[..., 1 * C : 2 * C].reshape(B, N, NH, hd)
    vv = qkv[..., 2 * C : 3 * C].reshape(B, N, NH, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", (q * hd**-0.5).astype(CD), k.astype(CD),
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(CD)
    o = jnp.einsum("bhnm,bmhd->bnhd", a, vv.astype(CD),
                   preferred_element_type=jnp.float32).reshape(B, N, C)
    return o


def mlp_only(v, h):
    p = v["params"]
    u = h.astype(CD) @ p["mlp_fc1"]["kernel"].astype(CD) + p["mlp_fc1"]["bias"].astype(CD)
    u = nn.gelu(u.astype(jnp.float32), approximate=False)
    return u.astype(CD) @ p["mlp_fc2"]["kernel"].astype(CD)


timeit("  qkv dense only", jax.jit(qkv_only), vb, h0)
timeit("  attention (qkv+softmax+pv, bf16 mm)", jax.jit(attn_xla), vb, h0)
timeit("  mlp only (bf16)", jax.jit(mlp_only), vb, h0)
def _ln(h):
    m = h.mean(-1, keepdims=True)
    d = h - m
    return d * jax.lax.rsqrt((d * d).mean(-1, keepdims=True) + 1e-6)


timeit("  2x layernorm", jax.jit(lambda h: _ln(_ln(h))), h0)

print(f"\nfull={full:.1f} ms -> {B / (full / 1000):.0f} clips/s", flush=True)
