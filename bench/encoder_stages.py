"""Per-stage HTS-AT timing on TPU: where do the 47.8 ms go?

Times each swin stage (and intra-stage pieces for stage 1) as standalone jit
graphs, looped 32x back-to-back with one final sync (relay round-trip ~40-70ms
would pollute per-call syncs).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.htsat import HTSATConfig, _relative_position_index, _shift_attn_mask
from heart_murmur_detection_tpu.models.htsat_fused import _block_jnp, _ln

cfg = HTSATConfig()
B = 64
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
params = variables["params"]["encoder"]

REPS = 32

def bench(fn, x, tag, per_clip_flops=None):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(REPS):
        y = fn(x)
    jax.block_until_ready(y)
    ms = (time.time() - t0) / REPS * 1000
    print(f"{tag:42s}: {ms:7.2f} ms/batch")
    return ms

def stage_fn(i_layer, with_downsample=True):
    depth = cfg.depths[i_layer]
    dim = int(cfg.embed_dim * 2 ** i_layer)
    heads = cfg.num_heads[i_layer]
    H = W = 64 >> i_layer
    window = cfg.window_size if min(H, W) > cfg.window_size else min(H, W)
    blocks = []
    for b in range(depth):
        shift = 0 if b % 2 == 0 else (cfg.window_size // 2 if min(H, W) > cfg.window_size else 0)
        p = params[f"layers_{i_layer}_blocks_{b}"]
        table = p["attn"]["relative_position_bias_table"]
        rel_idx = _relative_position_index(window, window).reshape(-1)
        N = window * window
        bias = jnp.asarray(np.asarray(table)[np.asarray(rel_idx)].reshape(N, N, heads).transpose(2, 0, 1))
        mask = jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift else None
        blocks.append((p, shift, bias, mask))

    @jax.jit
    def fn(x):
        for p, shift, bias, mask in blocks:
            x = _block_jnp(x, p, H, W, heads, window, shift, bias, mask)
        if with_downsample and i_layer < 3:
            pm = params[f"layers_{i_layer}_downsample"]
            xs = x.reshape(B, H, W, dim)
            xs = jnp.concatenate(
                [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]],
                axis=-1,
            ).reshape(B, -1, 4 * dim)
            x = _ln(xs, pm["norm"]) @ pm["reduction"]["kernel"]
        return x
    return fn, (B, H * W, dim)

total = 0
r = np.random.default_rng(0)
for i in range(4):
    fn, shape = stage_fn(i)
    x = jnp.asarray(r.standard_normal(shape).astype(np.float32) * 0.1)
    total += bench(fn, x, f"stage {i}  dim={shape[-1]} tokens={shape[1]} depth={cfg.depths[i]}")
print(f"{'sum of stages':42s}: {total:7.2f} ms/batch")

# intra-stage-1 pieces (dim 96, 4096 tokens, 2 blocks)
H = W = 64; dim = 96; heads = 4; window = 8; N = 64
p = params["layers_0_blocks_0"]
x = jnp.asarray(r.standard_normal((B, H * W, dim)).astype(np.float32) * 0.1)

@jax.jit
def ln_only(x):
    return _ln(x, p["norm1"])

@jax.jit
def qkv_only(x):
    return x @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]

@jax.jit
def winpart(x):
    h = x.reshape(B, H, W, dim)
    hw = (h.reshape(B, H // window, window, W // window, window, dim)
          .transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, dim))
    return hw

@jax.jit
def mlp_only(x):
    m = jax.nn.gelu(x @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"], approximate=False)
    return m @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]

table = p["attn"]["relative_position_bias_table"]
rel_idx = _relative_position_index(window, window).reshape(-1)
bias = jnp.asarray(np.asarray(table)[np.asarray(rel_idx)].reshape(N, N, heads).transpose(2, 0, 1))
hw0 = np.asarray(winpart(x))
hwj = jnp.asarray(hw0)

@jax.jit
def attn_only(hw):
    hd = dim // heads
    qkv = hw @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]
    q, k, v = [qkv[..., i * dim:(i + 1) * dim].reshape(-1, N, heads, hd).transpose(0, 2, 1, 3) for i in range(3)]
    a = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k) + bias[None]
    a = jax.nn.softmax(a, -1)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
    return o.transpose(0, 2, 1, 3).reshape(-1, N, dim) @ p["attn"]["proj"]["kernel"]

bench(ln_only, x, "s1: LN only")
bench(qkv_only, x, "s1: qkv matmul only")
bench(winpart, x, "s1: window partition only")
bench(mlp_only, x, "s1: MLP only")
bench(attn_only, hwj, "s1: windowed attention (qkv+softmax+proj)")

# stage-3 (dim=384, depth=6) is the other candidate hot spot; intra pieces
p3 = params["layers_2_blocks_0"]
x3 = jnp.asarray(r.standard_normal((B, 256, 384)).astype(np.float32) * 0.1)

@jax.jit
def mlp3(x):
    m = jax.nn.gelu(x @ p3["mlp"]["fc1"]["kernel"] + p3["mlp"]["fc1"]["bias"], approximate=False)
    return m @ p3["mlp"]["fc2"]["kernel"] + p3["mlp"]["fc2"]["bias"]

bench(mlp3, x3, "s3: MLP only (x6 blocks)")
