"""A/B: XLA (bf16 ViTBlocks) vs fused Pallas ViT kernels for the MAE
extraction forwards, same process, min-over-rounds, scalar-sum outputs
(feature tensors are small, but keep the sync cheap anyway).

Usage: python bench/vit_fused_check.py [operaGT|audiomae|both]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.vit_mae import (
    AudioMAEClassifierBackbone,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from heart_murmur_detection_tpu.models.vit_fused import (
    audiomae_backbone_fused,
    mae_forward_feature_fused,
)

REPS = int(os.environ.get("REPS", 5))
ROUNDS = int(os.environ.get("ROUNDS", 8))
dev = jax.devices()[0]
r = np.random.default_rng(0)


def timeit(name, fn, *args):
    y = fn(*args)
    np.asarray(y)
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.time()
        for _ in range(REPS):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / REPS * 1000)
    print(f"{name:46s} {best:8.2f} ms", flush=True)
    return best


def cosine(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(
        (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30)
    )


def run_operagt():
    B = 64
    cfg_bf = mae_vit_small_config(compute_dtype=jnp.bfloat16)
    model = MaskedAutoencoderViT(cfg_bf)
    x = r.random((B, 256, 64)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        v = model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            x[:1],
        )
    v = jax.device_put(v, dev)
    xj = jax.device_put(jnp.asarray(x), dev)
    cfg = mae_vit_small_config()

    xla = jax.jit(lambda v, x: model.apply(
        v, x, method=MaskedAutoencoderViT.forward_feature))
    fused = jax.jit(lambda v, x: mae_forward_feature_fused(
        v, x, cfg, mm_dtype=jnp.bfloat16))
    fused32 = jax.jit(lambda v, x: mae_forward_feature_fused(v, x, cfg))

    fa, fb = xla(v, xj), fused(v, xj)
    print(f"operaGT feature cosine fused-bf16 vs xla-bf16: {cosine(fa, fb):.7f}")
    t_x = timeit("operaGT xla bf16-blocks", xla, v, xj)
    t_f = timeit("operaGT fused pallas bf16", fused, v, xj)
    t_f32 = timeit("operaGT fused pallas f32", fused32, v, xj)
    print(f"operaGT: {B / (t_x / 1000):.0f} -> {B / (t_f / 1000):.0f} clips/s "
          f"({t_x / t_f:.2f}x); f32 fused {B / (t_f32 / 1000):.0f}", flush=True)


def run_audiomae():
    B = 32
    cfg_bf = audiomae_base_config(compute_dtype=jnp.bfloat16)
    model = AudioMAEClassifierBackbone(cfg_bf)
    x = r.random((B, 1000, 128)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        v = model.init(jax.random.PRNGKey(0), x[:1])
    v = jax.device_put(v, dev)
    xj = jax.device_put(jnp.asarray(x), dev)
    cfg = audiomae_base_config()

    xla = jax.jit(lambda v, x: model.apply(v, x))
    fused = jax.jit(lambda v, x: audiomae_backbone_fused(
        v, x, cfg, mm_dtype=jnp.bfloat16))

    fa, fb = xla(v, xj), fused(v, xj)
    print(f"audiomae feature cosine fused-bf16 vs xla-bf16: {cosine(fa, fb):.7f}")
    t_x = timeit("audiomae xla bf16-blocks", xla, v, xj)
    t_f = timeit("audiomae fused pallas bf16", fused, v, xj)
    print(f"audiomae: {B / (t_x / 1000):.0f} -> {B / (t_f / 1000):.0f} clips/s "
          f"({t_x / t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("operaGT", "both"):
        run_operagt()
    if which in ("audiomae", "both"):
        run_audiomae()
