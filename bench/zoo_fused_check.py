"""A/B: XLA flax forwards vs the new fused Pallas paths for the remaining
zoo encoders — HeAR (ViT-L/16, 2 s clips) and CLAP-2023 (HTS-AT tower @44.1 kHz,
7 s clips). Same harness as bench/vit_fused_check.py: same process,
min-over-rounds, device-resident inputs.

Usage: python bench/zoo_fused_check.py [hear|clap|both]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

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


def run_hear():
    from heart_murmur_detection_tpu.models.hear import HeARConfig, HeAREncoder
    from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

    B = int(os.environ.get("B", 64))
    cfg = HeARConfig()
    model = HeAREncoder(cfg)
    wav = (r.standard_normal((B, 32000)) * 0.1).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[:1]))
    v = jax.device_put(v, dev)
    wj = jax.device_put(jnp.asarray(wav), dev)

    xla = jax.jit(lambda v, w: model.apply(v, w)["pooled"])
    fused = jax.jit(lambda v, w: hear_forward_fused(v, w, cfg))

    fa, fb = xla(v, wj), fused(v, wj)
    print(f"hear pooled cosine fused-bf16 vs xla-f32: {cosine(fa, fb):.7f}")
    t_x = timeit(f"hear ViT-L xla f32 (B={B})", xla, v, wj)
    t_f = timeit(f"hear ViT-L fused pallas bf16 (B={B})", fused, v, wj)
    print(f"hear: {B / (t_x / 1000):.0f} -> {B / (t_f / 1000):.0f} clips/s "
          f"({t_x / t_f:.2f}x)", flush=True)


def run_clap():
    from heart_murmur_detection_tpu.models.clap import (
        CLAPAudioEncoder,
        CLAPConfig,
        clap_audio_forward_fused,
    )

    B = int(os.environ.get("B", 32))
    cfg = CLAPConfig(version="2023")
    model = CLAPAudioEncoder(cfg)
    n = int(cfg.duration * cfg.sample_rate)
    n = (n + cfg.hop - 1) // cfg.hop * cfg.hop
    wav = (r.standard_normal((B, n)) * 0.05).astype(np.float32)
    lengths = np.full((B,), n, np.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        v = model.init(
            jax.random.PRNGKey(0), jnp.asarray(wav[:1]), jnp.asarray(lengths[:1])
        )
    v = jax.device_put(v, dev)
    wj = jax.device_put(jnp.asarray(wav), dev)
    lj = jax.device_put(jnp.asarray(lengths), dev)

    xla = jax.jit(lambda v, w, l: model.apply(v, w, l))
    fused = jax.jit(lambda v, w, l: clap_audio_forward_fused(v, w, l, cfg))

    fa, fb = xla(v, wj, lj), fused(v, wj, lj)
    print(f"clap-2023 embedding cosine fused-bf16 vs xla-f32: {cosine(fa, fb):.7f}")
    t_x = timeit(f"clap-2023 htsat xla f32 (B={B})", xla, v, wj, lj)
    t_f = timeit(f"clap-2023 htsat fused pallas bf16 (B={B})", fused, v, wj, lj)
    print(f"clap-2023: {B / (t_x / 1000):.0f} -> {B / (t_f / 1000):.0f} clips/s "
          f"({t_x / t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("hear", "both"):
        run_hear()
    if which in ("clap", "both"):
        run_clap()
