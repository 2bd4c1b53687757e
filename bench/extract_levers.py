"""Same-process A/B of round-4 extraction levers on the production operaCT
graph (B=64 and 256, 8.18 s clips):
  1. split-DFT mel framing (audio/dsp.py) vs the old concat-framing mel
     (reproduced inline here),
  2. fast_softmax on vs off on the full fused graph,
and the combined graph's feature cosine vs the exact f32 XLA path.

Min over alternated rounds in one process — pool contention cancels.
Usage: [B=64] [ROUNDS=8] python bench/extract_levers.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp
from heart_murmur_detection_tpu.audio.dsp import _dft_bases, frame_half_hop
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.cola import Cola
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused

SR = 16000
CLIP_SEC = 8.18
B = int(os.environ.get("B", 64))
ROUNDS = int(os.environ.get("ROUNDS", 8))
HIGH = jax.lax.Precision.HIGH

model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
enc_vars = {
    "params": variables["params"]["encoder"],
    "batch_stats": variables["batch_stats"]["encoder"],
}
dev = jax.devices()[0]
max_len = ((int(CLIP_SEC * SR) + 511) // 512) * 512
r = np.random.default_rng(0)
clips = [
    (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(CLIP_SEC * SR)) / SR)
     + 0.05 * r.standard_normal(int(CLIP_SEC * SR))).astype(np.float32)
    for _ in range(B)
]
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wavj = jax.device_put(jnp.asarray(wav), dev)
lenj = jax.device_put(jnp.asarray(lengths), dev)


def mel_old(wav, lengths, prec=HIGH):
    """The pre-round-4 mel: concat framing + double-width DFT matmul."""
    B_, Nmax = wav.shape
    n_fft, hop = 1024, 512
    x = jnp.pad(wav, ((0, 0), (hop, hop)))
    frames = frame_half_hop(x, n_fft)
    Tmax = Nmax // hop + 1
    frames = frames[:, :Tmax]
    cos, sin = _dft_bases(n_fft, "hann_periodic")
    re = jnp.matmul(frames, jnp.asarray(cos), precision=prec)
    im = jnp.matmul(frames, jnp.asarray(sin), precision=prec)
    power = (re * re + im * im).astype(jnp.float32)
    from heart_murmur_detection_tpu.audio.dsp import _mel_fb
    fb = jnp.asarray(_mel_fb(SR, n_fft, 64, 50.0, 8000.0))
    mel = jnp.matmul(power, fb, precision=prec)
    n_frames = (lengths // hop + 1).astype(jnp.int32)
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]
    vmask = valid[:, :, None]
    logm = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    ref_db = jnp.max(jnp.where(vmask, logm, -jnp.inf), axis=(1, 2), keepdims=True)
    db = jnp.maximum(logm - ref_db, -80.0)
    lo = jnp.min(jnp.where(vmask, db, jnp.inf), axis=(1, 2), keepdims=True)
    hi = jnp.max(jnp.where(vmask, db, -jnp.inf), axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-12), 1.0)
    db = (db - lo) * scale
    return jnp.where(vmask, db, 0.0).astype(jnp.float32), n_frames


def graph(mel_fn, fast):
    @jax.jit
    def fn(wav, lengths):
        mel, nf = mel_fn(wav, lengths)
        return htsat_apply_fused(
            enc_vars, mel, nf, HTSATConfig(), mm_dtype=jnp.bfloat16,
            fast_softmax=fast,
        )
    return fn


variants = {
    "old_mel+slow_sm": graph(mel_old, False),
    "new_mel+slow_sm": graph(lambda w, l: dsp.mel_frontend(w, l, precision=HIGH), False),
    "new_mel+fast_sm": graph(lambda w, l: dsp.mel_frontend(w, l, precision=HIGH), True),
}


@jax.jit
def exact_f32(wav, lengths):
    mel, nf = dsp.mel_frontend(wav, lengths)
    return model.apply(variables, mel, 768, nf, method=Cola.extract_feature)


outs = {}
for name, fn in variants.items():
    t0 = time.time()
    outs[name] = np.asarray(fn(wavj, lenj))
    print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)
ref = np.asarray(exact_f32(wavj, lenj))


def cos(a, b):
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return float(np.min(np.sum(a * b, axis=1)))


for name, y in outs.items():
    print(f"{name}: cosine vs exact f32 = {cos(y, ref):.7f}", flush=True)

best = {k: 1e9 for k in variants}
for rd in range(ROUNDS):
    for name, fn in variants.items():
        t0 = time.time()
        for _ in range(8):
            y = fn(wavj, lenj)
        np.asarray(y)
        best[name] = min(best[name], (time.time() - t0) / 8 * 1000)
    print(f"round {rd}: " + " ".join(f"{k}={v:.2f}ms" for k, v in best.items()),
          flush=True)

print()
for name, v in best.items():
    print(f"{name:18s} {v:7.2f} ms/batch  {B / v * 1000:7.0f} clips/s")
