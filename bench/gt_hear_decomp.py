"""Cumulative-prefix decomposition of the operaGT and HeAR production
extraction graphs (scalar outputs, same-process minima): the vit_sweep
showed the fused block stacks cost only ~4.7 ms (ViT-S) / ~32 ms (ViT-L)
at production geometry, yet the production graphs measure 45.5 / 60.3
ms/batch — the gap lives OUTSIDE the blocks. Find it."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.audio.hear_frontend import (
    hear_preprocess, pcen, resize_bilinear_tf,
)

SR = 16000
ROUNDS = 6
REPS = 8
r = np.random.default_rng(0)


def timeit(name, fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.time()
        for _ in range(REPS):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / REPS * 1000)
    print(f"  {name:42s} {best:8.2f} ms", flush=True)
    return best


# ---------------- operaGT ----------------
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

B = 64
fe = FeatureExtractor("operaGT", dim=384, input_sec=8.18, batch_size=B,
                      random_init=True)
clip = int(8.18 * SR)
clips = [(0.3 * np.sin(2 * np.pi * 80 * np.arange(clip) / SR)
          + 0.05 * r.standard_normal(clip)).astype(np.float32) for _ in range(B)]
max_len = ((clip + 511) // 512) * 512
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wj = jnp.asarray(wire.encode_np(wav, fe.wire))
lj = jnp.asarray(lengths)
v = fe.variables
cfg = fe.model.config

print(f"=== operaGT (wire={fe.wire}, B={B}) ===", flush=True)
timeit("full production graph", lambda: fe._fn(v, wj, lj))


@jax.jit
def g_prologue(v, wav, lengths):
    w, l = fe._prologue(wav, lengths)
    return w.astype(jnp.float32).sum()


@jax.jit
def g_mel(v, wav, lengths):
    w, l = fe._prologue(wav, lengths)
    mel, nf = fe._mel(w, l)
    return mel.sum()


from heart_murmur_detection_tpu.models.vit_fused import (
    _encode, _patch_embed, mae_forward_feature_fused, sincos_pos_embed_flexible,
)


@jax.jit
def g_patch(v, wav, lengths):
    w, l = fe._prologue(wav, lengths)
    mel, nf = fe._mel(w, l)
    mel = mel[:, :256]
    params = v["params"]
    pe = params["patch_embed_proj"]
    h = _patch_embed(mel, pe["kernel"], pe["bias"], cfg.patch_size, jnp.bfloat16)
    return h.astype(jnp.float32).sum()


@jax.jit
def g_full(v, wav, lengths):
    w, l = fe._prologue(wav, lengths)
    mel, nf = fe._mel(w, l)
    mel = mel[:, :256]
    return mae_forward_feature_fused(
        v, mel, cfg, mm_dtype=jnp.bfloat16, fast_softmax=True
    ).sum()


timeit("prologue (wire decode)", g_prologue, v, wj, lj)
timeit("+ mel frontend", g_mel, v, wj, lj)
timeit("+ patch embed", g_patch, v, wj, lj)
timeit("+ blocks + head (scalar out)", g_full, v, wj, lj)

# ---------------- HeAR ----------------
from heart_murmur_detection_tpu.models.hear import HeARConfig, HeAREncoder
from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

B = 64
cfgh = HeARConfig()
enc = HeAREncoder(cfgh)
rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    vh = enc.init(rng, jnp.zeros((1, 32000)))
vh = jax.device_put(vh, jax.devices()[0])
wavh = jnp.asarray(r.standard_normal((B, 32000)).astype(np.float32))

print(f"\n=== HeAR (B={B}) ===", flush=True)
timeit("full fused graph",
       jax.jit(lambda v, w: hear_forward_fused(v, w, cfgh).sum()), vh, wavh)
timeit("preprocess (mel-PCEN-resize)",
       jax.jit(lambda w: hear_preprocess(w).sum()), wavh)


@jax.jit
def h_stft(w):
    from heart_murmur_detection_tpu.audio.hear_frontend import (
        FRAME, HOP, N_SAMPLES, _dft, tf_mel_matrix,
    )
    B, N = w.shape
    x = w.astype(jnp.float32)
    x = x - jnp.min(x, axis=1, keepdims=True)
    x = x / (jnp.max(x, axis=1, keepdims=True) + 1e-8)
    x = x * 2.0 - 1.0
    n_frames = -(-N_SAMPLES // HOP)
    padded = (n_frames - 1) * HOP + FRAME
    x = jnp.pad(x, ((0, 0), (0, padded - N_SAMPLES)))
    patches = jax.lax.conv_general_dilated_patches(x[:, None, :], (FRAME,), (HOP,), "VALID")
    frames = jnp.transpose(patches, (0, 2, 1))
    cos, sin = _dft(FRAME)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin), precision=hi)
    power = re * re + im * im
    mel = jnp.matmul(power, jnp.asarray(tf_mel_matrix()), precision=hi)
    return mel


timeit("stft+mel only", lambda w: h_stft(w).sum(), wavh)
mel_h = h_stft(wavh)
np.asarray(mel_h)
timeit("pcen only (scan)", jax.jit(lambda m: pcen(m).sum()), mel_h)
timeit("resize only (gather bilinear)",
       jax.jit(lambda m: resize_bilinear_tf(m, 192, 128).sum()), mel_h)
