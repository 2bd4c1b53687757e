"""Round-4 zoo A/B: old vs new frontend defaults, alternating in ONE process
(min over rounds), with feature cosine old-vs-new.

- CLAP-2023: logmel frontend HIGHEST (old) vs HIGH/bf16x3 (new default on the
  bf16 fused path) — the 44.1 kHz frontend was ~60% of the whole graph.
- HeAR: preprocess HIGHEST + scan-PCEN + gather-resize (old) vs HIGH +
  matmul-EMA PCEN + matmul resize (new defaults).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

r = np.random.default_rng(0)
ROUNDS = 8


def cosine(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    num = (a * b).sum(1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    return float((num / den).min())


def ab(name, fns, args):
    outs = {k: np.asarray(f(*args)) for k, f in fns.items()}
    ks = list(fns)
    print(f"{name}: cosine old-vs-new {cosine(outs[ks[0]], outs[ks[1]]):.7f}",
          flush=True)
    best = {k: 1e9 for k in fns}
    for _ in range(ROUNDS):
        for k, f in fns.items():
            t0 = time.time()
            for _ in range(6):
                y = f(*args)
            np.asarray(y)
            best[k] = min(best[k], (time.time() - t0) / 6 * 1000)
    o, n = best[ks[0]], best[ks[1]]
    print(f"  {ks[0]}: {o:.2f} ms   {ks[1]}: {n:.2f} ms   -> {o/n:.3f}x",
          flush=True)


# ---------------- CLAP-2023 ----------------
from heart_murmur_detection_tpu.audio.dsp import logmel_frontend_general
from heart_murmur_detection_tpu.models.clap import (
    CLAPAudioEncoder, CLAPConfig, clap_audio_forward_fused,
)
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused

cfg = CLAPConfig(version="2023")
B = 32
n = int(cfg.duration * cfg.sample_rate)
n = (n + cfg.hop - 1) // cfg.hop * cfg.hop
model = CLAPAudioEncoder(cfg)
with jax.default_device(jax.devices("cpu")[0]):
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, n)),
                   jnp.full((1,), n, jnp.int32))
v = jax.device_put(v, jax.devices()[0])
wav = jnp.asarray((0.3 * np.sin(2 * np.pi * 80 * np.arange(n) / 44100)
                   + 0.05 * r.standard_normal(n)).astype(np.float32))
wav = jnp.broadcast_to(wav, (B, n))
lengths = jnp.full((B,), n, jnp.int32)


def logmel_old(wav, lengths):
    # the pre-round-4 frontend: conv_general_dilated_patches framing (an
    # implicit 1024^2-channel identity conv) + HIGHEST-precision DFT/mel
    import numpy as _np

    from heart_murmur_detection_tpu.audio.dsp import _dft_bases, _mel_fb

    hi = jax.lax.Precision.HIGHEST
    B_, Nmax = wav.shape
    pad = cfg.n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    Tmax = Nmax // cfg.hop + 1
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :], (cfg.n_fft,), (cfg.hop,), "VALID"
    )
    frames = jnp.transpose(patches, (0, 2, 1))[:, :Tmax].astype(jnp.float32)
    cos, sin = _dft_bases(cfg.n_fft, "hann_periodic")
    re = jnp.matmul(frames, jnp.asarray(cos), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin), precision=hi)
    power = re * re + im * im
    fb = jnp.asarray(_mel_fb(cfg.sample_rate, cfg.n_fft, cfg.mel_bins,
                             cfg.fmin, cfg.fmax))
    mel = jnp.matmul(power, fb, precision=hi)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    n_frames = (lengths // cfg.hop + 1).astype(jnp.int32)
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]
    return jnp.where(valid[:, :, None], logmel, 0.0), n_frames


def clap_old(v, wav, lengths):
    # the pre-round-4 default: patches framing + HIGHEST + same fused tower
    logmel, nf = logmel_old(wav, lengths)
    sub = {"params": v["params"]["base"], "batch_stats": v["batch_stats"]["base"]}
    emb = htsat_apply_fused(
        sub, logmel, nf,
        HTSATConfig(mel_bins=cfg.mel_bins, num_classes=cfg.classes_num),
        mm_dtype=jnp.bfloat16, fast_softmax=True,
    )
    p = v["params"]["projection"]
    e1 = emb @ p["linear1"]["kernel"]
    e2 = jax.nn.gelu(e1, approximate=False) @ p["linear2"]["kernel"]
    h = e1 + e2
    ln = p["layer_norm"]
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]


ab("CLAP-2023 (B=32)", {
    "old(HIGHEST frontend)": jax.jit(clap_old),
    "new(HIGH frontend)": jax.jit(
        lambda v, w, l: clap_audio_forward_fused(v, w, l, cfg, fast_softmax=True)
    ),
}, (v, wav, lengths))

# ---------------- audiomae (kaldi framing) ----------------
from heart_murmur_detection_tpu.audio import dsp as _dsp
from heart_murmur_detection_tpu.audio import reference_np as _ref
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor
from heart_murmur_detection_tpu.models.vit_fused import audiomae_backbone_fused

fe = FeatureExtractor("audiomae", dim=768, input_sec=10.0, batch_size=32,
                      random_init=True)
wav_am = jnp.asarray(r.standard_normal((32, 160000)).astype(np.float32) * 0.1)
len_am = jnp.full((32,), 160000, jnp.int32)


def kaldi_old(wav, lengths, prec):
    # pre-round-4 framing: conv_general_dilated_patches
    B_, Nmax = wav.shape
    sr, win, shift = 16000, 400, 160
    padded = 512
    mean = jnp.sum(wav, axis=1, keepdims=True) / jnp.maximum(lengths[:, None], 1)
    valid_n = jnp.arange(Nmax)[None, :] < lengths[:, None]
    wav = jnp.where(valid_n, wav - mean, 0.0)
    Tmax = max(1 + (Nmax - win) // shift, 1)
    patches = jax.lax.conv_general_dilated_patches(
        wav[:, None, :], (win,), (shift,), "VALID"
    )
    frames = jnp.transpose(patches, (0, 2, 1))[:, :Tmax].astype(jnp.float32)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]], axis=-1)
    frames = frames - 0.97 * prev
    w = jnp.asarray(_ref.hanning_symmetric(win), dtype=jnp.float32)
    frames = frames * w
    fr = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))
    cos, sin = _dsp._dft_bases(padded, "none")
    re = jnp.matmul(fr, jnp.asarray(cos), precision=prec)
    im = jnp.matmul(fr, jnp.asarray(sin), precision=prec)
    power = re * re + im * im
    banks = jnp.asarray(_ref.kaldi_mel_banks(128, padded, sr).T)
    mel_e = jnp.matmul(power[:, :, : padded // 2], banks, precision=prec)
    mel_e = jnp.log(jnp.maximum(mel_e, jnp.finfo(jnp.float32).eps))
    n_frames = jnp.where(lengths >= win, 1 + (lengths - win) // shift, 0).astype(jnp.int32)
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]
    return jnp.where(valid[:, :, None], mel_e, 0.0), n_frames


cfg_am = fe.model.config
ab("audiomae (B=32)", {
    "old(patches framing)": jax.jit(
        lambda v, w, l: audiomae_backbone_fused(
            v, kaldi_old(w, l, jax.lax.Precision.HIGH)[0], cfg_am,
            mm_dtype=jnp.bfloat16, fast_softmax=True)
    ),
    "new(strided framing)": jax.jit(
        lambda v, w, l: audiomae_backbone_fused(
            v, _dsp.kaldi_fbank_frontend(
                w, l, precision=jax.lax.Precision.HIGH)[0], cfg_am,
            mm_dtype=jnp.bfloat16, fast_softmax=True)
    ),
}, (fe.variables, wav_am, len_am))

# ---------------- HeAR ----------------
from heart_murmur_detection_tpu.audio.hear_frontend import (
    FRAME, HOP, N_SAMPLES, _dft, pcen, resize_bilinear_tf, tf_mel_matrix,
)
from heart_murmur_detection_tpu.models.hear import HeARConfig, HeAREncoder
from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

cfgh = HeARConfig()
enc = HeAREncoder(cfgh)
with jax.default_device(jax.devices("cpu")[0]):
    vh = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)))
vh = jax.device_put(vh, jax.devices()[0])
Bh = 64
wavh = jnp.asarray(r.standard_normal((Bh, 32000)).astype(np.float32) * 0.1)


def hear_pre_old(audio):
    B, N = audio.shape
    x = audio.astype(jnp.float32)
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
    out = pcen(mel, impl="scan")
    return resize_bilinear_tf(out, 192, 128, impl="gather")


ab("HeAR (B=64)", {
    "old(scan+gather+HIGHEST)": jax.jit(
        lambda v, w: hear_forward_fused(v, hear_pre_old(w), cfgh,
                                        from_spectrogram=True, fast_softmax=True)
    ),
    "new(matmul EMA/resize+HIGH)": jax.jit(
        lambda v, w: hear_forward_fused(v, w, cfgh, fast_softmax=True)
    ),
}, (vh, wavh))
