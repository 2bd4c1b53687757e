"""HeAR mel-PCEN frontend in JAX (hear/python/data_processing/audio_utils.py
:365-476): 2 s @16 kHz clip -> min-max to [-1,1] -> STFT (frame 400, fft 400,
hop 160, periodic hann, pad_end, NO center pad) -> power -> TF
linear_to_mel_weight_matrix (HTK mel, 128 bins, 0-8000 Hz, DC bin zeroed) ->
PCEN (alpha .8, s .04, delta 2, root 2, floor 1e-8, EMA seeded with frame 0)
-> bilinear resize (align_corners=False) to (192, 128)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_SAMPLES = 32000
FRAME = 400
HOP = 160
N_BINS = FRAME // 2 + 1  # 201


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def tf_mel_matrix(
    num_mel_bins: int = 128,
    num_spectrogram_bins: int = N_BINS,
    sample_rate: float = 16000.0,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
) -> np.ndarray:
    """tf.signal.linear_to_mel_weight_matrix semantics (audio_utils.py:256-363)."""
    nyq = sample_rate / 2.0
    freqs = np.linspace(0.0, nyq, num_spectrogram_bins)[1:]  # DC bin excluded
    spec_mel = _hz_to_mel_htk(freqs)
    edges = np.linspace(
        _hz_to_mel_htk(lower_edge_hertz),
        _hz_to_mel_htk(upper_edge_hertz),
        num_mel_bins + 2,
    )
    lower = edges[:-2][None, :]
    center = edges[1:-1][None, :]
    upper = edges[2:][None, :]
    up = (spec_mel[:, None] - lower) / (center - lower)
    down = (upper - spec_mel[:, None]) / (upper - center)
    w = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_spectrogram_bins, num_mel_bins), np.float32)
    out[1:] = w
    return out


@functools.lru_cache(maxsize=None)
def _dft(frame: int):
    k = np.arange(frame // 2 + 1)
    n = np.arange(frame)
    ang = 2 * np.pi * np.outer(n, k) / frame
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / frame)  # periodic hann
    return (
        (np.cos(ang) * w[:, None]).astype(np.float32),
        (-np.sin(ang) * w[:, None]).astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _ema_matrix(T: int, s: float) -> np.ndarray:
    """Closed form of the PCEN EMA as a lower-triangular (T, T) matrix.

    m_t = (1-s) m_{t-1} + s e_t with m_0 = E[0] unrolls to
    M[t] = (1-s)^t E[0] + sum_{j=1..t} s (1-s)^{t-j} E[j]; with T=200 and
    s=0.04 the smallest coefficient is (1-s)^199 ~ 3e-4 — no underflow.
    One (T, T) x (T, B*F) MXU matmul replaces the T-step serial lax.scan
    (200 dependent VPU steps on a (B, F) row — the scan was ~10% of the
    HeAR extraction graph, RESULTS.md round 4)."""
    t = np.arange(T)[:, None]
    j = np.arange(T)[None, :]
    A = s * (1.0 - s) ** (t - j)
    A[:, 0] = (1.0 - s) ** t[:, 0]
    return np.where(j <= t, A, 0.0).astype(np.float32)


def pcen(
    E: jnp.ndarray,
    alpha: float = 0.8,
    s: float = 0.04,
    delta: float = 2.0,
    root: float = 2.0,
    floor: float = 1e-8,
    impl: str = "matmul",
) -> jnp.ndarray:
    """Per-channel energy normalisation over time axis 1. E: (B, T, F).

    impl: "matmul" (default) computes the EMA smoother as one triangular
    matmul on the MXU — identical recurrence, reassociated float sums
    (~1e-6 relative vs "scan", tests/test_baseline_encoders.py).
    "scan" is the literal serial reference (hear audio_utils.py:407-427).

    The matmul form is O(T^2) memory/FLOPs — right for HeAR's T=200, wrong
    for long sequences (and (1-s)^t underflows for very large T), so it
    auto-falls back to "scan" past T=2048."""
    if impl == "matmul" and E.shape[1] > 2048:
        impl = "scan"
    if impl == "matmul":
        A = jnp.asarray(_ema_matrix(E.shape[1], s))
        M = jnp.einsum(
            "tj,bjf->btf", A, E, precision=jax.lax.Precision.HIGHEST
        )
    else:

        def step(m, e):
            m = (1.0 - s) * m + s * e
            return m, m

        m0 = E[:, 0]
        _, M = jax.lax.scan(step, m0, jnp.swapaxes(E, 0, 1))
        M = jnp.swapaxes(M, 0, 1)
    r = 1.0 / root
    return (E / (floor + M) ** alpha + delta) ** r - delta**r


def _axis_weights(n_in, n_out):
    pos = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    i0 = np.clip(np.floor(pos), 0, n_in - 1).astype(np.int32)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    frac = np.clip(pos - i0, 0.0, 1.0).astype(np.float32)
    return i0, i1, frac


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) 2-tap bilinear weight matrix (half-pixel, TF semantics) —
    the gather-free form: TPU gathers serialize, a banded matmul rides the
    MXU (same trick as audio.dsp.resize_bicubic_time)."""
    i0, i1, frac = _axis_weights(n_in, n_out)
    W = np.zeros((n_out, n_in), np.float32)
    W[np.arange(n_out), i0] += 1.0 - frac
    W[np.arange(n_out), i1] += frac
    return W


def resize_bilinear_tf(
    x: jnp.ndarray, out_h: int, out_w: int, impl: str = "matmul"
) -> jnp.ndarray:
    """tf.image.resize bilinear (align_corners=False, half-pixel). x: (B,H,W).

    impl "matmul": out = Wh @ x @ Ww^T as two banded matmuls (exact same
    2-tap weights; MXU instead of serialized gathers). "gather" is the
    literal indexed form."""
    B, H, W = x.shape
    if impl == "matmul":
        hi = jax.lax.Precision.HIGHEST
        out = jnp.einsum("oh,bhw->bow", jnp.asarray(_resize_matrix(H, out_h)),
                         x, precision=hi)
        if not (out_w == W):
            out = jnp.einsum(
                "bow,pw->bop", out, jnp.asarray(_resize_matrix(W, out_w)),
                precision=hi,
            )
        return out

    h0, h1, hf = _axis_weights(H, out_h)
    w0, w1, wf = _axis_weights(W, out_w)
    top = x[:, h0][:, :, w0] * (1 - wf)[None, None, :] + x[:, h0][:, :, w1] * wf[None, None, :]
    bot = x[:, h1][:, :, w0] * (1 - wf)[None, None, :] + x[:, h1][:, :, w1] * wf[None, None, :]
    return top * (1 - hf)[None, :, None] + bot * hf[None, :, None]


def hear_preprocess(audio: jnp.ndarray, precision=None) -> jnp.ndarray:
    """(B, 32000) waveform -> (B, 192, 128) mel-PCEN (audio_utils.preprocess_audio).

    precision: DFT/mel matmul precision. None = HIGHEST (strict parity);
    the bf16 fused extraction path passes Precision.HIGH (bf16x3, ~1e-7
    relative — the audio.dsp.mel_frontend policy)."""
    B, N = audio.shape
    if N < N_SAMPLES:
        audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - N)))
    x = audio.astype(jnp.float32)
    x = x - jnp.min(x, axis=1, keepdims=True)
    x = x / (jnp.max(x, axis=1, keepdims=True) + 1e-8)
    x = x * 2.0 - 1.0

    # pad_end framing: n_frames = ceil(N / hop); conv-free strided-slice
    # framing (audio.dsp.frame_signal — patches-conv costs an implicit
    # identity conv)
    from .dsp import frame_signal

    n_frames = -(-N_SAMPLES // HOP)
    frames = frame_signal(x, FRAME, HOP, n_frames)  # (B, n_frames, FRAME)
    cos, sin = _dft(FRAME)
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    re = jnp.matmul(frames, jnp.asarray(cos), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin), precision=hi)
    power = re * re + im * im
    mel = jnp.matmul(power, jnp.asarray(tf_mel_matrix()), precision=hi)
    out = pcen(mel)  # (B, 200, 128)
    return resize_bilinear_tf(out, 192, 128)
