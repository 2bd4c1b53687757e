"""Pallas TPU kernel: fused STFT -> power -> mel -> log10 frontend.

One kernel computes log-mel for a tile of frames without round-tripping the
(B, T, 513) power spectrum through HBM: waveform tiles stream into VMEM, the
windowed-DFT and mel projections run back-to-back on the MXU, and only the
tiny (B, T, n_mels) log-mel leaves the core. The per-clip dB referencing /
min-max normalisation stay in XLA (they are global reductions over a small
tensor; see audio/dsp.mel_frontend which this kernel can replace via
use_pallas=True).

Grid: (B, T_tiles). Per step the kernel sees a (TILE+1, hop) waveform block
(frames at 50% hop are two adjacent hop-chunks), the padded DFT bases and the
mel filterbank resident in VMEM across steps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio import reference_np as ref

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _bases(n_fft: int, sr: int, n_mels: int, fmin: float, fmax: float):
    """Windowed DFT bases and mel filterbank, padded to lane multiples."""
    n_bins = 1 + n_fft // 2
    pad_bins = _round_up(n_bins, LANE)
    k = np.arange(n_bins)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    w = ref.hann_periodic(n_fft)
    cos = np.zeros((n_fft, pad_bins), np.float32)
    sin = np.zeros((n_fft, pad_bins), np.float32)
    cos[:, :n_bins] = np.cos(ang) * w[:, None]
    sin[:, :n_bins] = -np.sin(ang) * w[:, None]
    fb = np.zeros((pad_bins, _round_up(n_mels, LANE)), np.float32)
    fb[:n_bins, :n_mels] = ref.mel_filterbank_slaney(sr, n_fft, n_mels, fmin, fmax).T
    return cos, sin, fb


def _kernel(a_ref, b_ref, cos_ref, sin_ref, fb_ref, out_ref, *, tile, hop, n_fft, prec):
    # frame i = chunk i ++ chunk i+1; a/b are the two aligned chunk streams
    frames = jnp.concatenate([a_ref[0], b_ref[0]], axis=1)  # (TILE, n_fft)
    re = jnp.dot(frames, cos_ref[:], precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], precision=prec, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], precision=prec, preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


def fused_logmel(
    wav: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 8000.0,
    n_fft: int = 1024,
    hop: int = 512,
    tile: int = 64,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """log10 mel power for (B, N) waveforms -> (B, T, n_mels_padded[:n_mels]).

    N must be a multiple of hop; T = N//hop + 1 rounded down to tile grid
    coverage (callers pass padded buffers; invalid frames masked downstream,
    matching audio/dsp.mel_frontend semantics).

    precision: MXU pass count for the DFT/mel matmuls. None = HIGHEST
    (bf16x6, strict f32 librosa parity); HIGH = bf16x3 (~1e-7 rel err,
    matches the bf16 extraction path's XLA mel).
    """
    assert hop * 2 == n_fft
    B, N = wav.shape
    T = N // hop + 1
    Tpad = _round_up(T, tile)
    cos, sin, fb = _bases(n_fft, sr, n_mels, fmin, fmax)
    pad_mels = fb.shape[1]

    # center pad + trailing pad so every tile has its chunk pairs available
    x = jnp.pad(wav, ((0, 0), (hop, hop + (Tpad - T) * hop)))
    n_chunks = x.shape[1] // hop
    x = x.reshape(B, n_chunks, hop)
    a = x[:, :Tpad]  # chunk i   (first half of frame i)
    b = x[:, 1 : Tpad + 1]  # chunk i+1 (second half)

    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    grid = (B, Tpad // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, hop=hop, n_fft=n_fft, prec=prec),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, pad_mels), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, hop), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hop), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, cos.shape[1]), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, sin.shape[1]), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb.shape[0], pad_mels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, pad_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb))
    return out[:, :T, :n_mels]


def mel_frontend_pallas(
    wav: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 8000.0,
    n_fft: int = 1024,
    hop: int = 512,
    top_db: float = 80.0,
    normalize: bool = True,
    interpret: bool = False,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for audio.dsp.mel_frontend using the fused kernel."""
    B, N = wav.shape
    if jnp.issubdtype(wav.dtype, jnp.integer):
        wav = wav.astype(jnp.float32) / 32768.0
    logm10 = fused_logmel(
        wav, sr, n_mels, fmin, fmax, n_fft, hop, interpret=interpret,
        precision=precision,
    )
    T = logm10.shape[1]
    n_frames = (lengths // hop + 1).astype(jnp.int32)
    valid = jnp.arange(T)[None, :] < n_frames[:, None]
    vmask = valid[:, :, None]
    logm = 10.0 * logm10
    ref_db = jnp.max(jnp.where(vmask, logm, -jnp.inf), axis=(1, 2), keepdims=True)
    db = jnp.maximum(logm - ref_db, -top_db)
    if normalize:
        lo = jnp.min(jnp.where(vmask, db, jnp.inf), axis=(1, 2), keepdims=True)
        hi = jnp.max(jnp.where(vmask, db, -jnp.inf), axis=(1, 2), keepdims=True)
        scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-12), 1.0)
        db = (db - lo) * scale
    return jnp.where(vmask, db, 0.0).astype(jnp.float32), n_frames
