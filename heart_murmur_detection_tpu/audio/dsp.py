"""Batched JAX DSP pipeline (the TPU fast path).

Replaces the reference's librosa/torchaudio per-clip CPU loop
(src/util.py:481-501, src/benchmark/model_util.py:138-176) with one jittable
graph over a padded batch:

    wav (B, Nmax) zero-padded + lengths (B,)  ->  mel (B, Tmax, n_mels) + frames (B,)

Design notes (TPU-first):
- hop == n_fft/2, so framing is a reshape + slice (zero-copy), no gather.
- The DFT is expressed as two real matmuls with precomputed (windowed) cosine /
  sine bases -> runs on the MXU and fuses with the mel projection; an FFT path
  exists for cross-checking. Matmuls use Precision.HIGHEST so fp32 parity with
  the numpy oracle holds to ~1e-5.
- power_to_db(ref=max) and per-clip min-max are masked reductions over valid
  frames only, so a whole batch matches per-clip librosa output exactly.

Numerical parity oracle: audio.reference_np (tested in tests/test_dsp.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import math

from . import reference_np as ref

HIGH = jax.lax.Precision.HIGHEST


def frame_signal(x: jnp.ndarray, win: int, hop: int, Tmax: int) -> jnp.ndarray:
    """(B, P) -> (B, Tmax, win) overlapping frames, frame t = x[t*hop : t*hop+win].

    Conv-free framing: conv_general_dilated_patches lowers to an implicit
    identity conv of cost ~B*T*win^2 FLOPs (63 GFLOP/batch at the CLAP
    44.1 kHz geometry — it was ~half the whole extraction graph, RESULTS.md
    r4). Here the signal is reshaped into gcd(win, hop)-sample blocks and
    each frame is win//g consecutive blocks starting at a static stride —
    win//g strided slices + one concat, pure data movement. Zero-pads x when
    hop*(Tmax-1)+win exceeds its length (frames past the end read zeros);
    samples past frame Tmax-1 are deliberately dropped (callers never read
    frames beyond Tmax)."""
    B, P = x.shape
    g = math.gcd(win, hop)
    step, width = hop // g, win // g
    need = hop * (Tmax - 1) + win
    if P < need:
        x = jnp.pad(x, ((0, 0), (0, need - P)))
    else:
        x = x[:, :need]
    blocks = x.reshape(B, need // g, g)
    parts = [
        jax.lax.slice_in_dim(blocks, k, k + step * (Tmax - 1) + 1, step, axis=1)
        for k in range(width)
    ]
    return jnp.concatenate(parts, axis=2) if width > 1 else parts[0]


# ---------------------------------------------------------------------------
# precomputed constant bases (host numpy, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: frames @ cos -> Re, frames @ (-sin) -> Im."""
    k = np.arange(1 + n_fft // 2)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    if window == "hann_periodic":
        w = ref.hann_periodic(n_fft)
    elif window == "hanning_symmetric":
        w = ref.hanning_symmetric(n_fft)
    elif window == "none":
        w = np.ones(n_fft)
    else:
        raise ValueError(window)
    cos = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos, sin


@functools.lru_cache(maxsize=None)
def _mel_fb(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    return ref.mel_filterbank_slaney(sr, n_fft, n_mels, fmin, fmax).T.copy()  # (bins, mels)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def frame_half_hop(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Frames with hop = n_fft//2 via reshape (B, N) -> (B, T, n_fft).

    Requires N to be a multiple of n_fft//2. T = N//hop - 1.
    """
    B, N = x.shape
    hop = n_fft // 2
    segs = x.reshape(B, N // hop, hop)
    return jnp.concatenate([segs[:, :-1], segs[:, 1:]], axis=-1)


# ---------------------------------------------------------------------------
# mel frontend (librosa parity)
# ---------------------------------------------------------------------------


def mel_frontend(
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
    use_fft: bool = False,
    compute_dtype=jnp.float32,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pre_process_audio_mel_t (src/util.py:481-501).

    Args:
      wav: (B, Nmax) float32, each row zero-padded beyond its length.
      lengths: (B,) int32 valid sample counts.
      precision: DFT/mel matmul precision. None = Precision.HIGHEST (six
        bf16 MXU passes — strict f32 librosa parity, the default).
        Precision.HIGH (bf16x3) halves the passes at ~1e-7 relative error —
        what the bf16 extraction path uses (extract.py).
    Returns:
      mel: (B, Tmax, n_mels) min-max normalised (invalid frames zeroed),
      n_frames: (B,) int32 valid frame counts (= lengths//hop + 1).
    """
    prec = HIGH if precision is None else precision
    assert hop * 2 == n_fft, "mel_frontend assumes 50% hop (reference uses 1024/512)"
    if jnp.issubdtype(wav.dtype, jnp.integer):
        # int16 PCM transfer path: host ships native sample width (halves
        # host->device traffic), conversion to [-1,1) float happens on device
        wav = wav.astype(jnp.float32) / 32768.0
    B, Nmax = wav.shape
    pad = n_fft // 2
    # center padding; trailing zeros already present in the batch buffer.
    x = jnp.pad(wav, ((0, 0), (pad, pad)))
    Tmax = Nmax // hop + 1

    if use_fft:
        frames = frame_half_hop(x, n_fft)[:, :Tmax]
        w = jnp.asarray(ref.hann_periodic(n_fft), dtype=jnp.float32)
        spec = jnp.fft.rfft(frames * w, axis=-1)
        power = jnp.abs(spec).astype(jnp.float32) ** 2
    else:
        # split-DFT framing: frame t = [seg_t, seg_{t+1}] with hop-sized
        # segments, so frames @ cos = segs @ cos_top (shifted-add) segs @
        # cos_bot — same FLOPs, but the (B, T, n_fft) double-width frame
        # tensor (~84 MB at B=64/10 s) is never materialized; the matmuls
        # read the (B, S, hop) reshape directly and the shifted add runs on
        # the small (B, T, bins) outputs.
        cos, sin = _dft_bases(n_fft, "hann_periodic")
        segs = x.reshape(B, -1, hop).astype(compute_dtype)  # (B, S, hop)
        ct, cb = jnp.asarray(cos[:hop]), jnp.asarray(cos[hop:])
        st, sb = jnp.asarray(sin[:hop]), jnp.asarray(sin[hop:])
        top = jnp.matmul(segs, ct, precision=prec)  # (B, S, bins)
        bot = jnp.matmul(segs, cb, precision=prec)
        re = top[:, :Tmax] + bot[:, 1 : Tmax + 1]
        top = jnp.matmul(segs, st, precision=prec)
        bot = jnp.matmul(segs, sb, precision=prec)
        im = top[:, :Tmax] + bot[:, 1 : Tmax + 1]
        power = (re * re + im * im).astype(jnp.float32)

    fb = jnp.asarray(_mel_fb(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(power, fb, precision=prec)  # (B, Tmax, n_mels)

    n_frames = (lengths // hop + 1).astype(jnp.int32)
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]  # (B, Tmax)
    vmask = valid[:, :, None]

    logm = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    ref_db = jnp.max(jnp.where(vmask, logm, -jnp.inf), axis=(1, 2), keepdims=True)
    db = logm - ref_db
    db = jnp.maximum(db, -top_db)  # max over valid is 0, so top_db clamp = -top_db

    if normalize:
        lo = jnp.min(jnp.where(vmask, db, jnp.inf), axis=(1, 2), keepdims=True)
        hi = jnp.max(jnp.where(vmask, db, -jnp.inf), axis=(1, 2), keepdims=True)
        scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-12), 1.0)
        db = (db - lo) * scale
    out = jnp.where(vmask, db, 0.0)
    return out.astype(jnp.float32), n_frames


def logmel_frontend_general(
    wav: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 44100,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 14000.0,
    n_fft: int = 1024,
    hop: int = 320,
    pad_mode: str = "reflect",
    amin: float = 1e-10,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torchlibrosa-semantics log-mel (Spectrogram center=True reflect +
    LogmelFilterBank ref=1.0, amin=1e-10, top_db=None — htsat.py:582-602,
    msclap models/audio.py). Arbitrary hop via conv patches. Returns
    (B, Tmax, n_mels) log10-scaled by 10, invalid frames zeroed, + counts.

    precision: DFT/mel matmul precision. None = HIGHEST (strict parity,
    six bf16 MXU passes); the bf16 fused CLAP path passes Precision.HIGH
    (bf16x3, ~1e-7 relative — the mel_frontend policy). At 44.1 kHz this
    frontend is ~60% of the CLAP-2023 extraction graph (RESULTS.md r4)."""
    prec = HIGH if precision is None else precision
    B, Nmax = wav.shape
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode=pad_mode)
    Tmax = Nmax // hop + 1
    frames = frame_signal(x, n_fft, hop, Tmax).astype(jnp.float32)
    cos, sin = _dft_bases(n_fft, "hann_periodic")
    re = jnp.matmul(frames, jnp.asarray(cos), precision=prec)
    im = jnp.matmul(frames, jnp.asarray(sin), precision=prec)
    power = re * re + im * im
    fb = jnp.asarray(_mel_fb(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(power, fb, precision=prec)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    n_frames = (lengths // hop + 1).astype(jnp.int32)
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]
    return jnp.where(valid[:, :, None], logmel, 0.0), n_frames


# ---------------------------------------------------------------------------
# Kaldi fbank frontend (Audio-MAE path)
# ---------------------------------------------------------------------------


def kaldi_fbank_frontend(
    wav: jnp.ndarray,
    lengths: jnp.ndarray,
    sr: int = 16000,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    subtract_mean_wav: bool = True,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched kaldi fbank (src/util.py:841-856 semantics, dither=0).

    precision: DFT/mel matmul precision (None = HIGHEST, strict parity;
    Precision.HIGH for the bf16 extraction path — see mel_frontend).
    Returns (B, Tmax, num_mel_bins) with invalid frames zeroed, and (B,) valid
    frame counts (= 1 + (len-win)//shift, 0 if len < win).
    """
    prec = HIGH if precision is None else precision
    if jnp.issubdtype(wav.dtype, jnp.integer):
        wav = wav.astype(jnp.float32) / 32768.0
    B, Nmax = wav.shape
    win = int(sr * frame_length_ms / 1000)
    shift = int(sr * frame_shift_ms / 1000)
    padded = 1 << (win - 1).bit_length()

    if subtract_mean_wav:
        # reference subtracts the *valid-region* mean before fbank
        mean = jnp.sum(wav, axis=1, keepdims=True) / jnp.maximum(lengths[:, None], 1)
        valid_n = jnp.arange(Nmax)[None, :] < lengths[:, None]
        wav = jnp.where(valid_n, wav - mean, 0.0)

    Tmax = max(1 + (Nmax - win) // shift, 1)
    frames = frame_signal(wav, win, shift, Tmax).astype(jnp.float32)

    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]], axis=-1)
        frames = frames - preemphasis * prev
    w = jnp.asarray(ref.hanning_symmetric(win), dtype=jnp.float32)
    frames = frames * w

    fr = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))
    cos, sin = _dft_bases(padded, "none")
    re = jnp.matmul(fr, jnp.asarray(cos), precision=prec)
    im = jnp.matmul(fr, jnp.asarray(sin), precision=prec)
    power = re * re + im * im  # (B, T, padded//2+1)

    banks = jnp.asarray(
        ref.kaldi_mel_banks(num_mel_bins, padded, sr).T
    )  # (padded//2, mels)
    mel_e = jnp.matmul(power[:, :, : padded // 2], banks, precision=prec)
    mel_e = jnp.log(jnp.maximum(mel_e, jnp.finfo(jnp.float32).eps))

    n_frames = jnp.where(lengths >= win, 1 + (lengths - win) // shift, 0).astype(
        jnp.int32
    )
    valid = jnp.arange(Tmax)[None, :] < n_frames[:, None]
    return jnp.where(valid[:, :, None], mel_e, 0.0), n_frames


# ---------------------------------------------------------------------------
# bicubic time-resize with dynamic source length (HTS-AT reshape_wav2img)
# ---------------------------------------------------------------------------


def _cubic_weight(d: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic convolution kernel (torch bicubic uses A=-0.75)."""
    d = jnp.abs(d)
    w1 = (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0
    w2 = a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a
    return jnp.where(d <= 1.0, w1, jnp.where(d < 2.0, w2, 0.0))


def resize_bicubic_time(
    x: jnp.ndarray, src_len: jnp.ndarray, out_len: int, compute_dtype=None
) -> jnp.ndarray:
    """Bicubic align_corners=True resize along axis 1, per-example source length.

    x: (B, Tmax, F) with rows >= src_len undefined/zero. src_len: (B,) int32.
    Equivalent to torch F.interpolate(mode='bicubic', align_corners=True) on the
    first src_len rows (htsat.py:838-839), but batched with dynamic lengths so
    one compiled graph serves every clip length. Identity when src_len==out_len.

    TPU-first formulation: instead of a 4-tap gather (TPU gathers are slow —
    measured 1.9 ms of the B=64 extraction graph), build the banded cubic
    weight matrix W (B, out, Tmax) with pure elementwise iota arithmetic and
    contract it against x on the MXU. Border-replication of the clipped taps
    becomes two analytic edge-column corrections: the k=-1 tap folds into
    s=0 when floor(pos)==0, the k=+2 tap into s=src-1 when floor(pos)==src-2
    (all other clipped taps carry zero cubic weight).
    """
    B, Tmax, F = x.shape
    srcf = src_len.astype(jnp.float32)  # (B,)
    j = jnp.arange(out_len, dtype=jnp.float32)[None, :]  # (1, out)
    scale = (srcf - 1.0) / (out_len - 1.0)  # (B,)
    pos = j * scale[:, None]  # (B, out)
    s = jnp.arange(Tmax, dtype=jnp.float32)[None, None, :]  # (1, 1, S)
    w = _cubic_weight(pos[:, :, None] - s)  # (B, out, S), zero for |d|>=2
    w = jnp.where(s < srcf[:, None, None], w, 0.0)
    i0 = jnp.floor(pos)  # (B, out)
    corr_low = jnp.where(i0 == 0.0, _cubic_weight(pos + 1.0), 0.0)
    w = w + (s == 0.0) * corr_low[:, :, None]
    corr_high = jnp.where(
        i0 == srcf[:, None] - 2.0, _cubic_weight(pos - srcf[:, None]), 0.0
    )
    w = w + (s == srcf[:, None, None] - 1.0) * corr_high[:, :, None]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        # bf16 weight matrix + single-pass matmul for the bf16 extraction
        # path: ~4e-3 relative weight rounding, the same precision class as
        # the bf16 casts the fused encoder applies to this tensor anyway.
        return jax.lax.dot_general(
            w.astype(compute_dtype), x.astype(compute_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
    return jax.lax.dot_general(
        w, x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=HIGH,
    )


def resize_bicubic_static(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Static-shape bicubic (align_corners=True) along axis 1."""
    B = x.shape[0]
    src = jnp.full((B,), x.shape[1], dtype=jnp.int32)
    return resize_bicubic_time(x, src, out_len)


# ---------------------------------------------------------------------------
# host-side convenience pipelines (decode -> trim -> pad -> device mel)
# ---------------------------------------------------------------------------


def pad_batch(
    clips,
    pad_to_multiple: int = 512,
    max_len: Optional[int] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of 1-D clips to a common length (multiple of hop).

    dtype=np.int16 packs float clips as PCM16 for cheap host->device transfer
    (exact for 16-bit-sourced audio; mel_frontend converts on device)."""
    lengths = np.array([len(c) for c in clips], dtype=np.int32)
    n = int(lengths.max()) if max_len is None else max_len
    n = ((n + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    out = np.zeros((len(clips), n), dtype=dtype)
    for i, c in enumerate(clips):
        m = min(len(c), n)
        if dtype == np.int16 and c.dtype != np.int16:
            out[i, :m] = np.clip(np.round(c[:m] * 32768.0), -32768, 32767)
        else:
            out[i, :m] = c[:m]
        lengths[i] = m
    return out, lengths
