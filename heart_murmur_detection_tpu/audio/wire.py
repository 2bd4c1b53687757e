"""Host<->device wire formats for streaming waveform transfer.

Streaming extraction is bound by the host->device link, not the chip
(RESULTS.md: ~47 MB/s over the axon relay vs ~55 ms/batch compute). The
reference never faces this — its per-clip loop is CPU-bound long before the
link matters (src/benchmark/model_util.py:138-176). Wire formats trade bytes
for a little on-device decode compute:

  f32    4 B/sample  lossless
  int16  2 B/sample  exact for 16-bit-sourced PCM (the usual case)
  mulaw  1 B/sample  8-bit mu-law companding (G.711-style, mu=255); ~38 dB
                     SNR — feature drift is pinned by tests/test_wire.py

Combine with shipping at the *source* sample rate + on-device resampling
(ops/resample.py) for another 4-8x on 4 kHz / 2 kHz heart-sound corpora.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MU = 255.0


def encode_np(x: np.ndarray, wire: str) -> np.ndarray:
    """Pack a float waveform (values in [-1, 1]) for transfer."""
    if wire == "f32":
        return x.astype(np.float32, copy=False)
    if wire == "int16":
        if x.dtype == np.int16:
            return x
        return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    if wire == "mulaw":
        if x.dtype == np.int16:
            x = x.astype(np.float32) / 32768.0
        x = np.clip(x, -1.0, 1.0)
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        return ((y + 1.0) / 2.0 * _MU + 0.5).astype(np.uint8)
    raise ValueError(f"unknown wire format {wire!r}")


def wire_dtype(wire: str):
    return {"f32": np.float32, "int16": np.int16, "mulaw": np.uint8}[wire]


def decode_device(w: jnp.ndarray, wire: str) -> jnp.ndarray:
    """Unpack a wire-format batch to float32 on device (jit-traceable)."""
    if wire == "f32":
        return w.astype(jnp.float32)
    if wire == "int16":
        return w.astype(jnp.float32) / 32768.0
    if wire == "mulaw":
        x = w.astype(jnp.float32) / _MU * 2.0 - 1.0
        return jnp.sign(x) / _MU * (jnp.power(1.0 + _MU, jnp.abs(x)) - 1.0)
    raise ValueError(f"unknown wire format {wire!r}")
