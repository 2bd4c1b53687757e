"""On-device polyphase resampling (scipy.signal.resample_poly parity).

The reference decodes+resamples every clip on the host CPU (librosa.load in
src/util.py:222-224); this repo's host path mirrors that with scipy's
resample_poly (utils/audio_io.py:95). For *streaming* extraction the
host->device link is the bottleneck (~47 MB/s over the axon relay,
RESULTS.md), so shipping audio at its source sample rate (CirCor 4 kHz,
PhysioNet-2016 2 kHz) and upsampling on device cuts wire bytes 4-8x
losslessly. Upsampling is a zero-stuffed FIR — exactly one
`lax.conv_general_dilated` with `lhs_dilation=up`, which XLA maps onto the
MXU and fuses with the mel frontend's framing.

Filter taps replicate scipy's construction (firwin Kaiser window, cutoff
1/max_rate, half length 10*max_rate, gain up) so device output matches the
host resampler to float32 round-off; parity is pinned in
tests/test_resample.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _poly_filter(up: int, down: int, beta: float = 5.0) -> Tuple[np.ndarray, int]:
    """scipy.signal.resample_poly's FIR: (taps float32, half_len)."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", beta)) * up
    return h.astype(np.float32), half_len


def resampled_length(n: int, up: int, down: int = 1) -> int:
    """Output length of resample_poly for an n-sample input (ceil(n*up/down))."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return (n * up + down - 1) // down


def resampled_lengths(lengths: jnp.ndarray, up: int, down: int = 1) -> jnp.ndarray:
    """Vectorized resampled_length for a (B,) int array (jit-safe)."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return ((lengths * up + down - 1) // down).astype(lengths.dtype)


def resample_poly_device(
    x: jnp.ndarray, up: int, down: int = 1, beta: float = 5.0
) -> jnp.ndarray:
    """Batched resample_poly on device: (B, T) float -> (B, ceil(T*up/down)).

    Matches scipy.signal.resample_poly(x, up, down, padtype='constant')
    sample-for-sample (float32 round-off). Rows are resampled over their full
    padded length; zero padding stays zero (the FIR is linear), so per-row
    valid lengths just scale by up/down (resampled_lengths).
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    B, T = x.shape
    h, half_len = _poly_filter(up, down, beta)
    n_out = resampled_length(T, up, down)

    # scipy zero-pads the filter so output samples sit at the center, then
    # drops the transient head: y[j] = full_conv[(n_pre_remove + j) * down]
    n_pre_pad = down - half_len % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h2 = np.concatenate([np.zeros(n_pre_pad, np.float32), h])
    K = len(h2)

    start = n_pre_remove * down
    need = start + (n_out - 1) * down + 1  # full-conv samples we index
    dilated = (T - 1) * up + 1
    pad_l = K - 1
    pad_r = max(K - 1, need - dilated - pad_l)

    full = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        jnp.asarray(h2[::-1].copy())[None, None, :],
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=HIGH,
    )[:, 0, :]
    y = jax.lax.slice_in_dim(full, start, start + (n_out - 1) * down + 1, down, axis=1)
    return y
