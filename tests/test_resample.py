"""Device polyphase resampler parity vs scipy.signal.resample_poly (the host
path's own resampler, utils/audio_io.py:95)."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from heart_murmur_detection_tpu.ops.resample import (
    resample_poly_device,
    resampled_length,
    resampled_lengths,
)


@pytest.mark.parametrize(
    "up,down",
    [(4, 1), (8, 1), (2, 1), (1, 2), (3, 2), (160, 441)],
)
def test_matches_scipy(rng, up, down):
    B, T = 3, 1000
    x = rng.standard_normal((B, T)).astype(np.float32)
    got = np.asarray(resample_poly_device(x, up, down))
    want = np.stack([resample_poly(r, up, down) for r in x]).astype(np.float32)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=3e-5), np.abs(got - want).max()


def test_zero_padding_stays_zero(rng):
    x = np.zeros((2, 512), np.float32)
    x[0, :200] = rng.standard_normal(200)
    y = np.asarray(resample_poly_device(x, 4, 1))
    assert np.allclose(y[1], 0.0)
    # the FIR smears the boundary by half_len/up samples at most
    assert np.allclose(y[0, 200 * 4 + 50 :], 0.0, atol=1e-7)


def test_resampled_length_matches_scipy(rng):
    for n in (1, 7, 400, 999, 16000):
        for up, down in ((4, 1), (3, 2), (160, 441)):
            want = len(resample_poly(np.zeros(n), up, down))
            assert resampled_length(n, up, down) == want
    lens = np.array([1, 7, 400, 999], np.int32)
    got = np.asarray(resampled_lengths(lens, 3, 2))
    want = [resampled_length(int(n), 3, 2) for n in lens]
    assert got.tolist() == want


def test_identity():
    x = np.arange(12, dtype=np.float32)[None]
    assert np.array_equal(np.asarray(resample_poly_device(x, 1, 1)), x)
    assert np.array_equal(np.asarray(resample_poly_device(x, 3, 3)), x)
