"""Fused pallas log-mel kernel vs the XLA mel frontend (interpret mode on CPU)."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio import dsp
from heart_murmur_detection_tpu.ops.pallas_mel import mel_frontend_pallas


class TestPallasMel:
    def test_matches_xla_frontend(self):
        import jax.numpy as jnp

        r = np.random.default_rng(0)
        lens = [5 * 16000, 3 * 16000 + 512]
        clips = [r.standard_normal(n).astype(np.float32) for n in lens]
        wav, lengths = dsp.pad_batch(clips)
        want, nf_w = dsp.mel_frontend(jnp.asarray(wav), jnp.asarray(lengths))
        got, nf_g = mel_frontend_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(nf_w), np.asarray(nf_g))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)

    def test_masking(self):
        import jax.numpy as jnp

        r = np.random.default_rng(1)
        clips = [r.standard_normal(2 * 16000).astype(np.float32)]
        wav, lengths = dsp.pad_batch(clips, max_len=8 * 16000)
        got, nf = mel_frontend_pallas(
            jnp.asarray(wav), jnp.asarray(lengths), interpret=True
        )
        g = np.asarray(got)
        assert np.abs(g[0, nf[0] :]).max() == 0.0
        assert 0.0 <= g.min() and g.max() <= 1.0
