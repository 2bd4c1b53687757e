"""HTS-AT sliding-window long-audio inference (htsat.py:939-979 parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.htsat import HTSAT, htsat_forward_long
from tests.test_pretrain import TINY_HTSAT


class TestLongAudio:
    def test_average_over_crops(self):
        model = HTSAT(TINY_HTSAT)
        target_T = TINY_HTSAT.spec_size * TINY_HTSAT.freq_ratio  # 256
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 16)))
        r = np.random.default_rng(0)
        mel = jnp.asarray(r.random((1, 2 * target_T, 16)), jnp.float32)
        out = htsat_forward_long(
            model, v, mel, crop_size=target_T, overlap=target_T // 2
        )
        assert out["latent_output"].shape == (1, TINY_HTSAT.num_features)
        # equals the mean over manual crops
        starts = np.arange(0, mel.shape[1] - target_T - 1, target_T // 2)
        manual = np.mean(
            [
                np.asarray(
                    model.apply(v, mel[:, s : s + target_T])["latent_output"]
                )
                for s in starts
            ],
            axis=0,
        )
        np.testing.assert_allclose(
            np.asarray(out["latent_output"]), manual, atol=1e-5
        )

    def test_short_clip_falls_through(self):
        model = HTSAT(TINY_HTSAT)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 16)))
        mel = jnp.ones((1, 100, 16))
        out = htsat_forward_long(model, v, mel, crop_size=256, overlap=128)
        assert out["latent_output"].shape == (1, TINY_HTSAT.num_features)
