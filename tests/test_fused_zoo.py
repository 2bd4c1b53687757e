"""Parity: fused Pallas forwards for the remaining zoo encoders — HeAR
(ViT-L, models.vit_fused.hear_forward_fused) and the CLAP-2023 HTS-AT tower
(models.clap.clap_audio_forward_fused) — vs their flax forwards, interpret
mode on CPU (same harness pattern as tests/test_pallas_swin.py::TestFusedHTSAT).
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.hear import HeARConfig, HeAREncoder
from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

r = np.random.default_rng(0)


class TestHeARFused:
    def _tiny(self):
        cfg = HeARConfig(
            image_size=(32, 32), patch_size=16, hidden=64, depth=2, heads=2,
            mlp_ratio=4.0, pooled_dim=8,
        )
        model = HeAREncoder(cfg)
        spec = jnp.asarray(r.standard_normal((2, 32, 32)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), spec, False, True)
        return cfg, model, spec, v

    def test_matches_flax_from_spectrogram(self):
        cfg, model, spec, v = self._tiny()
        want = np.asarray(
            model.apply(v, spec, from_spectrogram=True)["pooled"]
        )
        got = np.asarray(
            hear_forward_fused(
                v, spec, cfg, mm_dtype=jnp.float32, interpret=True,
                from_spectrogram=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_bf16_cosine(self):
        cfg, model, spec, v = self._tiny()
        want = np.asarray(
            model.apply(v, spec, from_spectrogram=True)["pooled"]
        )
        got = np.asarray(
            hear_forward_fused(
                v, spec, cfg, mm_dtype=jnp.bfloat16, interpret=True,
                from_spectrogram=True,
            )
        )
        cos = float(
            (got * want).sum()
            / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12)
        )
        assert cos > 0.999, cos

    def test_waveform_frontend_path(self):
        """Full-size frontend (192x128 mel-PCEN) feeding the tiny-block
        geometry is covered by the real config's patch grid; here just pin
        that the waveform path of the fused fn equals the flax forward with
        the real frontend and a tiny depth."""
        cfg = HeARConfig(depth=1, heads=2, hidden=64, pooled_dim=8)
        model = HeAREncoder(cfg)
        wav = jnp.asarray(r.standard_normal((1, 32000)) * 0.1, jnp.float32)
        v = model.init(jax.random.PRNGKey(1), wav)
        want = np.asarray(model.apply(v, wav)["pooled"])
        got = np.asarray(
            hear_forward_fused(v, wav, cfg, mm_dtype=jnp.float32, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TestCLAPFused:
    def test_2023_tower_matches_flax(self):
        import heart_murmur_detection_tpu.models.htsat_fused as hf
        from heart_murmur_detection_tpu.models.clap import (
            CLAPAudioEncoder,
            CLAPConfig,
            clap_audio_forward_fused,
        )

        cfg = CLAPConfig(version="2023")
        model = CLAPAudioEncoder(cfg)
        n = 44160  # 1 s rounded up to a hop multiple
        wav = jnp.asarray(r.standard_normal((1, n)) * 0.05, jnp.float32)
        lengths = jnp.full((1,), n, jnp.int32)
        with jax.default_device(jax.devices("cpu")[0]):
            v = model.init(jax.random.PRNGKey(0), wav, lengths)
        want = np.asarray(model.apply(v, wav, lengths))

        orig, orig_pair = hf.fused_swin_block, hf.fused_swin_pair

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        def interp_pair(*a, **k):
            k["interpret"] = True
            return orig_pair(*a, **k)

        with mock.patch.object(hf, "fused_swin_block", interp), \
                mock.patch.object(hf, "fused_swin_pair", interp_pair):
            got = np.asarray(
                clap_audio_forward_fused(
                    v, wav, lengths, cfg, mm_dtype=jnp.float32
                )
            )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
