"""Baseline encoder families: CLAP (Cnn14 / HTSAT towers), HeAR mel-PCEN +
ViT-L, VGGish frontend + net (all random-init; weights convert offline)."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio.hear_frontend import (
    hear_preprocess,
    pcen,
    resize_bilinear_tf,
    tf_mel_matrix,
)
from heart_murmur_detection_tpu.models import vggish
from heart_murmur_detection_tpu.models.clap import (
    CLAPAudioEncoder,
    CLAPConfig,
    load_clap_clip,
)


class TestCLAP:
    def test_cnn14_tower(self):
        import jax, jax.numpy as jnp

        cfg = CLAPConfig(version="2022")
        model = CLAPAudioEncoder(cfg)
        n = 5 * 44100 // 320 * 320
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, n)), jnp.float32)
        lens = jnp.full((2,), n, jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x, lens)
        out = model.apply(v, x, lens)
        assert out.shape == (2, 1024)
        assert np.isfinite(np.asarray(out)).all()

    def test_clip_loading_policies(self, tmp_path):
        from heart_murmur_detection_tpu.utils.audio_io import write_wav

        r = np.random.default_rng(0)
        short = r.standard_normal(44100).astype(np.float32) * 0.1
        p = str(tmp_path / "s.wav")
        write_wav(p, short, 44100)
        y = load_clap_clip(p, 5.0)
        assert len(y) == 5 * 44100
        # tiled: second copy equals first (up to 16-bit quantization)
        np.testing.assert_allclose(y[:44100], y[44100:88200], atol=1e-4)


class TestHeARFrontend:
    def test_mel_matrix_shape_and_dc(self):
        m = tf_mel_matrix()
        assert m.shape == (201, 128)
        assert (m[0] == 0).all()
        assert (m >= 0).all()

    def test_pcen_constant_signal(self):
        import jax.numpy as jnp

        E = jnp.ones((1, 50, 4)) * 3.0
        out = np.asarray(pcen(E))
        # constant input -> EMA == input -> output constant over time
        assert np.allclose(out[0, 1:], out[0, 1], atol=1e-5)

    def test_pcen_matmul_matches_scan(self):
        import jax.numpy as jnp

        r = np.random.default_rng(2)
        E = jnp.asarray(np.abs(r.standard_normal((3, 200, 128))), jnp.float32)
        a = np.asarray(pcen(E, impl="matmul"))
        b = np.asarray(pcen(E, impl="scan"))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    def test_resize_matmul_matches_gather(self):
        import jax.numpy as jnp

        r = np.random.default_rng(3)
        x = jnp.asarray(r.standard_normal((2, 200, 128)), jnp.float32)
        a = np.asarray(resize_bilinear_tf(x, 192, 128, impl="matmul"))
        b = np.asarray(resize_bilinear_tf(x, 192, 128, impl="gather"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        # non-identity W axis too
        a = np.asarray(resize_bilinear_tf(x, 96, 64, impl="matmul"))
        b = np.asarray(resize_bilinear_tf(x, 96, 64, impl="gather"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_resize_matches_torch_bilinear(self):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        r = np.random.default_rng(0)
        x = r.standard_normal((1, 200, 128)).astype(np.float32)
        want = (
            torch.nn.functional.interpolate(
                torch.tensor(x)[:, None], (192, 128), mode="bilinear",
                align_corners=False,
            )[0, 0]
            .numpy()
        )
        got = np.asarray(resize_bilinear_tf(jnp.asarray(x), 192, 128))[0]
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_preprocess_shape(self):
        import jax.numpy as jnp

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 32000)), jnp.float32
        )
        out = np.asarray(hear_preprocess(x))
        assert out.shape == (2, 192, 128)
        assert np.isfinite(out).all()


class TestVGGish:
    def test_examples_framing(self):
        y = np.random.default_rng(0).standard_normal(int(3.2 * 16000)).astype(np.float32)
        ex = vggish.waveform_to_examples(y)
        # 3.2s -> 317 frames -> 3 examples of 96
        assert ex.shape == (3, 96, 64)

    def test_net_shapes(self):
        import jax, jax.numpy as jnp

        model = vggish.VGGish()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 96, 64)))
        out = model.apply(v, jnp.zeros((2, 96, 64)))
        assert out.shape == (2, 128)
        n = sum(p.size for p in jax.tree.leaves(v["params"]))
        assert 60e6 < n < 75e6  # VGGish ~72M params

    def test_extract_mean_pools(self, tmp_path):
        from heart_murmur_detection_tpu.utils.audio_io import write_wav

        p = str(tmp_path / "v.wav")
        write_wav(p, np.random.default_rng(2).standard_normal(32000).astype(np.float32) * 0.1, 16000)
        f = vggish.extract_vgg_feature([p, p], random_init=True, batch_size=4)
        assert f.shape == (2, 128)
        np.testing.assert_allclose(f[0], f[1], atol=1e-6)
