"""C++ native host runtime vs the python oracle (skipped when not built)."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio import pad, reference_np as ref
from heart_murmur_detection_tpu.utils import native
from heart_murmur_detection_tpu.utils.audio_io import load_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib not built (native/build.sh)"
)


@pytest.fixture()
def wav(tmp_path):
    r = np.random.default_rng(0)
    y = np.concatenate(
        [
            np.zeros(8000, np.float32),
            (0.4 * np.sin(2 * np.pi * 80 * np.arange(48000) / 16000)).astype(np.float32)
            + 0.01 * r.standard_normal(48000).astype(np.float32),
            np.zeros(8000, np.float32),
        ]
    )
    p = str(tmp_path / "a.wav")
    write_wav(p, y, 16000)
    return p


class TestNative:
    def test_decode_matches_python(self, wav):
        x, sr = native.decode_wav(wav)
        xp, srp = load_wav(wav, sr=None)
        assert sr == srp == 16000
        np.testing.assert_allclose(x, xp, atol=2e-5)

    def test_trim_matches_oracle(self, wav):
        x, _ = load_wav(wav, sr=None)
        s, e = native.trim_bounds(x, 1600, 800)
        _, (sp, ep) = ref.trim_heart(x, 16000)
        assert (s, e) == (sp, ep)

    def test_load_clip_policies(self, wav):
        x, _ = load_wav(wav, sr=None)
        yt, _ = ref.trim_heart(x, 16000)
        for pad_zero, types in [(True, "zero"), (False, "repeat")]:
            buf, n = native.load_clip(wav, 32 * 16000, 8 * 16000, pad_zero)
            if len(yt) < 8 * 16000:
                want = pad.split_pad_sample(yt, 8, 16000, types)[0]
            else:
                want = yt
            np.testing.assert_allclose(buf[: min(n, len(want))], want[:n], atol=1e-6)

    def test_prefetch_loader_order(self, wav):
        pl = native.PrefetchLoader([wav] * 5, batch_size=2, max_len=32 * 16000, min_len=8 * 16000)
        offsets = []
        for lo, k, wavb, lens in pl:
            offsets.append((lo, k))
            assert wavb.shape == (2, 32 * 16000)
            assert (lens[:k] > 0).all()
        assert offsets == [(0, 2), (2, 2), (4, 1)]
