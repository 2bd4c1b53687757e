"""Golden extraction regression: the full public path (disk WAV -> decode ->
trim/pad policy -> wire packing -> mel/graph -> features) pinned for a fixed
synthetic clip and the seed-0 random-init weights. Complements
tests/test_golden_lp.py (which pins the LP harness on cached features) by
covering the extraction half of the pipeline — any drift in DSP semantics,
pad policy, wire codecs, or model wiring moves these numbers."""

import os
import wave

import numpy as np
import pytest

from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

GOLDEN = {
    # (norm, first-6 values), generated on CPU (f32, exact XLA path)
    "operaCT": (27.71071, [-0.187388, 0.173108, -0.373847, -0.611109, 0.440288, 0.75361]),
    "operaGT": (19.59592, [0.364981, -1.769157, -0.839237, -1.102999, -0.267577, -0.31939]),
}


@pytest.fixture(scope="module")
def golden_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    t = np.arange(int(7.3 * 16000)) / 16000
    r = np.random.default_rng(11)
    x = (
        0.3 * np.sin(2 * np.pi * 97 * t)
        + 0.1 * np.sin(2 * np.pi * 211 * t + 1.0)
        + 0.02 * r.standard_normal(len(t))
    )
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    p = os.path.join(str(d), "g.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return p


@pytest.mark.parametrize(
    "pretrain,dim,sec", [("operaCT", 768, 8), ("operaGT", 384, 8.18)]
)
def test_golden_extraction(golden_wav, pretrain, dim, sec):
    fe = FeatureExtractor(
        pretrain, dim=dim, input_sec=sec, batch_size=2, random_init=True
    )
    f = fe.extract_files([golden_wav])[0]
    norm, head = GOLDEN[pretrain]
    assert abs(float(np.linalg.norm(f)) - norm) < 2e-3, np.linalg.norm(f)
    np.testing.assert_allclose(f[:6], head, atol=2e-4)
