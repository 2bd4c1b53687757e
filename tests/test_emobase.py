"""First-party emobase-988 fallback (audio/emobase.py) — the openSMILE
capability path (reference extract_feature.py:19-27) without the pip package."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio.emobase import (
    _LLD_NAMES,
    emobase_feature_names,
    emobase_features,
    emobase_lld,
    functionals,
)


def _tone(freq, sr=16000, sec=1.0, amp=0.5):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_shape_names_deterministic():
    wav = _tone(220) + 0.01 * np.random.default_rng(0).standard_normal(16000)
    f1 = emobase_features(wav, 16000)
    f2 = emobase_features(wav, 16000)
    assert f1.shape == (988,)
    assert np.isfinite(f1).all()
    np.testing.assert_array_equal(f1, f2)
    names = emobase_feature_names()
    assert len(names) == 988 and len(set(names)) == 988
    assert names[0] == "intensity_sma_max"


def test_functionals_known_contour():
    # linear ramp: slope/offset exact, fit error zero, quartiles analytic
    c = 2.0 * np.arange(101) + 5.0
    f = functionals(c)
    names = ("max min range maxPos minPos amean linregc1 linregc2 "
             "linregerrA linregerrQ stddev skewness kurtosis "
             "q1 q2 q3 iqr12 iqr23 iqr13").split()
    v = dict(zip(names, f))
    assert v["max"] == 205.0 and v["min"] == 5.0 and v["range"] == 200.0
    assert v["maxPos"] == 1.0 and v["minPos"] == 0.0
    np.testing.assert_allclose(v["linregc1"], 2.0, atol=1e-9)
    np.testing.assert_allclose(v["linregc2"], 5.0, atol=1e-9)
    np.testing.assert_allclose(v["linregerrA"], 0.0, atol=1e-9)
    np.testing.assert_allclose(v["linregerrQ"], 0.0, atol=1e-9)
    np.testing.assert_allclose(v["amean"], 105.0)
    np.testing.assert_allclose(v["q2"], 105.0)
    np.testing.assert_allclose(v["iqr13"], v["q3"] - v["q1"])
    np.testing.assert_allclose(v["skewness"], 0.0, atol=1e-9)


def test_pitch_tracks_tone_frequency():
    lld = emobase_lld(_tone(220), 16000)
    f0 = lld[:, _LLD_NAMES.index("F0")]
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 6.0
    # voicing probability near 1 for a pure tone
    assert np.median(lld[:, _LLD_NAMES.index("voicingProb")]) > 0.9


def test_zcr_and_intensity_ordering():
    lld_lo = emobase_lld(_tone(100), 16000)
    lld_hi = emobase_lld(_tone(2000), 16000)
    zi = _LLD_NAMES.index("zcr")
    assert lld_hi[:, zi].mean() > 5 * lld_lo[:, zi].mean()
    quiet = emobase_lld(_tone(220, amp=0.05), 16000)
    loud = emobase_lld(_tone(220, amp=0.5), 16000)
    ii = _LLD_NAMES.index("intensity")
    assert loud[:, ii].mean() > 10 * quiet[:, ii].mean()


def test_lsp_in_range_sorted():
    wav = np.random.default_rng(1).standard_normal(16000).astype(np.float32)
    lld = emobase_lld(wav, 16000)
    lo = _LLD_NAMES.index("lspFreq[0]")
    lsf = lld[:, lo : lo + 8]
    assert (lsf > 0).all() and (lsf < np.pi).all()
    assert (np.diff(lsf, axis=1) >= -1e-9).all()


def test_unvoiced_noise_stays_unvoiced():
    # the unbiased ACF correction is capped at 2x: white noise must not get
    # its long-lag ACF amplified over the voicing cutoff (spurious low F0s)
    wav = 0.3 * np.random.default_rng(3).standard_normal(16000).astype(np.float32)
    lld = emobase_lld(wav, 16000)
    f0 = lld[:, _LLD_NAMES.index("F0")]
    assert (f0 > 0).mean() < 0.25


def test_extract_opensmile_features_fallback(tmp_path):
    pytest.importorskip("numpy")
    from heart_murmur_detection_tpu.models.vggish import extract_opensmile_features
    from heart_murmur_detection_tpu.utils.audio_io import write_wav

    p = str(tmp_path / "t.wav")
    write_wav(p, _tone(300, sr=8000, sec=2.0), 8000)
    out = np.asarray(extract_opensmile_features(p, native=True)).reshape(-1)
    assert out.shape == (988,)
    assert np.isfinite(out).all()
    # short clip (sub-frame) still produces a full vector
    p2 = str(tmp_path / "short.wav")
    write_wav(p2, _tone(300, sr=16000, sec=0.01), 16000)
    out2 = np.asarray(extract_opensmile_features(p2, native=True)).reshape(-1)
    assert out2.shape == (988,) and np.isfinite(out2).all()
    # both paths return a named-column DataFrame (ADVICE r2): the fallback's
    # columns are the emobase names, so name-indexing consumers work
    df = extract_opensmile_features(p, native=True)
    assert list(df.columns) == emobase_feature_names()
    assert df.shape == (1, 988)
    float(df["intensity_sma_max"].iloc[0])  # name indexing works


def test_opensmile_provenance_sidecar(tmp_path):
    from heart_murmur_detection_tpu.data.processors.common import extract_and_save
    from heart_murmur_detection_tpu.models.vggish import opensmile_impl
    from heart_murmur_detection_tpu.utils.audio_io import write_wav
    import json
    import os

    wavs = []
    for i in range(2):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, _tone(200 + 50 * i, sr=8000, sec=1.0), 8000)
        wavs.append(p)
    np.save(tmp_path / "sound_dir_loc.npy", np.array(wavs))
    out = extract_and_save(str(tmp_path), pretrain="opensmile")
    feats = np.load(out)
    assert feats.shape == (2, 988)
    prov = json.load(open(os.path.join(tmp_path, "opensmile_feature.provenance.json")))
    assert prov["impl"] == opensmile_impl()
    assert prov["impl"] in ("pip-opensmile", "native-emobase")
