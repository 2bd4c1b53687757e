"""DSP parity: batched JAX pipeline vs the numpy librosa/kaldi oracle, and
oracle self-consistency checks (shapes, invariants, known values)."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio import dsp, pad, reference_np as ref
from heart_murmur_detection_tpu.utils.audio_io import load_wav, write_wav


def synth(n, sr=16000, seed=0):
    r = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 60 * t)
        + 0.2 * np.sin(2 * np.pi * 220 * t)
        + 0.05 * r.standard_normal(n)
    )
    return x.astype(np.float32)


class TestMelOracle:
    def test_mel_filterbank_properties(self):
        fb = ref.mel_filterbank_slaney(16000, 1024, 64, 50, 8000)
        assert fb.shape == (64, 513)
        assert (fb >= 0).all()
        # slaney norm: each filter integrates to ~2/(band width); rows nonzero
        assert (fb.sum(axis=1) > 0).all()

    def test_stft_parseval_dc(self):
        # constant signal -> energy in DC bin only (away from edges)
        y = np.ones(16000, dtype=np.float32)
        S = ref.stft_power(y, 1024, 512)
        mid = S[:, 5]
        assert mid[0] > 1e3
        assert mid[5:].max() < 1e-6 * mid[0]

    def test_preprocess_range_shape(self):
        y = synth(8 * 16000)
        m = ref.pre_process_audio_mel_t(y, f_max=8000)
        assert m.shape == (8 * 16000 // 512 + 1, 64)
        assert 0.0 <= m.min() and m.max() <= 1.0
        assert m.max() == pytest.approx(1.0)
        assert m.min() == pytest.approx(0.0)


class TestMelJaxParity:
    def test_batched_matches_oracle_per_clip(self):
        lens = [8 * 16000, 5 * 16000 + 123, 2 * 16000]
        clips = [synth(n, seed=i) for i, n in enumerate(lens)]
        batch, lengths = dsp.pad_batch(clips)
        mel, n_frames = dsp.mel_frontend(batch, lengths)
        mel = np.asarray(mel)
        for i, c in enumerate(clips):
            want = ref.pre_process_audio_mel_t(c, f_max=8000)
            got = mel[i, : n_frames[i]]
            assert n_frames[i] == want.shape[0]
            np.testing.assert_allclose(got, want, atol=2e-4)
            # masked region zeroed
            tail = mel[i, n_frames[i] :]
            assert tail.size == 0 or np.abs(tail).max() == 0.0

    def test_fft_and_matmul_paths_agree(self):
        clips = [synth(4 * 16000)]
        batch, lengths = dsp.pad_batch(clips)
        a, _ = dsp.mel_frontend(batch, lengths, use_fft=False)
        b, _ = dsp.mel_frontend(batch, lengths, use_fft=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestKaldiFbank:
    def test_jax_matches_oracle(self):
        lens = [16000 * 2, 16000 + 777]
        clips = [synth(n, seed=i + 5) for i, n in enumerate(lens)]
        clips = [c - c.mean() for c in clips]
        batch, lengths = dsp.pad_batch(clips, pad_to_multiple=160)
        fb, n_frames = dsp.kaldi_fbank_frontend(
            batch, lengths, subtract_mean_wav=False
        )
        fb = np.asarray(fb)
        for i, c in enumerate(clips):
            want = ref.kaldi_fbank(c)
            assert n_frames[i] == want.shape[0]
            np.testing.assert_allclose(fb[i, : n_frames[i]], want, atol=2e-3)

    def test_frame_count_formula(self):
        out = ref.kaldi_fbank(synth(16000))
        assert out.shape == (1 + (16000 - 400) // 160, 128)


class TestTrim:
    def test_trim_silence(self):
        sr = 16000
        y = np.concatenate(
            [np.zeros(sr, np.float32), synth(2 * sr), np.zeros(sr, np.float32)]
        )
        yt, (s, e) = ref.trim_heart(y, sr)
        # cut points land on hop boundaries near the true edges
        assert abs(s - sr) <= 1600
        assert abs(e - 3 * sr) <= 1600
        assert len(yt) == e - s

    def test_all_silent(self):
        yt, (s, e) = ref.trim_heart(np.zeros(16000, np.float32) + 1.0, 16000)
        assert e > s  # constant signal is "loud" everywhere relative to max


class TestPad:
    def test_repeat_split_windows(self):
        sr = 16000
        y = synth(20 * sr)
        chunks = pad.split_pad_sample(y, 8, sr)
        # 50% hop: windows at 0,4,8,12 sec (start+8 <= 20) -> 4 full + 1 padded
        assert len(chunks) == 5
        for c in chunks:
            assert len(c) == 8 * sr
        np.testing.assert_array_equal(chunks[0], y[: 8 * sr])
        np.testing.assert_array_equal(chunks[1], y[4 * sr : 12 * sr])
        # last chunk: source at end, front filled from repeated clip tail
        last = y[4 * 4 * sr :]
        np.testing.assert_array_equal(chunks[-1][-len(last) :], last)

    def test_pad_short(self):
        sr = 16000
        y = synth(3 * sr)
        chunks = pad.split_pad_sample(y, 8, sr)
        assert len(chunks) == 1 and len(chunks[0]) == 8 * sr
        np.testing.assert_array_equal(chunks[0][-3 * sr :], y)

    def test_zero_policy(self):
        sr = 16000
        y = synth(10 * sr)
        chunks = pad.split_pad_sample(y, 8, sr, types="zero")
        assert len(chunks) == 2
        assert all(len(c) == 8 * sr for c in chunks)


class TestBicubic:
    def test_identity_when_same_length(self):
        x = np.random.default_rng(0).standard_normal((2, 64, 8)).astype(np.float32)
        out = dsp.resize_bicubic_time(x, np.array([64, 64], np.int32), 64)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)

    def test_matches_torch_bicubic(self):
        torch = pytest.importorskip("torch")
        r = np.random.default_rng(1)
        src = 251
        x = r.standard_normal((1, src, 4)).astype(np.float32)
        want = (
            torch.nn.functional.interpolate(
                torch.tensor(x)[:, None], (1024, 4), mode="bicubic", align_corners=True
            )[0, 0]
            .numpy()
        )
        xp = np.zeros((1, 512 * ((src + 511) // 512), 4), np.float32)
        xp[:, :src] = x
        got = np.asarray(
            dsp.resize_bicubic_time(xp, np.array([src], np.int32), 1024)
        )[0]
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        y = synth(16000)
        p = str(tmp_path / "a.wav")
        write_wav(p, y, 16000)
        x, sr = load_wav(p, sr=None)
        assert sr == 16000
        np.testing.assert_allclose(x, y, atol=2 / 32768)

    def test_resample(self, tmp_path):
        sr0 = 44100
        t = np.arange(sr0) / sr0
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        p = str(tmp_path / "b.wav")
        write_wav(p, y, sr0)
        x, sr = load_wav(p, sr=16000)
        assert sr == 16000
        assert abs(len(x) - 16000) <= 2
        # spectral peak preserved at 440 Hz
        f = np.fft.rfftfreq(len(x), 1 / 16000)
        peak = f[np.abs(np.fft.rfft(x)).argmax()]
        assert abs(peak - 440) < 5
