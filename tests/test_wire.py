"""Wire-format packing/decoding and source-rate extraction parity.

Streaming extraction is host->device link-bound (RESULTS.md), so the
extractor can ship int16 / mu-law / source-rate waveforms and decode+resample
on device (audio/wire.py, ops/resample.py). These tests pin (a) codec
round-trip error, and (b) end-to-end feature drift vs the default f32/16 kHz
path on a random-init encoder.
"""

import os
import wave

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio import wire


def test_int16_roundtrip_exact_for_pcm16(rng):
    pcm = rng.integers(-32768, 32768, size=4000, dtype=np.int16)
    x = pcm.astype(np.float32) / 32768.0
    packed = wire.encode_np(x, "int16")
    assert packed.dtype == np.int16
    assert np.array_equal(packed, pcm)
    back = np.asarray(wire.decode_device(packed, "int16"))
    assert np.allclose(back, x)


def test_mulaw_snr(rng):
    x = np.clip(0.3 * rng.standard_normal(16000), -1, 1).astype(np.float32)
    back = np.asarray(wire.decode_device(wire.encode_np(x, "mulaw"), "mulaw"))
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - back) ** 2))
    assert snr > 30.0, snr  # mu-law companding: ~38 dB for speech-like signals
    # quiet signals keep usable resolution (companding): a -60 dBFS signal
    # still decodes at ~15 dB SNR where linear 8-bit would quantize to zero
    q = 1e-3 * x
    backq = np.asarray(wire.decode_device(wire.encode_np(q, "mulaw"), "mulaw"))
    snrq = 10 * np.log10(np.mean(q**2) / np.mean((q - backq) ** 2))
    assert snrq > 12.0, snrq


def test_f32_passthrough(rng):
    x = rng.standard_normal(100).astype(np.float32)
    assert wire.encode_np(x, "f32") is x
    with pytest.raises(ValueError):
        wire.encode_np(x, "flac")


def _write_wav(path, x, sr):
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def wav4k_dir(tmp_path_factory):
    """Six CirCor-like 4 kHz WAVs: tones + noise, varying lengths."""
    d = tmp_path_factory.mktemp("wav4k")
    r = np.random.default_rng(3)
    paths = []
    for i, sec in enumerate((6.0, 10.0, 21.0, 35.0, 12.5, 9.0)):
        t = np.arange(int(sec * 4000)) / 4000
        x = 0.3 * np.sin(2 * np.pi * (60 + 15 * i) * t) + 0.02 * r.standard_normal(len(t))
        p = os.path.join(str(d), f"c{i}.wav")
        _write_wav(p, x.astype(np.float32), 4000)
        paths.append(p)
    return paths


def _extractor(**kw):
    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    return FeatureExtractor(
        "operaCT", dim=768, input_sec=8, batch_size=4, random_init=True, **kw
    )


def _cos(a, b):
    return np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_source_rate_and_mulaw_feature_parity(wav4k_dir, monkeypatch):
    # force the python host path so all variants share decode semantics
    from heart_murmur_detection_tpu.utils import native

    monkeypatch.setattr(native, "native_available", lambda: False)

    base = _extractor(wire_format="f32").extract_files(wav4k_dir)

    # int16 wire: features essentially identical (PCM16 is the source format)
    f_i16 = _extractor(wire_format="int16").extract_files(wav4k_dir)
    assert _cos(base, f_i16).min() > 0.9999

    # source-rate shipping (4 kHz -> device upsample): same resample FIR as
    # the host path, trim at source rate; only boundary rounding may differ
    f_src = _extractor(wire_format="int16", source_sr=4000).extract_files(wav4k_dir)
    assert _cos(base, f_src).min() > 0.999, _cos(base, f_src).min()

    # mu-law + source-rate: 8x fewer wire bytes; drift bounded
    f_mu = _extractor(wire_format="mulaw", source_sr=4000).extract_files(wav4k_dir)
    assert _cos(base, f_mu).min() > 0.99, _cos(base, f_mu).min()


def test_source_sr_validation():
    with pytest.raises(ValueError):
        _extractor(source_sr=44100)
    with pytest.raises(KeyError):
        _extractor(wire_format="int8")
