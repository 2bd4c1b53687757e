"""Host-side clip pipelines: decode -> (bandpass) -> trim -> pad/split.

These mirror the reference's entry DSP functions but *stop at waveforms* so the
spectrogram step can run batched on TPU (audio.dsp). A `spectrogram=True` mode
computes mels on host via the numpy oracle for exact-parity use cases
(cache generation on tiny datasets, tests).

Reference equivalents:
- get_entire_signal_librosa   src/util.py:205-267
- get_split_signal_librosa    src/util.py:309-364
- get_split_signal_fbank_pad  src/util.py:794-860
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from scipy.signal import butter, lfilter

from ..utils.audio_io import load_wav
from . import reference_np as ref
from .pad import decide_droplast, split_pad_sample

SR = 16000


def butter_bandpass_filter(
    data: np.ndarray, lowcut: float, highcut: float, fs: float, order: int = 5
) -> np.ndarray:
    """Order-N butterworth bandpass (src/util.py:113-127)."""
    nyq = 0.5 * fs
    b, a = butter(order, [lowcut / nyq, highcut / nyq], btype="band")
    return lfilter(b, a, data).astype(np.float32)


def _load_trim(
    path: str,
    sample_rate: int,
    butterworth_filter: Optional[int],
    lowcut: float,
    highcut: float,
) -> np.ndarray:
    data, rate = load_wav(path, sr=sample_rate)
    if butterworth_filter:
        data = butter_bandpass_filter(data, lowcut, highcut, rate, butterworth_filter)
    yt, _ = ref.trim_heart(data, rate)
    return yt


def get_entire_signal(
    path: str,
    input_sec: float = 8,
    sample_rate: int = SR,
    butterworth_filter: Optional[int] = None,
    spectrogram: bool = False,
    pad: bool = False,
    types: str = "repeat",
    lowcut: float = 200,
    highcut: float = 1800,
    max_sec: Optional[float] = None,
    yt: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Whole-clip path (src/util.py:205-267): trim, pad-to-min, cap at max_sec.

    Returns waveform, or (T,64) normalised mel if spectrogram=True (f_max=8000),
    or None when too short and pad=False.
    """
    if yt is None:
        yt = _load_trim(path, sample_rate, butterworth_filter, lowcut, highcut)
    duration = len(yt) / sample_rate
    if duration < input_sec:
        if not pad:
            return None
        yt = split_pad_sample(yt, input_sec, sample_rate, types)[0]
    if max_sec and duration > max_sec:
        yt = yt[: int(max_sec * sample_rate)]
    if spectrogram:
        return ref.pre_process_audio_mel_t(yt, sample_rate, f_max=8000)
    return yt


def get_split_signal(
    path: str,
    input_sec: float = 8,
    sample_rate: int = SR,
    butterworth_filter: Optional[int] = None,
    spectrogram: bool = False,
    trim_tail: bool = False,
    lowcut: float = 200,
    highcut: float = 1800,
) -> List[np.ndarray]:
    """Chunked path (src/util.py:309-364): 50%-hop input_sec windows."""
    yt = _load_trim(path, sample_rate, butterworth_filter, lowcut, highcut)
    drop_last = decide_droplast(len(yt), sample_rate, input_sec) if trim_tail else False
    chunks = split_pad_sample(yt, input_sec, sample_rate)
    if drop_last:
        chunks.pop()
    if not spectrogram:
        return chunks
    return [ref.pre_process_audio_mel_t(c, sample_rate, f_max=8000) for c in chunks]


def get_split_signal_fbank_pad(
    path: str,
    input_sec: float = 10,
    sample_rate: int = SR,
    butterworth_filter: Optional[int] = None,
    spectrogram: bool = True,
    trim_tail: bool = False,
) -> List[np.ndarray]:
    """Kaldi-fbank chunked path (src/util.py:794-860): mean-subtract then
    128-bin fbank per chunk; chunks shorter than 400 samples dropped."""
    yt = _load_trim(path, sample_rate, butterworth_filter, 200, 1800)
    drop_last = decide_droplast(len(yt), sample_rate, input_sec) if trim_tail else False
    chunks = split_pad_sample(yt, input_sec, sample_rate)
    if drop_last:
        chunks.pop()
    if not spectrogram:
        return chunks
    out = []
    for w in chunks:
        w = w - w.mean()
        if len(w) > 400:
            out.append(ref.kaldi_fbank(w, sample_rate))
    return out
