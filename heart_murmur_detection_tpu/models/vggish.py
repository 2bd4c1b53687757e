"""VGGish in Flax + its example-framing frontend
(src/benchmark/baseline/vggish/: mel_features.py, vggish_input.py,
vggish_slim.py, vggish_params.py — Google AudioSet VGGish).

Frontend (vggish_input.waveform_to_examples): 16 kHz mono -> magnitude STFT
(25 ms window=400, 10 ms hop=160, periodic hann, NO padding) -> 64 HTK-mel
bands 125-7500 Hz (unnormalized triangles in mel space) -> log(mel + 0.01)
-> frame into non-overlapping 0.96 s examples (96 frames x 64 bands).

Network (vggish_slim): conv 64 - pool - conv 128 - pool - conv 256 x2 - pool -
conv 512 x2 - pool - fc 4096 x2 - fc 128 (embedding). Reference extraction
mean-pools example embeddings per clip (extract_feature.py:30-75) and loads
audio at SR 22050 before framing at 16 kHz — a reference quirk kept by its
extractor, replicated only when strict=True.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
FRAME = 400
HOP = 160
EX_FRAMES = 96  # 0.96 s / 10 ms
N_MELS = 64


def _hz_to_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def _mel_matrix() -> np.ndarray:
    """spectrogram_to_mel_matrix semantics (mel_features.py): triangles in mel
    space over FFT bin freqs, 125-7500 Hz, unnormalized."""
    nfft = 512  # next pow2 of 400 (mel_features uses 2**ceil(log2(window)))
    n_bins = nfft // 2 + 1
    freqs = np.linspace(0, SR / 2.0, n_bins)
    spec_mel = _hz_to_mel(freqs)
    edges = np.linspace(_hz_to_mel(125.0), _hz_to_mel(7500.0), N_MELS + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    up = (spec_mel[:, None] - lower[None]) / (center - lower)[None]
    down = (upper[None] - spec_mel[:, None]) / (upper - center)[None]
    w = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    w[0] = 0.0  # DC
    return w


def waveform_to_examples(y: np.ndarray) -> np.ndarray:
    """(N,) float waveform @16 kHz -> (n_examples, 96, 64) log-mel examples."""
    n_frames = 1 + (len(y) - FRAME) // HOP if len(y) >= FRAME else 0
    if n_frames < EX_FRAMES:
        return np.zeros((0, EX_FRAMES, N_MELS), np.float32)
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(FRAME) / FRAME)
    frames = y[idx] * win
    spec = np.abs(np.fft.rfft(frames, n=512, axis=1))  # magnitude, not power
    mel = spec @ _mel_matrix()
    logmel = np.log(mel + 0.01)
    n_ex = n_frames // EX_FRAMES
    return logmel[: n_ex * EX_FRAMES].reshape(n_ex, EX_FRAMES, N_MELS).astype(np.float32)


class VGGish(nn.Module):
    """(B, 96, 64) log-mel examples -> (B, 128) embeddings."""

    @nn.compact
    def __call__(self, x):
        h = x[..., None]
        for i, (ch, reps) in enumerate([(64, 1), (128, 1), (256, 2), (512, 2)]):
            for j in range(reps):
                h = nn.relu(
                    nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{i+1}_{j+1}")(h)
                )
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(h.shape[0], -1)  # (B, 6*4*512)
        h = nn.relu(nn.Dense(4096, name="fc1_1")(h))
        h = nn.relu(nn.Dense(4096, name="fc1_2")(h))
        return nn.relu(nn.Dense(128, name="fc2")(h))


class VGGishPostprocessor:
    """PCA whitening + 8-bit quantization (vggish_postprocess semantics);
    params from the shipped vggish_pca_params.npz (data artifact)."""

    def __init__(self, pca_params_path: str):
        d = np.load(pca_params_path)
        self.pca_matrix = d["pca_eigen_vectors"]
        self.pca_means = d["pca_means"].reshape(-1, 1)

    def __call__(self, emb: np.ndarray) -> np.ndarray:
        x = self.pca_matrix @ (emb.T - self.pca_means)
        x = np.clip(x.T, -2.0, 2.0)
        return np.round((x + 2.0) * (255.0 / 4.0))


def extract_vgg_feature(
    sound_dir_loc, variables=None, random_init: bool = False, batch_size: int = 64
) -> np.ndarray:
    """Per-clip mean over example embeddings (extract_feature.py:30-75)."""
    from ..utils.audio_io import load_wav

    model = VGGish()
    if variables is None:
        if not random_init:
            raise FileNotFoundError("VGGish weights not available; pass variables=")
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64)))

    # params as a jit ARGUMENT, not a closure: closed-over trees are embedded
    # in the serialized HLO, and VGGish's ~289 MB exceeds this environment's
    # remote-compile request limit (same fix as the audiomae extraction
    # graph, RESULTS.md zoo-throughput notes)
    variables = jax.device_put(variables, jax.devices()[0])
    fn = jax.jit(lambda v, x: model.apply(v, x))

    out = []
    for p in sound_dir_loc:
        y, _ = load_wav(str(p), sr=SR)
        ex = waveform_to_examples(y)
        if len(ex) == 0:
            out.append(np.zeros(128, np.float32))
            continue
        pad = (-len(ex)) % batch_size
        exp = np.concatenate([ex, np.zeros((pad, 96, 64), np.float32)]) if pad else ex
        embs = []
        for lo in range(0, len(exp), batch_size):
            embs.append(np.asarray(fn(variables, jnp.asarray(exp[lo : lo + batch_size]))))
        embs = np.concatenate(embs)[: len(ex)]
        out.append(embs.mean(axis=0))
    return np.stack(out)


def opensmile_impl() -> str:
    """Which openSMILE implementation `extract_opensmile_features` will use:
    "pip-opensmile" (exact reference parity) or "native-emobase" (first-party
    fallback). Callers caching features should record this so pip- and
    fallback-extracted features are never unknowingly mixed in one probe."""
    try:
        import opensmile  # noqa: F401

        return "pip-opensmile"
    except ImportError:
        return "native-emobase"


_warned_fallback = False


def extract_opensmile_features(
    audio_file: str, native: "bool | None" = None
) -> "pd.DataFrame":
    """openSMILE emobase functionals (extract_feature.py:19-27).

    Uses the optional pip ``opensmile`` package when installed (exact parity
    with the reference). Otherwise falls back to the first-party 988-d
    emobase-family implementation in audio/emobase.py — same dimensionality
    and recipe, NOT bit-identical to openSMILE's C++ DSP (see its docstring;
    never mix the two inside one probe — `opensmile_impl()` reports which one
    is active). ``native=True`` forces the fallback, ``native=False``
    requires the pip package.

    Both paths return a 1-row pandas DataFrame whose columns name the
    features (openSMILE's own names on the pip path, emobase_feature_names()
    on the fallback), so column-indexing consumers work on either."""
    import pandas as pd

    if not native:
        try:
            import opensmile

            smile = opensmile.Smile(
                feature_set=opensmile.FeatureSet.emobase,
                feature_level=opensmile.FeatureLevel.Functionals,
            )
            return smile.process_file(audio_file)
        except ImportError:
            if native is False:
                raise
    global _warned_fallback
    if native is None and not _warned_fallback:
        import warnings

        warnings.warn(
            "pip 'opensmile' not installed: using the first-party emobase "
            "fallback (audio/emobase.py). Values are correlated but not "
            "bit-identical to openSMILE — do not mix the two inside one "
            "probe (opensmile_impl() reports which is active).",
            stacklevel=2,
        )
        _warned_fallback = True
    from ..audio.emobase import emobase_feature_names, emobase_features
    from ..utils.audio_io import load_wav

    wav, sr = load_wav(audio_file, sr=None)
    return pd.DataFrame(
        emobase_features(wav, sr)[None, :], columns=emobase_feature_names()
    )
