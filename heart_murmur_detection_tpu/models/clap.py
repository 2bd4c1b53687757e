"""Microsoft CLAP audio tower (audio-side only, as the reference uses it —
src/benchmark/baseline/msclap/CLAPWrapper.py:343, models/clap.py:25-141).

- 2022: Cnn14 @44.1 kHz (n_fft 1024, hop 320, mel 64, fmin 50, fmax 14000),
  2048-d embedding, 5 s clips
- 2023: HTS-AT @44.1 kHz (fmax 8000), embedding == latent_output
  (msclap/models/htsat.py:1221), 7 s clips
- Projection head: ln(x W1 + drop(gelu(x W1) W2)) to d_proj=1024 (clap.py:10-22)
- clip loading: repeat-tile shorter clips, random-crop longer
  (CLAPWrapper.load_audio_into_tensor:274-299)

The text tower (BERT/GPT-2) is not used by any reference entry point and is
not replicated; extraction returns the projected audio embedding (1024-d).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import logmel_frontend_general
from .cnn14 import Cnn14
from .htsat import HTSAT, HTSATConfig


@dataclasses.dataclass(frozen=True)
class CLAPConfig:
    version: str = "2023"  # "2022" | "2023"
    sample_rate: int = 44100
    n_fft: int = 1024
    hop: int = 320
    mel_bins: int = 64
    fmin: float = 50.0
    d_proj: int = 1024
    classes_num: int = 527

    @property
    def fmax(self) -> float:
        return 8000.0 if self.version == "2023" else 14000.0

    @property
    def duration(self) -> float:
        return 7.0 if self.version == "2023" else 5.0

    @property
    def d_in(self) -> int:
        return 768 if self.version == "2023" else 2048


class Projection(nn.Module):
    d_out: int = 1024
    p: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        e1 = nn.Dense(self.d_out, use_bias=False, name="linear1")(x)
        e2 = nn.Dense(self.d_out, use_bias=False, name="linear2")(nn.gelu(e1, approximate=False))
        e2 = nn.Dropout(self.p)(e2, deterministic=not train)
        return nn.LayerNorm(name="layer_norm")(e1 + e2)


class CLAPAudioEncoder(nn.Module):
    """waveform (B, N) @44.1kHz + lengths -> projected embedding (B, 1024).

    Also exposes the raw backbone embedding via return_backbone=True."""

    config: CLAPConfig = CLAPConfig()

    @nn.compact
    def __call__(self, wav, lengths, train: bool = False, return_backbone: bool = False):
        cfg = self.config
        logmel, nf = logmel_frontend_general(
            wav, lengths, cfg.sample_rate, cfg.mel_bins, cfg.fmin, cfg.fmax,
            cfg.n_fft, cfg.hop,
        )
        if cfg.version == "2022":
            out = Cnn14(cfg.classes_num, name="base")(logmel, nf, train)
            emb = out["embedding"]
        else:
            htsat_cfg = HTSATConfig(mel_bins=cfg.mel_bins, num_classes=cfg.classes_num)
            out = HTSAT(htsat_cfg, name="base")(logmel, n_frames=nf, train=train)
            emb = out["latent_output"]
        proj = Projection(cfg.d_proj, name="projection")(emb, train)
        if return_backbone:
            return proj, emb
        return proj


def clap_audio_forward_fused(
    variables: dict,
    wav: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: CLAPConfig = CLAPConfig(),
    *,
    mm_dtype=jnp.bfloat16,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """CLAP-2023 projected audio embedding (B, 1024) with the HTS-AT tower
    running through the fused Pallas swin path (models.htsat_fused). Equals
    CLAPAudioEncoder.apply(...) eval-mode to the documented extraction
    precision class (PARITY.md). 2023 only — the 2022 tower is a Cnn14,
    whose convs XLA already fuses."""
    assert cfg.version == "2023", "fused path covers the HTS-AT (2023) tower"
    from .htsat_fused import htsat_apply_fused

    # bf16 tower -> bf16x3 DFT passes (the mel_frontend/extract.py policy);
    # at 44.1 kHz the HIGHEST-precision frontend was ~60% of the whole graph
    prec = jax.lax.Precision.HIGH if mm_dtype == jnp.bfloat16 else None
    logmel, nf = logmel_frontend_general(
        wav, lengths, cfg.sample_rate, cfg.mel_bins, cfg.fmin, cfg.fmax,
        cfg.n_fft, cfg.hop, precision=prec,
    )
    sub = {
        "params": variables["params"]["base"],
        "batch_stats": variables["batch_stats"]["base"],
    }
    emb = htsat_apply_fused(
        sub, logmel, nf,
        HTSATConfig(mel_bins=cfg.mel_bins, num_classes=cfg.classes_num),
        mm_dtype=mm_dtype, fast_softmax=fast_softmax,
    )
    p = variables["params"]["projection"]
    e1 = emb @ p["linear1"]["kernel"]
    e2 = jax.nn.gelu(e1, approximate=False) @ p["linear2"]["kernel"]
    h = e1 + e2
    ln = p["layer_norm"]
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]


def load_clap_clip(path: str, duration: float, sr: int = 44100, rng=None):
    """Reference clip policy: tile short clips, random-crop long ones."""
    from ..utils.audio_io import load_wav

    y, _ = load_wav(path, sr=sr)
    n = int(duration * sr)
    if n >= len(y):
        reps = int(np.ceil(n / max(len(y), 1)))
        y = np.tile(y, reps)[:n]
    else:
        rng = rng or np.random.default_rng(0)
        start = int(rng.integers(0, len(y) - n))
        y = y[start : start + n]
    return y.astype(np.float32)


def extract_clap_feature(
    sound_dir_loc,
    version: str = "2022",
    variables: Optional[dict] = None,
    batch_size: int = 16,
    seed: int = 0,
    random_init: bool = False,
    use_fused: Optional[bool] = None,
) -> np.ndarray:
    """Batched CLAP audio-embedding extraction (extract_feature.py:78-102).

    use_fused: run the 2023 HTS-AT tower through the fused Pallas swin
    kernels (clap_audio_forward_fused). None = auto: on for TPU + 2023."""
    cfg = CLAPConfig(version=version)
    model = CLAPAudioEncoder(cfg)
    n = int(cfg.duration * cfg.sample_rate)
    n = (n + cfg.hop - 1) // cfg.hop * cfg.hop
    if variables is None:
        if not random_init:
            raise FileNotFoundError(
                "CLAP weights not found; convert with extract.convert and pass "
                "variables=, or set random_init=True"
            )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, n)), jnp.full((1,), n, jnp.int32)
            )
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu" and version == "2023"
    variables = jax.device_put(variables, jax.devices()[0])

    if use_fused:
        fn = jax.jit(
            # fast_softmax: same policy as the other extraction towers
            lambda v, wav, lengths: clap_audio_forward_fused(
                v, wav, lengths, cfg, fast_softmax=True
            )
        )
    else:
        fn = jax.jit(lambda v, wav, lengths: model.apply(v, wav, lengths))

    rng = np.random.default_rng(seed)
    out = []  # device arrays; sync once at the end so host decode of the
    # next batch overlaps device compute (async dispatch)
    counts = []
    paths = list(sound_dir_loc)
    for lo in range(0, len(paths), batch_size):
        part = paths[lo : lo + batch_size]
        clips = [load_clap_clip(p, cfg.duration, cfg.sample_rate, rng) for p in part]
        k = len(clips)
        while len(clips) < batch_size:
            clips.append(clips[0])
        wav = np.stack(clips)[:, :n]
        lengths = np.full((batch_size,), wav.shape[1], np.int32)
        out.append(fn(variables, jnp.asarray(wav), jnp.asarray(lengths)))
        counts.append(k)
    return np.concatenate(
        [np.asarray(o)[:k] for o, k in zip(out, counts)], axis=0
    )
