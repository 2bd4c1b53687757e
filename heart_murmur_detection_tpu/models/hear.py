"""HeAR (health acoustic representations) encoder: ViT-L/16 over (192,128)
mel-PCEN of 2 s @16 kHz clips (finetuning.py:1081-1104 ViTConfig: hidden 1024,
24 layers, 16 heads, mlp 4096, pooler linear 1024->512; extract_feature.py:
174-210 serving returns the 512-d pooled embedding).

HF-ViT conventions: learnable position embeddings (cls + 96 patches),
pre-norm blocks, CLS-token pooling through a linear pooler."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.hear_frontend import hear_preprocess
from .vit_mae import ViTBlock


@dataclasses.dataclass(frozen=True)
class HeARConfig:
    image_size: tuple = (192, 128)
    patch_size: int = 16
    hidden: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    pooled_dim: int = 512

    @property
    def num_patches(self) -> int:
        return (self.image_size[0] // self.patch_size) * (
            self.image_size[1] // self.patch_size
        )


class HeAREncoder(nn.Module):
    """waveform (B, <=32000) -> dict(pooled=(B,512), cls=(B,1024))."""

    config: HeARConfig = HeARConfig()

    @nn.compact
    def __call__(self, audio, train: bool = False, from_spectrogram: bool = False):
        cfg = self.config
        x = audio if from_spectrogram else hear_preprocess(audio)
        h = nn.Conv(
            cfg.hidden,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed_proj",
        )(x[..., None])
        B, Hp, Wp, D = h.shape
        h = h.reshape(B, Hp * Wp, D)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, D))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, D),
        )
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), h], axis=1) + pos
        for i in range(cfg.depth):
            h = ViTBlock(cfg.hidden, cfg.heads, cfg.mlp_ratio, name=f"blocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        cls_out = h[:, 0]
        pooled = nn.Dense(cfg.pooled_dim, name="pooler")(cls_out)  # pooler_act linear
        return {"pooled": pooled, "cls": cls_out, "tokens": h[:, 1:]}


def extract_hear_feature(
    sound_dir_loc,
    variables=None,
    input_sec: float = 2.0,
    batch_size: int = 16,
    random_init: bool = False,
    use_fused: bool = None,
) -> np.ndarray:
    """Pad/trim to 2 s, encode, return 512-d embeddings
    (extract_feature.py:174-210).

    use_fused: route the 24 ViT-L blocks through the fused Pallas kernels
    (models.vit_fused.hear_forward_fused, bf16 matmuls / f32 accumulation —
    the documented extraction precision class, PARITY.md). None = auto: on
    for TPU."""
    from ..utils.audio_io import load_wav

    model = HeAREncoder()
    n = 32000
    if variables is None:
        if not random_init:
            raise FileNotFoundError("HeAR weights not available; pass variables=")
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, n)))
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    variables = jax.device_put(variables, jax.devices()[0])

    if use_fused:
        from .vit_fused import hear_forward_fused

        fn = jax.jit(
            # fast_softmax: same policy as the swin/ViT extraction towers —
            # skip the rowwise max pass (exact zeros on masked columns,
            # safe for LN-bounded logits), bf16-path acceptance bar applies
            lambda v, wav: hear_forward_fused(
                v, wav, model.config, fast_softmax=True
            )
        )
    else:
        fn = jax.jit(lambda v, wav: model.apply(v, wav)["pooled"])

    paths = list(sound_dir_loc)
    out = []  # device arrays; no per-batch sync, so host decode of batch
    # i+1 overlaps device compute of batch i (async dispatch)
    counts = []
    for lo in range(0, len(paths), batch_size):
        part = paths[lo : lo + batch_size]
        clips = []
        for p in part:
            y, _ = load_wav(p, sr=16000)
            y = y[:n] if len(y) > n else np.pad(y, (0, n - len(y)))
            clips.append(y)
        k = len(clips)
        while len(clips) < batch_size:
            clips.append(clips[0])
        out.append(fn(variables, jnp.asarray(np.stack(clips))))
        counts.append(k)
    return np.concatenate(
        [np.asarray(o)[:k] for o, k in zip(out, counts)], axis=0
    )
