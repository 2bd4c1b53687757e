"""COLA contrastive wrapper (bilinear-similarity InfoNCE with in-batch
diagonal targets) — src/model/models_cola.py:75-342.

Projector: encoder -> [middle] -> g -> tanh(LayerNorm) -> bilinear `linear`
(dropout p between every stage during training). Loss: CE(x1 W x2^T, diag).

extract_feature(x, dim) returns the embedding at the chosen depth:
dim_fea (encoder output: 768 htsat / 1280 efficientnet), dim_hidden (after
middle, usually == dim_fea), or dim_out (after g, 512).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .efficientnet import ColaEfficientNetEncoder
from .htsat import HTSAT, HTSATConfig


@dataclasses.dataclass(frozen=True)
class ColaConfig:
    encoder: str = "htsat"  # "htsat" | "efficientnet"
    p: float = 0.1
    dim_fea: int = 1280
    dim_hidden: int = 1280
    dim_out: int = 512
    # mixed-precision encoder compute for the efficientnet encoder (bf16
    # convs, f32 BatchNorms); for the htsat encoder pass
    # HTSATConfig(compute_dtype=...) instead. None = exact f32.
    compute_dtype: object = None

    def resolved(self) -> "ColaConfig":
        if self.encoder == "htsat":
            fea = 768
            hidden = min(self.dim_hidden, fea)
            return dataclasses.replace(self, dim_fea=fea, dim_hidden=hidden)
        return self

    @property
    def middle_enabled(self) -> bool:
        c = self.resolved()
        return c.dim_fea != c.dim_hidden


class Cola(nn.Module):
    """Flax COLA module. Methods:
    - encode(mel, n_frames, train): encoder features (dim_fea)
    - project(h, train): g -> tanh(LN) (dim_out)
    - __call__((x1, x2), ...): pair forward -> (z1 @ W, z2)
    - extract_feature(mel, dim, n_frames): LP feature at requested depth
    """

    config: ColaConfig = ColaConfig()
    htsat: HTSATConfig = HTSATConfig()

    def setup(self):
        cfg = self.config.resolved()
        if cfg.encoder == "htsat":
            self.encoder = HTSAT(self.htsat, name="encoder")
        elif cfg.encoder == "efficientnet":
            self.encoder = ColaEfficientNetEncoder(
                drop_connect_rate=self.config.p,
                dtype=self.config.compute_dtype,
                name="encoder",
            )
        else:
            raise ValueError(cfg.encoder)
        if cfg.middle_enabled:
            self.middle = nn.Dense(cfg.dim_hidden, name="middle")
        self.g = nn.Dense(cfg.dim_out, name="g")
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.linear = nn.Dense(cfg.dim_out, use_bias=False, name="linear")
        self.do = nn.Dropout(self.config.p)

    def encode(self, mel, n_frames=None, train: bool = False):
        cfg = self.config.resolved()
        if cfg.encoder == "htsat":
            return self.encoder(mel, n_frames=n_frames, train=train)["latent_output"]
        return self.encoder(mel, n_frames=n_frames, train=train)

    def _embed(self, mel, n_frames, train):
        cfg = self.config.resolved()
        det = not train
        h = self.encode(mel, n_frames, train)
        if cfg.middle_enabled:
            h = self.middle(h)
        h = self.do(h, deterministic=det)
        h = self.do(self.g(h), deterministic=det)
        return self.do(jnp.tanh(self.layer_norm(h)), deterministic=det)

    def __call__(self, pair, n_frames=None, train: bool = False):
        x1, x2 = pair
        nf1, nf2 = (None, None) if n_frames is None else n_frames
        z1 = self._embed(x1, nf1, train)
        z2 = self._embed(x2, nf2, train)
        return self.linear(z1), z2

    def extract_feature(self, mel, dim: int, n_frames=None):
        cfg = self.config.resolved()
        h = self.encode(mel, n_frames, train=False)
        if dim == cfg.dim_fea:
            return h
        if cfg.middle_enabled:
            h = self.middle(h)
        if dim == cfg.dim_hidden:
            return h
        h = self.g(h)
        if dim == cfg.dim_out:
            return h
        raise NotImplementedError(f"dim {dim} not reachable")


def cola_loss(z1: jnp.ndarray, z2: jnp.ndarray):
    """CE over bilinear similarities with diagonal targets
    (models_cola.py:148-163). Returns (loss, accuracy)."""
    logits = z1 @ z2.T
    labels = jnp.arange(z1.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = (jnp.argmax(logits, axis=1) == labels).mean()
    return loss, acc
