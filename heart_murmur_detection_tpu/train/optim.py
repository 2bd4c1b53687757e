"""Optimizer utilities from the reference's MAE toolbox, optax-native.

- layer-wise LR decay (mae_utils/lr_decay.py:13-76, BEiT-style): per-layer lr
  scale layer_decay**(num_layers - layer_id) with cls/pos/patch-embed at
  layer 0 and everything after the blocks at num_layers; 1-D params get no
  weight decay.
- LARS (mae_utils/lars.py:14-61, MoCo-v3 style): trust-ratio-scaled momentum
  SGD; no rate scaling or weight decay for params with ndim <= 1.

Both are implemented as optax gradient transformations over the flax param
tree (the reference builds torch param groups instead).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def vit_layer_id(path: Sequence[str], num_layers: int) -> int:
    """Layer id for a flax MAE/ViT param path (lr_decay.py:64-76)."""
    name = path[0] if path else ""
    if name in ("cls_token", "pos_embed", "patch_embed_proj"):
        return 0
    if name.startswith("patch_embed"):
        return 0
    if name.startswith("blocks_"):
        return int(name.split("_")[-1]) + 1
    return num_layers


def layerwise_lr_decay(
    params, num_blocks: int, layer_decay: float = 0.75
) -> optax.GradientTransformation:
    """Scale updates per layer: layer_decay ** (num_layers + 1 - layer_id)
    following lr_decay.py:24-25 (num_layers = blocks + 1; scales indexed by
    layer_id over num_layers + 1 entries)."""
    num_layers = num_blocks + 1
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    path_scale = {
        tuple(getattr(k, "key", getattr(k, "idx", None)) for k in kp): scales[
            vit_layer_id([getattr(kp[0], "key", "")], num_layers)
        ]
        for kp, _ in flat
    }

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        upd_flat = jax.tree_util.tree_flatten_with_path(updates)
        new = [
            u * path_scale[tuple(getattr(k, "key", getattr(k, "idx", None)) for k in kp)]
            for kp, u in upd_flat[0]
        ]
        return jax.tree_util.tree_unflatten(upd_flat[1], new), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lrd(
    params,
    num_blocks: int,
    lr: float = 1e-3,
    layer_decay: float = 0.75,
    weight_decay: float = 0.05,
) -> optax.GradientTransformation:
    """AdamW with BEiT layer-wise lr decay; 1-D params get no weight decay
    (lr_decay.py:31-37)."""
    wd_mask = jax.tree.map(lambda p: p.ndim > 1, params)
    return optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        layerwise_lr_decay(params, num_blocks, layer_decay),
        optax.scale(-lr),
    )


def lars(
    lr: float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    trust_coefficient: float = 0.001,
) -> optax.GradientTransformation:
    """MoCo-v3 LARS (lars.py:14-61): for ndim>1 params, g += wd*p then scale
    by trust_coefficient*|p|/|g|; momentum buffer mu = m*mu + g; p -= lr*mu.
    1-D params get plain momentum SGD (no trust scaling, no decay)."""

    def init_fn(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("lars requires params")

        def one(g, p, mu):
            if p.ndim > 1:
                g = g + weight_decay * p
                pn = jnp.linalg.norm(p)
                gn = jnp.linalg.norm(g)
                q = jnp.where(
                    pn > 0.0,
                    jnp.where(gn > 0.0, trust_coefficient * pn / gn, 1.0),
                    1.0,
                )
                g = g * q
            new_mu = momentum * mu + g
            return -lr * new_mu, new_mu

        out = jax.tree.map(one, updates, params, state["mu"])
        upd = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        return upd, {"mu": mu}

    return optax.GradientTransformation(init_fn, update_fn)
