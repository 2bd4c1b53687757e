"""Gradient parity of the fused ViT train kernels (ops/pallas_vit_train)
against jax.grad of the plain flax ViTBlock, interpret mode, f32.

Mirrors tests/test_pallas_swin_train.py: y and EVERY gradient (x and all
block params) to ~1e-4, for both the 'acc' (ViT-S class) and 'emit'
(ViT-B class) weight-gradient strategies, with and without token padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.vit_mae import ViTBlock
from heart_murmur_detection_tpu.ops.pallas_vit import pad_tokens
from heart_murmur_detection_tpu.ops.pallas_vit_train import fused_vit_block_train


def _init_block(rng, B, N, C, heads):
    block = ViTBlock(dim=C, num_heads=heads)
    x = jax.random.normal(rng, (B, N, C), jnp.float32)
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    return block, params, x


def _weights(B, N, C):
    n = B * N * C
    return jnp.arange(1, n + 1, dtype=jnp.float32).reshape(B, N, C) / n


def _loss_ref(block, params, x, n_real):
    y = block.apply({"params": params}, x)
    return jnp.sum(y[:, :n_real] * _weights(*y.shape)[:, :n_real])


def _loss_fused(params, x, n_real, heads, mode):
    xp, nr = pad_tokens(x, 16)
    y = fused_vit_block_train(
        xp, params, nr, num_heads=heads, mode=mode, interpret=True,
        q_chunk=64,
    )[:, :n_real]
    B, N, C = x.shape
    return jnp.sum(y * _weights(B, N, C)[:, :n_real])


@pytest.mark.parametrize("mode,N,C,heads", [
    ("acc", 48, 128, 4),    # padded (48 -> 48, no pad) ViT-S-class
    ("acc", 40, 128, 4),    # 40 -> pad 48, padded-row gradient exactness
    ("emit", 40, 128, 4),   # same geometry through the emit strategy
])
def test_grad_parity(mode, N, C, heads):
    B = 2
    block, params, x = _init_block(jax.random.PRNGKey(0), B, N, C, heads)

    ref = jax.grad(
        lambda p, xx: _loss_ref(block, p, xx, N), argnums=(0, 1)
    )(params, x)
    got = jax.grad(
        lambda p, xx: _loss_fused(p, xx, N, heads, mode), argnums=(0, 1)
    )(params, x)

    # forward parity
    y_ref = block.apply({"params": params}, x)
    xp, nr = pad_tokens(x, 16)
    y_fused = fused_vit_block_train(
        xp, params, nr, num_heads=heads, mode=mode, interpret=True, q_chunk=64
    )[:, :N]
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)

    # dx parity
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4, rtol=2e-3)
    # every param gradient
    flat_ref = jax.tree_util.tree_flatten_with_path(ref[0])[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got[0])[0]
    for (path_r, g_r), (path_g, g_g) in zip(flat_ref, flat_got):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(g_g), np.asarray(g_r), atol=2e-4, rtol=2e-3,
            err_msg=str(path_r),
        )


def test_padded_rows_do_not_leak():
    """With n_real < Np, fused grads must be independent of garbage in the
    padded input rows (the mask + zero-dy contract)."""
    B, N, C, heads = 2, 40, 128, 4
    block, params, x = _init_block(jax.random.PRNGKey(3), B, N, C, heads)

    def loss_from_padded(p, xpad):
        y = fused_vit_block_train(
            xpad, p, N, num_heads=heads, mode="acc", interpret=True, q_chunk=64
        )
        return jnp.sum(y[:, :N] ** 2)

    xp, _ = pad_tokens(x, 16)
    g1 = jax.grad(loss_from_padded)(params, xp)
    xp2 = xp.at[:, N:].set(7.3)  # garbage in padded rows
    g2 = jax.grad(loss_from_padded)(params, xp2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
