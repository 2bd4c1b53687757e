"""Parity of the training-path fused swin block (ops/pallas_swin_train.py):
forward output AND every gradient (x, all params, relative-position bias)
against jax.grad of a plain jnp block, interpret mode, f32 HIGHEST."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import (
    _shift_attn_mask,
    window_partition,
    window_reverse,
)
from heart_murmur_detection_tpu.ops.pallas_swin_train import fused_swin_block_train

HI = jax.lax.Precision.HIGHEST


def _params(rng, C, heads, hidden):
    r = np.random.default_rng(rng)
    g = lambda *s: jnp.asarray(r.standard_normal(s) * 0.05, jnp.float32)
    return {
        "norm1": {"scale": 1.0 + g(C), "bias": g(C)},
        "attn": {
            "qkv": {"kernel": g(C, 3 * C), "bias": g(3 * C)},
            "proj": {"kernel": g(C, C), "bias": g(C)},
        },
        "norm2": {"scale": 1.0 + g(C), "bias": g(C)},
        "mlp": {
            "fc1": {"kernel": g(C, hidden), "bias": g(hidden)},
            "fc2": {"kernel": g(hidden, C), "bias": g(C)},
        },
    }


def _ref_block(x, p, bias, mask, k1, k2, *, window, heads):
    """Plain jnp train-mode swin block (droppath as keep multipliers)."""
    B, H, W, C = x.shape
    hd = C // heads
    N = window * window

    def ln(t, q):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) * jax.lax.rsqrt(var + 1e-5) * q["scale"] + q["bias"]

    h = ln(x, p["norm1"])
    hw = window_partition(h, window)
    qkv = hw @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]
    q, k, v = [
        qkv[..., i * C : (i + 1) * C]
        .reshape(-1, N, heads, hd)
        .transpose(0, 2, 1, 3)
        for i in range(3)
    ]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd**-0.5, k, precision=HI) + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(-1, nW, heads, N, N) + mask[None, :, None]
        attn = attn.reshape(-1, heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=HI)
    o = o.transpose(0, 2, 1, 3).reshape(-1, N, C)
    o = o @ p["attn"]["proj"]["kernel"] + p["attn"]["proj"]["bias"]
    o = window_reverse(o, window, H, W)
    h1 = x + k1[:, :, None, None] * o
    m = ln(h1, p["norm2"])
    m = jax.nn.gelu(m @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"],
                    approximate=False)
    m = m @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
    return h1 + k2[:, :, None, None] * m


def _setup(masked: bool):
    B, H, W, C, heads = 2, 16, 16, 32, 4  # hd=8 -> hdp=32 padding exercised
    hidden = 4 * C
    window = 8
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, H, W, C)), jnp.float32)
    p = _params(1, C, heads, hidden)
    bias = jnp.asarray(r.standard_normal((heads, 64, 64)) * 0.02, jnp.float32)
    mask = jnp.asarray(_shift_attn_mask(H, W, window, 4)) if masked else None
    k1 = jnp.asarray([[0.0], [1.0 / 0.9]], jnp.float32)
    k2 = jnp.asarray([[1.0 / 0.9], [1.0]], jnp.float32)
    return x, p, bias, mask, k1, k2, window, heads


@pytest.mark.parametrize("masked", [False, True])
def test_forward_parity(masked):
    x, p, bias, mask, k1, k2, window, heads = _setup(masked)
    y = fused_swin_block_train(
        x, p, bias, mask, k1, k2, window=window, num_heads=heads, interpret=True
    )
    y_ref = _ref_block(x, p, bias, mask, k1, k2, window=window, heads=heads)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("pack2", [False, None])  # None = auto (ON: C<128)
def test_grad_parity(masked, pack2):
    x, p, bias, mask, k1, k2, window, heads = _setup(masked)
    r = np.random.default_rng(7)
    w_out = jnp.asarray(r.standard_normal(x.shape), jnp.float32)

    def loss_fused(x, p, bias):
        y = fused_swin_block_train(
            x, p, bias, mask, k1, k2, window=window, num_heads=heads,
            interpret=True, pack2=pack2,
        )
        return jnp.vdot(y, w_out)

    def loss_ref(x, p, bias):
        y = _ref_block(x, p, bias, mask, k1, k2, window=window, heads=heads)
        return jnp.vdot(y, w_out)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, p, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p, bias)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_droppath_zero_kills_branch():
    """k=0 rows: the block must reduce to identity + the other branch."""
    x, p, bias, mask, k1, k2, window, heads = _setup(False)
    zeros = jnp.zeros((x.shape[0], 1), jnp.float32)
    y = fused_swin_block_train(
        x, p, bias, mask, zeros, zeros, window=window, num_heads=heads,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-6)
