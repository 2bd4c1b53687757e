"""Mixed-precision (bf16-compute) HTSAT: numerics + gradient dtype checks.

HTSATConfig.compute_dtype=jnp.bfloat16 computes Dense/Conv in bf16 while
LayerNorms, softmax and the residual carries stay f32 and params/grads stay
f32 (the standard TPU mixed-precision recipe; wired into CP via
cli.pretrain compute_dtype=bfloat16)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.htsat import HTSAT, HTSATConfig

SMALL = HTSATConfig(
    spec_size=64,
    mel_bins=16,
    embed_dim=32,
    depths=(1, 1),
    num_heads=(2, 4),
    window_size=4,
    num_classes=5,
    drop_path_rate=0.0,
)


def _latent(cfg, v, mel):
    return np.asarray(
        HTSAT(cfg).apply(v, mel)["latent_output"], np.float32
    )


def test_bf16_compute_close_to_f32_and_f32_grads():
    r = np.random.default_rng(0)
    mel = jnp.asarray(r.random((2, 33, 16)), jnp.float32)
    m32 = HTSAT(SMALL)
    v = m32.init(jax.random.PRNGKey(0), mel)
    o32 = _latent(SMALL, v, mel)
    cfg16 = dataclasses.replace(SMALL, compute_dtype=jnp.bfloat16)
    o16 = _latent(cfg16, v, mel)
    cos = np.sum(o32 * o16, -1) / (
        np.linalg.norm(o32, axis=-1) * np.linalg.norm(o16, axis=-1)
    )
    assert cos.min() > 0.999

    def loss(p):
        out = HTSAT(cfg16).apply(
            {"params": p, "batch_stats": v["batch_stats"]}, mel
        )
        return jnp.sum(out["latent_output"] ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_efficientnet_bf16_compute_close():
    """ColaEfficientNetEncoder dtype=bf16 (bf16 convs, f32 BatchNorms) stays
    within quantization distance of f32 and keeps f32 grads."""
    from heart_murmur_detection_tpu.models.efficientnet import (
        ColaEfficientNetEncoder,
    )

    r = np.random.default_rng(2)
    mel = jnp.asarray(r.random((2, 64, 64)), jnp.float32)
    m32 = ColaEfficientNetEncoder()
    v = m32.init(jax.random.PRNGKey(0), mel)
    o32 = np.asarray(m32.apply(v, mel), np.float32)
    m16 = ColaEfficientNetEncoder(dtype=jnp.bfloat16)
    o16 = np.asarray(m16.apply(v, mel), np.float32)
    cos = np.sum(o32 * o16, -1) / (
        np.linalg.norm(o32, axis=-1) * np.linalg.norm(o16, axis=-1)
    )
    assert cos.min() > 0.999

    def loss(p):
        out = m16.apply({"params": p, "batch_stats": v["batch_stats"]}, mel)
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(g))


def test_f32_default_unchanged():
    """compute_dtype=None is the exact pre-existing f32 path (bit-level)."""
    r = np.random.default_rng(1)
    mel = jnp.asarray(r.random((1, 33, 16)), jnp.float32)
    m = HTSAT(SMALL)
    v = m.init(jax.random.PRNGKey(0), mel)
    a = _latent(SMALL, v, mel)
    b = _latent(dataclasses.replace(SMALL, compute_dtype=None), v, mel)
    np.testing.assert_array_equal(a, b)
