"""Parity: fused Pallas ViT kernels (ops.pallas_vit) vs the flax
models.vit_mae forwards, interpret mode on CPU (same harness pattern as
tests/test_pallas_swin.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.vit_fused import (
    audiomae_backbone_fused,
    mae_forward_feature_fused,
)
from heart_murmur_detection_tpu.models.vit_mae import (
    AudioMAEClassifierBackbone,
    MAEConfig,
    MaskedAutoencoderViT,
    ViTBlock,
)
from heart_murmur_detection_tpu.ops.pallas_vit import (
    fused_vit_attn,
    fused_vit_block,
    fused_vit_mlp,
    pad_tokens,
)

r = np.random.default_rng(0)


def _block_params(C, heads, key=0):
    blk = ViTBlock(dim=C, num_heads=heads)
    v = blk.init(jax.random.PRNGKey(key), jnp.zeros((1, 8, C)))
    return blk, v


class TestBlockKernels:
    def test_full_block_matches_vitblock(self):
        C, heads, N = 128, 2, 33  # hd=64, padded 33 -> 48
        blk, v = _block_params(C, heads)
        x = jnp.asarray(r.standard_normal((2, N, C)), jnp.float32)
        want = blk.apply(v, x)
        xp, n_real = pad_tokens(x, 16)
        got = fused_vit_block(
            xp, v["params"], n_real, num_heads=heads, q_chunk=16,
            interpret=True, bb=1,
        )[:, :n_real]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_split_pair_matches_vitblock(self):
        C, heads, N = 128, 2, 40
        blk, v = _block_params(C, heads, key=3)
        x = jnp.asarray(r.standard_normal((2, N, C)), jnp.float32)
        want = blk.apply(v, x)
        xp, n_real = pad_tokens(x, 16)
        h = fused_vit_attn(xp, v["params"], n_real, num_heads=heads,
                           q_chunk=16, interpret=True)
        got = fused_vit_mlp(h, v["params"], interpret=True)[:, :n_real]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_padded_columns_do_not_leak(self):
        """Same real tokens, different pad amounts -> identical real rows."""
        C, heads, N = 128, 2, 17
        _, v = _block_params(C, heads, key=5)
        x = jnp.asarray(r.standard_normal((1, N, C)), jnp.float32)
        a = fused_vit_block(pad_tokens(x, 16)[0], v["params"], N,
                            num_heads=heads, q_chunk=16, interpret=True,
                            bb=1)[:, :N]
        xp64 = jnp.pad(x, ((0, 0), (0, 64 - N), (0, 0)))
        b = fused_vit_block(xp64, v["params"], N, num_heads=heads,
                            q_chunk=32, interpret=True, bb=1)[:, :N]
        # different q_chunk values regroup the f32 accumulations, so allow
        # float-epsilon-scale differences; a real key leak would be O(1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16_close(self):
        C, heads, N = 128, 2, 32
        blk, v = _block_params(C, heads, key=7)
        x = jnp.asarray(r.standard_normal((2, N, C)), jnp.float32)
        want = np.asarray(blk.apply(v, x))
        got = np.asarray(
            fused_vit_block(
                x.astype(jnp.bfloat16), v["params"], None, num_heads=heads,
                q_chunk=16, mm_dtype=jnp.bfloat16, interpret=True, bb=1,
            ).astype(jnp.float32)
        )
        cos = (got * want).sum() / (
            np.linalg.norm(got) * np.linalg.norm(want)
        )
        assert cos > 0.999, cos


class TestFusedForwards:
    def test_mae_forward_feature(self):
        # tiny ViT-S-shaped config: 16x16 img, patch 4 -> 16+1 tokens
        cfg = MAEConfig(img_size=(16, 16), patch_size=4, embed_dim=128,
                        depth=2, num_heads=2, decoder_depth=2)
        model = MaskedAutoencoderViT(cfg)
        x = jnp.asarray(r.standard_normal((2, 16, 16)), jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            x[:1],
        )
        want = model.apply(v, x, method=MaskedAutoencoderViT.forward_feature)
        got = mae_forward_feature_fused(v, x, cfg, q_chunk=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_audiomae_backbone(self):
        cfg = MAEConfig(img_size=(64, 32), patch_size=8, embed_dim=128,
                        depth=2, num_heads=2, decoder_depth=2)
        model = AudioMAEClassifierBackbone(cfg)
        x = jnp.asarray(r.standard_normal((2, 48, 32)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x[:1])
        want = model.apply(v, x)
        got = audiomae_backbone_fused(v, x, cfg, q_chunk=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


def test_fast_softmax_parity():
    """fast_softmax (no rowwise max pass) must match the stabilized kernel to
    float noise on LN-bounded activations, including exact zeros on masked
    (padded) key columns — the -1e9 mask exp-underflows identically."""
    from heart_murmur_detection_tpu.models.vit_mae import MAEConfig, MaskedAutoencoderViT
    from heart_murmur_detection_tpu.models.vit_fused import mae_forward_feature_fused

    rr = np.random.default_rng(7)
    cfg = MAEConfig(img_size=(16, 16), patch_size=4, embed_dim=128,
                    depth=2, num_heads=2, decoder_depth=2)
    model = MaskedAutoencoderViT(cfg)
    x = jnp.asarray(rr.standard_normal((2, 16, 16)), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        x[:1],
    )
    slow = mae_forward_feature_fused(v, x, cfg, q_chunk=16, interpret=True)
    fast = mae_forward_feature_fused(v, x, cfg, q_chunk=16, interpret=True,
                                     fast_softmax=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-5)
