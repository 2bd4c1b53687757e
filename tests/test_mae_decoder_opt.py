"""Parity of the TPU-shaped MAE decoder (models/mae_decoder_opt) against the
flax SwinV2CRBlock decoder (models/vit_mae.forward_decoder): packed-window
cosine attention, normalize-first + tau folding, block-diag bias/mask — same
math, TPU-shaped tensors. Forward AND parameter gradients must match at f32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.mae_decoder_opt import decoder_forward_opt
from heart_murmur_detection_tpu.models.vit_mae import MaskedAutoencoderViT
from tests.test_pretrain import TINY_MAE


def _setup(cfg, B=2, seed=0):
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1,) + cfg.img_size), rng=rng)
    params = variables["params"]
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B,) + cfg.img_size), jnp.float32)
    h, mask, ids = model.apply(
        {"params": params}, x, jax.random.PRNGKey(1), cfg.mask_ratio,
        method=model.forward_encoder,
    )
    return model, params, h, ids


def test_decoder_opt_forward_matches_flax():
    model, params, h, ids = _setup(TINY_MAE)
    ref = model.apply({"params": params}, h, ids, method=model.forward_decoder)
    opt = decoder_forward_opt(params, h, ids, TINY_MAE, mm_dtype=jnp.float32)
    assert opt.shape == ref.shape
    np.testing.assert_allclose(np.asarray(opt), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_decoder_opt_grads_match_flax():
    model, params, h, ids = _setup(TINY_MAE)

    def loss_ref(p):
        return (model.apply({"params": p}, h, ids,
                            method=model.forward_decoder) ** 2).mean()

    def loss_opt(p):
        return (decoder_forward_opt(p, h, ids, TINY_MAE,
                                    mm_dtype=jnp.float32) ** 2).mean()

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lo, go = jax.value_and_grad(loss_opt)(params)
    np.testing.assert_allclose(float(lo), float(lr), rtol=1e-5)
    # only decoder-side params receive gradients from this loss
    for key in [k for k in gr if "decoder" in k or k == "mask_token"]:
        ra = jax.tree.leaves(gr[key])
        oa = jax.tree.leaves(go[key])
        for a, b in zip(ra, oa):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            )


def test_decoder_opt_gt_geometry():
    """Production operaGT geometry (grid 64x16, window (4,4) -> 8-window
    packing, shift (2,0) masks) at B=1, forward-only."""
    cfg = dataclasses.replace(
        TINY_MAE, img_size=(256, 64), decoder_embed_dim=32,
        decoder_depth=2, decoder_num_heads=4, decoder_window=(4, 4),
        decoder_shift=(2, 0),
    )
    model, params, h, ids = _setup(cfg, B=1, seed=3)
    ref = model.apply({"params": params}, h, ids, method=model.forward_decoder)
    opt = decoder_forward_opt(params, h, ids, cfg, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_decoder_opt_variable_length():
    """Multi-corpus CP feeds shorter token counts: H is derived from the
    actual L (the flax block does the same L // W)."""
    cfg = TINY_MAE
    model, params, _, _ = _setup(cfg)
    # half-length input: L=16 tokens over the (., 4) freq grid
    r = np.random.default_rng(5)
    x = jnp.asarray(
        r.standard_normal((2, cfg.img_size[0] // 2, cfg.img_size[1])),
        jnp.float32,
    )
    h, mask, ids = model.apply(
        {"params": params}, x, jax.random.PRNGKey(2), cfg.mask_ratio,
        method=model.forward_encoder,
    )
    ref = model.apply({"params": params}, h, ids, method=model.forward_decoder)
    opt = decoder_forward_opt(params, h, ids, cfg, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
