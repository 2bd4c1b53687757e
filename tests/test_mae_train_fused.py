"""End-to-end parity of the fused MAE training loss (models/mae_train_fused)
against MaskedAutoencoderViT.apply — loss and EVERY gradient (encoder blocks,
patch embed, cls token, decoder tree) in interpret mode, f32.

The fused path replicates random_masking's RNG draw exactly, so the two
losses use identical masks and are comparable to the fused-kernel precision
class (~1e-4 at f32 interpret). Mirrors tests/test_htsat_train_fused.py for
the COLA/HTS-AT family. Reference objective:
/root/reference/src/pretrain/mae_training.py:141-368.
"""

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.mae_train_fused import mae_train_loss_fused
from heart_murmur_detection_tpu.models.vit_mae import MAEConfig, MaskedAutoencoderViT


def _tiny_cfg(**kw):
    base = dict(
        img_size=(32, 16),
        patch_size=4,
        embed_dim=128,
        depth=2,
        num_heads=4,
        decoder_embed_dim=64,
        decoder_depth=2,
        decoder_num_heads=4,
        mask_ratio=0.5,
        decoder_window=(2, 2),
        decoder_shift=(1, 0),
    )
    base.update(kw)
    return MAEConfig(**base)


def _setup(cfg, seed=0):
    model = MaskedAutoencoderViT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2,) + cfg.img_size)
    params = model.init(jax.random.PRNGKey(1), x, rng=jax.random.PRNGKey(2))[
        "params"
    ]
    return model, params, x


def test_mae_loss_and_grads_match():
    cfg = _tiny_cfg()
    model, params, x = _setup(cfg)
    rng = jax.random.PRNGKey(7)

    def loss_ref(p):
        return model.apply({"params": p}, x, rng=rng)[0]

    def loss_fused(p):
        return mae_train_loss_fused(model, p, x, rng, interpret=True)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_fused, g_fused = jax.value_and_grad(loss_fused)(params)

    np.testing.assert_allclose(float(l_fused), float(l_ref), atol=1e-4, rtol=1e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    assert len(flat_ref) == len(flat_fused)
    for (path_r, a), (path_f, b) in zip(flat_ref, flat_fused):
        assert path_r == path_f
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3, err_msg=str(path_r)
        )


def test_mae_loss_norm_pix():
    """norm_pix_loss branch (audiomae config uses it in the reference CP)."""
    cfg = _tiny_cfg(norm_pix_loss=True)
    model, params, x = _setup(cfg, seed=3)
    rng = jax.random.PRNGKey(11)
    l_ref = model.apply({"params": params}, x, rng=rng)[0]
    l_fused = mae_train_loss_fused(model, params, x, rng, interpret=True)
    np.testing.assert_allclose(float(l_fused), float(l_ref), atol=1e-4, rtol=1e-4)


def test_audiomae_backbone_fused_matches():
    """Fused audiomae FT backbone (audiomae_backbone_train_fused) vs
    AudioMAEClassifierBackbone.apply — feature and all grads, tiny ViT-B-like
    config, interpret mode."""
    import dataclasses

    from heart_murmur_detection_tpu.models.mae_train_fused import (
        audiomae_backbone_train_fused,
    )
    from heart_murmur_detection_tpu.models.vit_mae import (
        AudioMAEClassifierBackbone,
        audiomae_base_config,
    )

    cfg = dataclasses.replace(
        audiomae_base_config(),
        img_size=(64, 32),
        patch_size=8,
        embed_dim=128,
        depth=2,
        num_heads=4,
    )
    model = AudioMAEClassifierBackbone(cfg)
    # shorter-than-img input exercises the pad branch
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    f_ref = model.apply({"params": params}, x, train=True)
    f_fused = audiomae_backbone_train_fused(params, x, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(f_fused), np.asarray(f_ref), atol=2e-4, rtol=2e-4
    )

    w = jnp.arange(f_ref.size, dtype=jnp.float32).reshape(f_ref.shape) / f_ref.size
    g_ref = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x, train=True) * w))(params)
    g_fused = jax.grad(
        lambda p: jnp.sum(audiomae_backbone_train_fused(p, x, cfg, interpret=True) * w)
    )(params)
    for (pr, a), (pf, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        assert pr == pf
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3, err_msg=str(pr)
        )


def test_mae_train_step_fused_runs():
    """One optimizer step through steps.make_mae_train_step with the fused
    loss_fn override — finite loss, params update."""
    import optax

    from heart_murmur_detection_tpu.pretrain import steps

    cfg = _tiny_cfg()
    model, params, x = _setup(cfg, seed=5)
    tx = optax.adam(1e-4)
    loss_fn = lambda p, xx, r: mae_train_loss_fused(model, p, xx, r, interpret=True)
    step = steps.make_mae_train_step(model, tx, loss_fn=loss_fn)
    opt_state = tx.init(params)
    before = jax.tree_util.tree_map(np.asarray, params)  # step donates params
    new_params, _, loss = step(params, opt_state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), new_params, before
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_gt_backbone_fused_matches():
    """gt_backbone_train_fused vs GTBackbone.apply (MAE forward_feature) —
    feature and gradients, tiny config, interpret mode."""
    from heart_murmur_detection_tpu.models.mae_train_fused import (
        gt_backbone_train_fused,
    )
    from heart_murmur_detection_tpu.train.finetune import GTBackbone

    cfg = _tiny_cfg()
    model = GTBackbone(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2,) + cfg.img_size)
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    f_ref = model.apply({"params": params}, x, train=True)
    f_fused = gt_backbone_train_fused(params["mae"], x, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(f_fused), np.asarray(f_ref), atol=2e-4, rtol=2e-4
    )

    w = jnp.arange(f_ref.size, dtype=jnp.float32).reshape(f_ref.shape) / f_ref.size
    g_ref = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x, train=True) * w)
    )(params)["mae"]
    g_fused = jax.grad(
        lambda p: jnp.sum(gt_backbone_train_fused(p, x, cfg, interpret=True) * w)
    )(params["mae"])
    for (pr, a), (pf, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        assert pr == pf
        # decoder leaves get zero cotangent both ways; encoder leaves match
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3, err_msg=str(pr)
        )
