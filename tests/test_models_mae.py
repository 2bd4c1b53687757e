"""MAE ViT family: shapes, masking invariants, loss, AudioMAE backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.vit_mae import (
    AudioMAEClassifierBackbone,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
    sincos_pos_embed_flexible,
)


@pytest.fixture(scope="module")
def gt_model():
    model = MaskedAutoencoderViT(mae_vit_small_config())
    x = jnp.zeros((1, 256, 64))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}, x
    )
    return model, variables


class TestOperaGT:
    def test_train_forward(self, gt_model):
        model, variables = gt_model
        x = jnp.asarray(np.random.default_rng(0).random((2, 256, 64)), jnp.float32)
        loss, pred, mask = model.apply(
            variables, x, rngs={"masking": jax.random.PRNGKey(2)}
        )
        assert pred.shape == (2, 1024, 16)  # 64x16 patches, p^2=16 pixels
        assert mask.shape == (2, 1024)
        # mask ratio 0.7 -> exactly L - int(L*0.3) masked
        assert int(mask.sum()) == 2 * (1024 - int(1024 * 0.3))
        assert np.isfinite(float(loss))

    def test_forward_feature(self, gt_model):
        model, variables = gt_model
        x = jnp.ones((3, 256, 64))
        f = model.apply(variables, x, method=MaskedAutoencoderViT.forward_feature)
        assert f.shape == (3, 384)

    def test_masked_loss_ignores_visible(self, gt_model):
        """Loss only counts masked patches: perturbing a kept patch's target
        must not change loss when pred is compared on masked set only."""
        model, variables = gt_model
        rng = jax.random.PRNGKey(3)
        x = jnp.asarray(np.random.default_rng(1).random((1, 256, 64)), jnp.float32)
        loss1, pred, mask = model.apply(variables, x, rngs={"masking": rng})
        # recompute loss manually
        target = model.apply(variables, x, method=MaskedAutoencoderViT.patchify)
        manual = (((pred - target) ** 2).mean(-1) * mask).sum() / mask.sum()
        np.testing.assert_allclose(float(loss1), float(manual), rtol=1e-5)

    def test_patchify_roundtrip(self, gt_model):
        model, variables = gt_model
        x = jnp.asarray(np.random.default_rng(2).random((1, 256, 64)), jnp.float32)
        t = model.apply(variables, x, method=MaskedAutoencoderViT.patchify)
        back = model.apply(variables, t, method=MaskedAutoencoderViT.unpatchify)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


class TestAudioMAE:
    def test_backbone_pads_and_pools(self):
        model = AudioMAEClassifierBackbone(audiomae_base_config())
        x = jnp.ones((1, 998, 128))  # 10s fbank is 998 frames
        variables = model.init(jax.random.PRNGKey(0), x)
        f = model.apply(variables, x)
        assert f.shape == (1, 768)
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert 85e6 < n < 90e6, n  # ViT-B

    def test_pos_embed_reference_convention(self):
        # grid (W//p, H//p): first half of dims encodes the *fast* axis index
        emb = sincos_pos_embed_flexible(8, (2, 3), cls_token=True)
        assert emb.shape == (7, 8)
        assert (emb[0] == 0).all()  # cls row zero
        body = emb[1:]
        # rows i=a*3+b: first 4 dims from b (w), last 4 from a (h)
        np.testing.assert_allclose(body[0][:4], body[3][:4], atol=1e-7)  # same b=0
        assert not np.allclose(body[0][4:], body[3][4:])  # different a


def test_mae_variable_length_input():
    """Multi-corpus CP feeds per-corpus max_len; the decoder grid must follow
    the actual token count (the reference hard-codes feat_size + a
    view(B,H,W,L) hack instead, models_mae.py:663)."""
    import jax
    import jax.numpy as jnp

    from tests.test_pretrain import TINY_MAE

    model = MaskedAutoencoderViT(TINY_MAE)
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    v = model.init(rngs, jnp.zeros((1,) + TINY_MAE.img_size))
    # half-length input: (16, 16) vs img_size (32, 16)
    short = jnp.zeros((2, TINY_MAE.img_size[0] // 2, TINY_MAE.img_size[1]))
    loss, pred, mask = model.apply(
        v, short, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert pred.shape[1] == mask.shape[1]  # tokens of the SHORT input
    assert bool(jnp.isfinite(loss))


def test_attn_impl_auto_is_xla_on_cpu():
    """attn_impl='auto' must resolve to the einsum path off-TPU (the flash
    kernel only lowers for TPU); outputs identical to an explicit 'xla'."""
    import numpy as np

    from heart_murmur_detection_tpu.models.vit_mae import (
        MaskedAutoencoderViT,
        mae_vit_small_config,
    )

    x = np.random.default_rng(0).random((2, 256, 64)).astype(np.float32)
    ma = MaskedAutoencoderViT(mae_vit_small_config(depth=2, attn_impl="auto"))
    mx = MaskedAutoencoderViT(mae_vit_small_config(depth=2, attn_impl="xla"))
    v = ma.init({"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}, x)
    ya = ma.apply(v, x, method=MaskedAutoencoderViT.forward_feature)
    yx = mx.apply(v, x, method=MaskedAutoencoderViT.forward_feature)
    assert np.array_equal(np.asarray(ya), np.asarray(yx))
