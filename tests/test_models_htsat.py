"""HTS-AT / COLA / EfficientNet: shapes, jit, masking invariance, param census."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig, cola_loss
from heart_murmur_detection_tpu.models.efficientnet import ColaEfficientNetEncoder
from heart_murmur_detection_tpu.models.htsat import HTSAT, HTSATConfig


@pytest.fixture(scope="module")
def htsat_vars():
    model = HTSAT(HTSATConfig())
    x = jnp.zeros((1, 251, 64))
    return model, model.init(jax.random.PRNGKey(0), x)


class TestHTSAT:
    def test_output_shapes(self, htsat_vars):
        model, variables = htsat_vars
        x = jnp.asarray(np.random.default_rng(0).random((2, 251, 64)), jnp.float32)
        out = model.apply(variables, x)
        assert out["latent_output"].shape == (2, 768)
        assert out["clipwise_output"].shape == (2, 527)
        assert out["framewise_output"].shape == (2, 1024, 527)
        assert np.isfinite(np.asarray(out["latent_output"])).all()

    def test_param_count_matches_reference_arch(self, htsat_vars):
        # HTS-AT tiny: ~28.8M trainable params (swin-tiny + tscam head)
        _, variables = htsat_vars
        n = sum(x.size for x in jax.tree.leaves(variables["params"]))
        assert 27e6 < n < 32e6, f"param count {n}"

    def test_padding_invariance(self, htsat_vars):
        """Batched padded input + n_frames must equal unpadded single input."""
        model, variables = htsat_vars
        r = np.random.default_rng(1)
        mel = r.random((1, 251, 64)).astype(np.float32)
        out_a = model.apply(variables, jnp.asarray(mel))["latent_output"]
        melp = np.zeros((1, 512, 64), np.float32)
        melp[:, :251] = mel
        # poison the padded region: must not leak through
        melp[:, 251:] = 777.0
        out_b = model.apply(
            variables, jnp.asarray(melp), n_frames=jnp.array([251], jnp.int32)
        )["latent_output"]
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=1e-4, rtol=1e-4
        )

    def test_jit_and_batch(self, htsat_vars):
        model, variables = htsat_vars
        f = jax.jit(lambda v, x: model.apply(v, x)["latent_output"])
        out = f(variables, jnp.ones((4, 251, 64)))
        assert out.shape == (4, 768)
        # all rows identical for identical inputs
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(out[3]), atol=1e-5
        )


class TestColaHTSAT:
    def test_pair_forward_and_loss(self):
        model = Cola(ColaConfig(encoder="htsat"))
        x1 = jnp.ones((2, 64, 64))
        x2 = jnp.ones((2, 64, 64)) * 0.5
        variables = model.init(jax.random.PRNGKey(0), (x1, x2))
        z1, z2 = model.apply(variables, (x1, x2))
        assert z1.shape == (2, 512) and z2.shape == (2, 512)
        loss, acc = cola_loss(z1, z2)
        assert np.isfinite(float(loss))

    def test_extract_feature_dims(self):
        model = Cola(ColaConfig(encoder="htsat"))
        x = jnp.ones((1, 64, 64))
        variables = model.init(jax.random.PRNGKey(0), (x, x))
        for dim in (768, 512):
            f = model.apply(variables, x, dim, method=Cola.extract_feature)
            assert f.shape == (1, dim)


class TestEfficientNet:
    def test_cola_ce_encoder(self):
        enc = ColaEfficientNetEncoder()
        x = jnp.ones((2, 251, 64))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (2, 1280)
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        # efficientnet-b0 headless ~4.0M + stem conv
        assert 3.8e6 < n < 4.5e6, n
