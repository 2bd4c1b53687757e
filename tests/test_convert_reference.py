"""Conversion parity against the REFERENCE'S OWN torch classes (not the
independently-written tests/torch_mini oracles): random-init the reference
models at real dims, convert their state_dicts with extract/convert.py, and
assert the flax models reproduce the same outputs.

Oracles: HTSAT_Swin_Transformer via Cola(encoder='htsat')
(reference htsat.py:492-984, models_cola.py:75-196) and
MaskedAutoencoderViTMD via mae_vit_small at OPERA-GT dims
(models_mae.py:555-1170, model_util.py:191-211). Third-party imports the
eval forwards never execute are stubbed in tests/ref_oracle.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heart_murmur_detection_tpu.extract import convert  # noqa: E402
from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig  # noqa: E402
from heart_murmur_detection_tpu.models.vit_mae import (  # noqa: E402
    MaskedAutoencoderViT,
    mae_vit_small_config,
)
from tests.ref_oracle import (  # noqa: E402
    load_reference_cola_htsat,
    load_reference_mae_gt,
)


@pytest.fixture(scope="module")
def ref_cola():
    torch.manual_seed(0)
    m = load_reference_cola_htsat().eval()
    with torch.no_grad():
        m.encoder.encoder.htsat.bn0.running_mean.normal_(0, 0.5)
        m.encoder.encoder.htsat.bn0.running_var.uniform_(0.5, 2.0)
    return m


@pytest.fixture(scope="module")
def ref_mae():
    torch.manual_seed(1)
    return load_reference_mae_gt().eval()


class TestReferenceColaHTSAT:
    def test_latent_768_parity(self, ref_cola):
        sd = {k: v.numpy() for k, v in ref_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)
        r = np.random.default_rng(0)
        mel = r.random((2, 251, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref_cola.extract_feature(torch.tensor(mel), dim=768).numpy()
        model = Cola(ColaConfig(encoder="htsat"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 768, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_projected_512_parity(self, ref_cola):
        sd = {k: v.numpy() for k, v in ref_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)
        r = np.random.default_rng(1)
        mel = r.random((1, 180, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref_cola.extract_feature(torch.tensor(mel), dim=512).numpy()
        model = Cola(ColaConfig(encoder="htsat"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 512, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_training_forward_pair_parity(self, ref_cola):
        """Full COLA projector path incl. the bilinear `linear` layer
        (models_cola.py:148-163 similarity inputs): z1 carries linear, z2
        does not; dropout inert in eval."""
        sd = {k: v.numpy() for k, v in ref_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)
        r = np.random.default_rng(2)
        x1 = r.random((2, 251, 64)).astype(np.float32)
        x2 = r.random((2, 251, 64)).astype(np.float32)
        with torch.no_grad():
            w1, w2 = ref_cola((torch.tensor(x1), torch.tensor(x2)))
        model = Cola(ColaConfig(encoder="htsat"))
        g1, g2 = model.apply(
            variables, (jnp.asarray(x1), jnp.asarray(x2)), train=False
        )
        np.testing.assert_allclose(np.asarray(g1), w1.numpy(), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g2), w2.numpy(), atol=1e-3, rtol=1e-3)


class TestReferenceMAEGT:
    def test_forward_feature_parity(self, ref_mae):
        sd = {k: v.numpy() for k, v in ref_mae.state_dict().items()}
        variables = convert.convert_mae(sd)
        r = np.random.default_rng(3)
        mel = r.random((2, 256, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref_mae.forward_feature(torch.tensor(mel)).numpy()
        model = MaskedAutoencoderViT(mae_vit_small_config())
        got = np.asarray(
            model.apply(
                variables,
                jnp.asarray(mel),
                method=MaskedAutoencoderViT.forward_feature,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_forward_feature_short_clip(self, ref_mae):
        """Shorter-than-256-frame input slices the pos embed
        (models_mae.py:964 pos-embed slicing path)."""
        sd = {k: v.numpy() for k, v in ref_mae.state_dict().items()}
        variables = convert.convert_mae(sd)
        r = np.random.default_rng(4)
        mel = r.random((1, 128, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref_mae.forward_feature(torch.tensor(mel)).numpy()
        model = MaskedAutoencoderViT(mae_vit_small_config())
        got = np.asarray(
            model.apply(
                variables,
                jnp.asarray(mel),
                method=MaskedAutoencoderViT.forward_feature,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
