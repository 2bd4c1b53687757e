"""OPERA-CE (Cola + EfficientNet-B0) conversion parity vs the independent
torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heart_murmur_detection_tpu.extract import convert  # noqa: E402
from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig  # noqa: E402
from tests.torch_mini.efficientnet_eval import ColaCEEval  # noqa: E402


@pytest.fixture(scope="module")
def torch_ce():
    torch.manual_seed(0)
    m = ColaCEEval().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.6, 1.5)
    return m


class TestColaCEConversion:
    def test_feature_parity_1280(self, torch_ce):
        sd = {k: v.numpy() for k, v in torch_ce.state_dict().items()}
        variables = convert.convert_cola_efficientnet(sd)
        r = np.random.default_rng(0)
        mel = r.random((2, 251, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_ce.extract_feature(torch.tensor(mel), 1280).numpy()
        model = Cola(ColaConfig(encoder="efficientnet"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 1280, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_feature_parity_512(self, torch_ce):
        sd = {k: v.numpy() for k, v in torch_ce.state_dict().items()}
        variables = convert.convert_cola_efficientnet(sd)
        r = np.random.default_rng(1)
        mel = r.random((1, 128, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_ce.extract_feature(torch.tensor(mel), 512).numpy()
        model = Cola(ColaConfig(encoder="efficientnet"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 512, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
