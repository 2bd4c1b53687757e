"""Checkpoint conversion parity: a randomly-initialized independent torch
HTS-AT/COLA (tests/torch_mini) produces a reference-layout state_dict; the
converter maps it to flax; both models must produce the same features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heart_murmur_detection_tpu.extract import convert  # noqa: E402
from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig  # noqa: E402
from tests.torch_mini.htsat_eval import ColaHTSATEval  # noqa: E402


@pytest.fixture(scope="module")
def torch_cola():
    torch.manual_seed(0)
    m = ColaHTSATEval().eval()
    # randomize BN running stats so conversion of batch_stats is actually tested
    with torch.no_grad():
        m.encoder.encoder.htsat.bn0.running_mean.normal_(0, 0.5)
        m.encoder.encoder.htsat.bn0.running_var.uniform_(0.5, 2.0)
    return m


class TestColaHTSATConversion:
    def test_latent_parity(self, torch_cola):
        sd = {k: v.numpy() for k, v in torch_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)

        r = np.random.default_rng(0)
        mel = r.random((2, 251, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_cola.extract_feature(torch.tensor(mel), dim=768).numpy()

        model = Cola(ColaConfig(encoder="htsat"))
        got = np.asarray(
            model.apply(
                variables, jnp.asarray(mel), 768, method=Cola.extract_feature
            )
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    def test_projected_512_parity(self, torch_cola):
        sd = {k: v.numpy() for k, v in torch_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)
        r = np.random.default_rng(1)
        mel = r.random((1, 251, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_cola.extract_feature(torch.tensor(mel), dim=512).numpy()
        model = Cola(ColaConfig(encoder="htsat"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 512, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    def test_short_clip_parity(self, torch_cola):
        """64-frame FT-style input exercises the bicubic up-interp path."""
        sd = {k: v.numpy() for k, v in torch_cola.state_dict().items()}
        variables = convert.convert_cola_htsat(sd)
        r = np.random.default_rng(2)
        mel = r.random((1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_cola.extract_feature(torch.tensor(mel), dim=768).numpy()
        model = Cola(ColaConfig(encoder="htsat"))
        got = np.asarray(
            model.apply(variables, jnp.asarray(mel), 768, method=Cola.extract_feature)
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


class TestViTConversion:
    def test_audiomae_backbone_parity(self):
        """Independent torch ViT block stack vs flax after conversion."""
        import torch.nn as tnn

        class TorchViTBlock(tnn.Module):
            def __init__(self, dim, heads):
                super().__init__()
                self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
                attn = tnn.Module()
                attn.qkv = tnn.Linear(dim, dim * 3)
                attn.proj = tnn.Linear(dim, dim)
                self.attn = attn
                self.heads = heads
                self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
                mlp = tnn.Module()
                mlp.fc1 = tnn.Linear(dim, dim * 4)
                mlp.fc2 = tnn.Linear(dim * 4, dim)
                self.mlp = mlp

            def forward(self, x):
                B, N, C = x.shape
                h = self.norm1(x)
                qkv = (
                    self.attn.qkv(h)
                    .reshape(B, N, 3, self.heads, C // self.heads)
                    .permute(2, 0, 3, 1, 4)
                )
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = ((q * (C // self.heads) ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
                h = (a @ v).transpose(1, 2).reshape(B, N, C)
                x = x + self.attn.proj(h)
                h = self.norm2(x)
                return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))

        torch.manual_seed(1)
        dim, heads, depth = 64, 4, 2
        blocks = tnn.ModuleList([TorchViTBlock(dim, heads) for _ in range(depth)])
        sd = {}
        for i, b in enumerate(blocks):
            for k, v in b.state_dict().items():
                sd[f"blocks.{i}.{k}"] = v.numpy()

        from heart_murmur_detection_tpu.models.vit_mae import ViTBlock

        params = {}
        for i in range(depth):
            convert._vit_block(sd, f"blocks.{i}.", params, f"blocks_{i}")

        x = np.random.default_rng(3).standard_normal((2, 10, dim)).astype(np.float32)
        with torch.no_grad():
            want = torch.tensor(x)
            for b in blocks:
                want = b(want)
            want = want.numpy()

        got = jnp.asarray(x)
        for i in range(depth):
            blk = ViTBlock(dim, heads)
            got = blk.apply({"params": params[f"blocks_{i}"]}, got)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
