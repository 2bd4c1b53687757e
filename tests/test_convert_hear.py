"""HeAR HF-ViT conversion: fused qkv mapping parity vs separate torch q/k/v."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heart_murmur_detection_tpu.extract.convert import convert_hear_vit  # noqa: E402
from heart_murmur_detection_tpu.models.vit_mae import ViTBlock  # noqa: E402


def test_hf_qkv_fusion_matches_torch():
    import jax.numpy as jnp
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(0)
    dim, heads = 64, 4

    q = tnn.Linear(dim, dim)
    k = tnn.Linear(dim, dim)
    v = tnn.Linear(dim, dim)
    proj = tnn.Linear(dim, dim)
    ln1 = tnn.LayerNorm(dim, eps=1e-6)
    ln2 = tnn.LayerNorm(dim, eps=1e-6)
    fc1 = tnn.Linear(dim, dim * 4)
    fc2 = tnn.Linear(dim * 4, dim)

    def torch_block(x):
        h = ln1(x)
        B, N, C = h.shape
        hd = C // heads

        def split(t):
            return t.view(B, N, heads, hd).permute(0, 2, 1, 3)

        qq, kk, vv = split(q(h)), split(k(h)), split(v(h))
        a = (qq * hd**-0.5) @ kk.transpose(-2, -1)
        a = a.softmax(-1)
        o = (a @ vv).permute(0, 2, 1, 3).reshape(B, N, C)
        x = x + proj(o)
        return x + fc2(F.gelu(fc1(ln2(x))))

    # HF-style state dict for one layer
    sd = {
        "embeddings.cls_token": np.zeros((1, 1, dim), np.float32),
        "embeddings.position_embeddings": np.zeros((1, 97, dim), np.float32),
        "embeddings.patch_embeddings.projection.weight": np.zeros(
            (dim, 1, 16, 16), np.float32
        ),
        "embeddings.patch_embeddings.projection.bias": np.zeros(dim, np.float32),
        "layernorm.weight": np.ones(dim, np.float32),
        "layernorm.bias": np.zeros(dim, np.float32),
    }
    layer = {
        "attention.attention.query.weight": q.weight,
        "attention.attention.query.bias": q.bias,
        "attention.attention.key.weight": k.weight,
        "attention.attention.key.bias": k.bias,
        "attention.attention.value.weight": v.weight,
        "attention.attention.value.bias": v.bias,
        "attention.output.dense.weight": proj.weight,
        "attention.output.dense.bias": proj.bias,
        "layernorm_before.weight": ln1.weight,
        "layernorm_before.bias": ln1.bias,
        "layernorm_after.weight": ln2.weight,
        "layernorm_after.bias": ln2.bias,
        "intermediate.dense.weight": fc1.weight,
        "intermediate.dense.bias": fc1.bias,
        "output.dense.weight": fc2.weight,
        "output.dense.bias": fc2.bias,
    }
    for kk_, vv_ in layer.items():
        sd[f"encoder.layer.0.{kk_}"] = vv_.detach().numpy()

    variables = convert_hear_vit(sd, depth=1)
    x = np.random.default_rng(1).standard_normal((2, 10, dim)).astype(np.float32)
    with torch.no_grad():
        want = torch_block(torch.tensor(x)).numpy()
    blk = ViTBlock(dim, heads)
    got = np.asarray(blk.apply({"params": variables["params"]["blocks_0"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
