"""MAE swin-v2-cr decoder block conversion parity vs the torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heart_murmur_detection_tpu.extract import convert  # noqa: E402
from heart_murmur_detection_tpu.models.vit_mae import SwinV2CRBlock  # noqa: E402
from tests.torch_mini.swin_decoder_eval import SwinV2CRBlockEval  # noqa: E402


@pytest.mark.parametrize("shift", [(0, 0), (2, 0)])
def test_decoder_block_parity(shift):
    import jax.numpy as jnp

    torch.manual_seed(0)
    dim, heads, feat, window = 32, 4, (8, 4), (4, 4)
    tblk = SwinV2CRBlockEval(dim, heads, feat, window, shift).eval()
    with torch.no_grad():
        tblk.attn.tau.uniform_(0.3, 1.5)

    # convert via the decoder path of convert_mae
    sd = {f"decoder_blocks.0.{k}": v.numpy() for k, v in tblk.state_dict().items()}
    params = {}
    tp, fp = "decoder_blocks.0.", "decoder_blocks_0"
    convert._linear(sd, tp + "attn.qkv", params, (fp, "attn", "qkv"))
    convert._linear(sd, tp + "attn.proj", params, (fp, "attn", "proj"))
    convert._linear(sd, tp + "attn.meta_mlp.fc1", params, (fp, "attn", "meta_fc1"))
    convert._linear(sd, tp + "attn.meta_mlp.fc2", params, (fp, "attn", "meta_fc2"))
    convert._set(params, (fp, "attn", "tau"), sd[tp + "attn.tau"])
    convert._ln(sd, tp + "norm1", params, (fp, "norm1"))
    convert._ln(sd, tp + "norm2", params, (fp, "norm2"))
    convert._linear(sd, tp + "mlp.fc1", params, (fp, "mlp_fc1"))
    convert._linear(sd, tp + "mlp.fc2", params, (fp, "mlp_fc2"))

    r = np.random.default_rng(0)
    x = r.standard_normal((2, feat[0] * feat[1], dim)).astype(np.float32)
    with torch.no_grad():
        want = tblk(torch.tensor(x)).numpy()

    blk = SwinV2CRBlock(dim, heads, feat_size=feat, window=window, shift=shift)
    got = np.asarray(blk.apply({"params": params[fp]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
