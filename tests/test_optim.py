"""Layer-wise LR decay + LARS (mae_utils/lr_decay.py, lars.py) vs torch."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.train import optim


class TestLayerwiseDecay:
    def test_layer_ids(self):
        assert optim.vit_layer_id(["cls_token"], 5) == 0
        assert optim.vit_layer_id(["patch_embed_proj"], 5) == 0
        assert optim.vit_layer_id(["blocks_0"], 5) == 1
        assert optim.vit_layer_id(["blocks_3"], 5) == 4
        assert optim.vit_layer_id(["norm"], 5) == 5

    def test_scales_applied(self):
        import jax.numpy as jnp

        params = {
            "cls_token": jnp.ones((1, 1, 4)),
            "blocks_0": {"w": jnp.ones((4, 4))},
            "blocks_1": {"w": jnp.ones((4, 4))},
            "head": {"w": jnp.ones((4, 2))},
        }
        tx = optim.layerwise_lr_decay(params, num_blocks=2, layer_decay=0.5)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        upd, _ = tx.update(grads, state)
        num_layers = 3
        # cls at layer 0 -> 0.5**3; blocks_0 -> 0.5**2; blocks_1 -> 0.5**1; head -> 0.5**0
        assert float(upd["cls_token"][0, 0, 0]) == pytest.approx(0.5**num_layers)
        assert float(upd["blocks_0"]["w"][0, 0]) == pytest.approx(0.25)
        assert float(upd["blocks_1"]["w"][0, 0]) == pytest.approx(0.5)
        assert float(upd["head"]["w"][0, 0]) == pytest.approx(1.0)


import jax  # noqa: E402


class TestLars:
    def test_matches_torch_reference_semantics(self):
        import jax.numpy as jnp

        torch = pytest.importorskip("torch")

        r = np.random.default_rng(0)
        w = r.standard_normal((4, 3)).astype(np.float32)
        b = r.standard_normal(3).astype(np.float32)
        gw = r.standard_normal((4, 3)).astype(np.float32)
        gb = r.standard_normal(3).astype(np.float32)
        lr, wd, m, tc = 0.1, 0.01, 0.9, 0.001

        # torch-style single step (lars.py:33-61)
        def torch_step(p, g, mu, nd):
            p = torch.tensor(p.copy())
            g = torch.tensor(g.copy())
            mu = torch.tensor(mu.copy())
            if nd > 1:
                g = g + wd * p
                q = (tc * p.norm() / g.norm()).item()
                g = g * q
            mu = m * mu + g
            p = p - lr * mu
            return p.numpy(), mu.numpy()

        params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
        tx = optim.lars(lr, momentum=m, weight_decay=wd, trust_coefficient=tc)
        state = tx.init(params)
        for _ in range(2):
            upd, state = tx.update(grads, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)

        pw, muw = torch_step(w, gw, np.zeros_like(w), 2)
        pw, _ = torch_step(pw, gw, muw, 2)
        pb, mub = torch_step(b, gb, np.zeros_like(b), 1)
        pb, _ = torch_step(pb, gb, mub, 1)
        np.testing.assert_allclose(np.asarray(params["w"]), pw, atol=1e-6)
        np.testing.assert_allclose(np.asarray(params["b"]), pb, atol=1e-6)
