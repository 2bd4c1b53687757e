"""End-to-end parity of the fused training forward (models/htsat_train_fused)
vs Cola.apply(train=True): loss, every parameter gradient, and the chained
bn0 running-stat updates — dropout/droppath rates zeroed so both paths are
deterministic; fused kernels in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig, cola_loss
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_train_fused import cola_train_apply

TINY = HTSATConfig(
    spec_size=64,
    patch_size=4,
    embed_dim=16,
    depths=(2, 1, 1, 1),  # stage 0 includes one SHIFTED block
    num_heads=(2, 2, 2, 2),
    window_size=2,
    mel_bins=16,
    enable_tscam=False,
    drop_path_rate=0.0,
)


def _setup():
    model = Cola(ColaConfig(encoder="htsat", p=0.0), htsat=TINY)
    r = np.random.default_rng(0)
    x1 = jnp.asarray(r.standard_normal((2, 40, 16)), jnp.float32)
    x2 = jnp.asarray(r.standard_normal((2, 40, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), (x1, x2))
    return model, variables, x1, x2


def test_cola_train_parity():
    model, variables, x1, x2 = _setup()
    bs = variables["batch_stats"]

    def loss_flax(p):
        (z1, z2), new_state = model.apply(
            {"params": p, "batch_stats": bs},
            (x1, x2),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        loss, _ = cola_loss(z1, z2)
        return loss, new_state["batch_stats"]

    def loss_fused(p):
        (z1, z2), new_bs = cola_train_apply(
            {"params": p, "batch_stats": bs},
            (x1, x2),
            jax.random.PRNGKey(1),
            p_drop=0.0,
            cfg=TINY,
            deterministic=True,
            interpret=True,
        )
        loss, _ = cola_loss(z1, z2)
        return loss, new_bs

    (lf, bs_f), gf = jax.value_and_grad(loss_flax, has_aux=True)(variables["params"])
    (lk, bs_k), gk = jax.value_and_grad(loss_fused, has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(lk), float(lf), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gk)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
    # chained bn0 running stats (two sequential encoder calls)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(bs_k["encoder"]["bn0"][key]),
            np.asarray(bs_f["encoder"]["bn0"][key]),
            rtol=1e-5,
            err_msg=f"bn0 {key}",
        )


def test_droppath_distribution():
    """Stochastic path: keep multipliers are {0, 1/keep} per sample and the
    output changes between rng draws only via the droppath pattern."""
    model, variables, x1, x2 = _setup()
    cfg = HTSATConfig(**{**TINY.__dict__, "drop_path_rate": 0.9})
    outs = []
    for seed in range(2):
        (z1, _), _ = cola_train_apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            (x1, x2),
            jax.random.PRNGKey(seed),
            p_drop=0.0,
            cfg=cfg,
            deterministic=False,
            interpret=True,
        )
        outs.append(np.asarray(z1))
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    assert not np.allclose(outs[0], outs[1])  # different droppath draws
