"""Decompose the COLA CP train step (HTS-AT encoder, batch 64, 251-frame
crops — the production recipe, RESULTS.md "Continued-pretraining throughput")
into: 2-view encoder forward, +loss, +backward, +Adam. Same-process minima
(the shared pool fluctuates between sessions; ratios are the signal).

Usage: [B=64] [CROP=251] [DTYPE=f32|bf16] python bench/cp_step_decomp.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.cola import Cola, ColaConfig, cola_loss
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.pretrain import steps

B = int(os.environ.get("B", 64))
CROP = int(os.environ.get("CROP", 251))
DTYPE = os.environ.get("DTYPE", "f32")
REPS = int(os.environ.get("REPS", 3))
ROUNDS = int(os.environ.get("ROUNDS", 6))

dev = jax.devices()[0]
print("backend:", jax.default_backend(), "B:", B, "crop:", CROP, "dtype:", DTYPE)

cfg = HTSATConfig(compute_dtype=jnp.bfloat16 if DTYPE == "bf16" else None)
model = Cola(ColaConfig(encoder="htsat", dim_fea=768, dim_hidden=1280, dim_out=512), htsat=cfg)

rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    variables = model.init(rng, (jnp.zeros((1, 64, 64)), jnp.zeros((1, 64, 64))))
params = jax.device_put(variables["params"], dev)
batch_stats = jax.device_put(variables["batch_stats"], dev)

tx = steps.adam_with_epoch_decay(100, lr=1e-4, decay=0.99)
with jax.default_device(jax.devices("cpu")[0]):
    opt_state = tx.init(variables["params"])
opt_state = jax.device_put(opt_state, dev)

r = np.random.default_rng(0)
x1 = jnp.asarray(r.standard_normal((B, CROP, 64)), jnp.float32)
x2 = jnp.asarray(r.standard_normal((B, CROP, 64)), jnp.float32)
key = jax.random.PRNGKey(1)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, (time.time() - t0) / REPS * 1000)
    print(f"{name:34s} {best:8.2f} ms   ({B / best * 1000:7.1f} clips/s)", flush=True)
    return best


@jax.jit
def fwd2(params, batch_stats, x1, x2):
    (z1, z2), _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, (x1, x2),
        train=True, rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    return z1.sum() + z2.sum()


@jax.jit
def fwd_loss(params, batch_stats, x1, x2):
    (z1, z2), _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, (x1, x2),
        train=True, rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    loss, _ = cola_loss(z1, z2)
    return loss


@jax.jit
def grad_step(params, batch_stats, x1, x2, rng):
    def loss_fn(p):
        (z1, z2), new_state = model.apply(
            {"params": p, "batch_stats": batch_stats}, (x1, x2),
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss, acc = cola_loss(z1, z2)
        return loss, (acc, new_state["batch_stats"])

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # one fused scalar: per-leaf outputs would each sync separately
    return loss + jax.tree.reduce(
        lambda a, g: a + g.sum().astype(jnp.float32), grads, jnp.float32(0)
    )


@jax.jit
def full_step(params, batch_stats, opt_state, x1, x2, rng):
    def loss_fn(p):
        (z1, z2), new_state = model.apply(
            {"params": p, "batch_stats": batch_stats}, (x1, x2),
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss, acc = cola_loss(z1, z2)
        return loss, (acc, new_state["batch_stats"])

    (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    return loss + jax.tree.reduce(
        lambda a, g: a + g.sum().astype(jnp.float32),
        (new_params, new_bs),
        jnp.float32(0),
    )


if os.environ.get("FUSED"):
    # fused training-path kernels (ops/pallas_swin_train via
    # models/htsat_train_fused.cola_train_apply) — same step semantics
    from heart_murmur_detection_tpu.models.htsat_train_fused import cola_train_apply

    mm = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32

    @jax.jit
    def fused_fwd(params, batch_stats, x1, x2, rng):
        (z1, z2), _ = cola_train_apply(
            {"params": params, "batch_stats": batch_stats}, (x1, x2), rng,
            p_drop=0.1, cfg=cfg, mm_dtype=mm,
        )
        return z1.sum() + z2.sum()

    @jax.jit
    def fused_full_step(params, batch_stats, opt_state, x1, x2, rng):
        def loss_fn(p):
            (z1, z2), new_bs = cola_train_apply(
                {"params": p, "batch_stats": batch_stats}, (x1, x2), rng,
                p_drop=0.1, cfg=cfg, mm_dtype=mm,
            )
            loss, acc = cola_loss(z1, z2)
            return loss, (acc, new_bs)

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return loss + jax.tree.reduce(
            lambda a, g: a + g.sum().astype(jnp.float32),
            (new_params, new_bs),
            jnp.float32(0),
        )

    t_ff = timeit("FUSED 2-view forward", fused_fwd, params, batch_stats, x1, x2, key)
    t_fs = timeit("FUSED full step (+Adam)", fused_full_step, params, batch_stats,
                  opt_state, x1, x2, key)
    print(f"\nfused backward+opt {t_fs - t_ff:.1f} ms ({(t_fs - t_ff) / max(t_ff, 1e-9):.2f}x fwd)")
else:
    t_f = timeit("2-view forward", fwd2, params, batch_stats, x1, x2)
    t_fl = timeit("2-view forward + cola loss", fwd_loss, params, batch_stats, x1, x2)
    t_g = timeit("fwd+bwd (value_and_grad)", grad_step, params, batch_stats, x1, x2, key)
    t_s = timeit("full step (+Adam)", full_step, params, batch_stats, opt_state, x1, x2, key)
    print(
        f"\nloss overhead {t_fl - t_f:.1f} ms, backward {t_g - t_fl:.1f} ms "
        f"({(t_g - t_fl) / max(t_f, 1e-9):.2f}x fwd), optimizer {t_s - t_g:.1f} ms"
    )
