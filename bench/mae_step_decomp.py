"""Decompose the MAE / Audio-MAE CP train step (pretrain/mae_training
production dims): forward(loss), +backward, +Adam — plus an encoder-only
forward to split encoder vs decoder cost.

Usage: [METHOD=mae|audiomae] [B=64] [DTYPE=f32|bf16] python bench/mae_step_decomp.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.vit_mae import (
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from heart_murmur_detection_tpu.pretrain import steps

METHOD = os.environ.get("METHOD", "mae")
B = int(os.environ.get("B", 64))
DTYPE = os.environ.get("DTYPE", "f32")

cd = jnp.bfloat16 if DTYPE == "bf16" else None
cfg = (mae_vit_small_config(compute_dtype=cd) if METHOD == "mae"
       else audiomae_base_config(compute_dtype=cd))
model = MaskedAutoencoderViT(cfg)
H, W = cfg.img_size
print("backend:", jax.default_backend(), "method:", METHOD, "B:", B,
      "img:", cfg.img_size, "dtype:", DTYPE)

rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    variables = model.init(rng, jnp.zeros((1, H, W)), rng=rng)
params = jax.device_put(variables["params"], jax.devices()[0])

tx = steps.adam_with_epoch_decay(100)
with jax.default_device(jax.devices("cpu")[0]):
    opt_state = tx.init(variables["params"])
opt_state = jax.device_put(opt_state, jax.devices()[0])

r = np.random.default_rng(0)
x = jnp.asarray(r.standard_normal((B, H, W)), jnp.float32)
key = jax.random.PRNGKey(1)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(3):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, (time.time() - t0) / 3 * 1000)
    print(f"{name:30s} {best:8.2f} ms   ({B / best * 1000:7.1f} clips/s)", flush=True)
    return best


@jax.jit
def enc_only(params, x, rng):
    h, mask, ids = model.apply(
        {"params": params}, x, rng, cfg.mask_ratio, method=model.forward_encoder
    )
    return h.sum()


@jax.jit
def fwd_loss(params, x, rng):
    loss, _, _ = model.apply({"params": params}, x, rng=rng)
    return loss


@jax.jit
def grad_step(params, x, rng):
    def f(p):
        loss, _, _ = model.apply({"params": p}, x, rng=rng)
        return loss

    loss, grads = jax.value_and_grad(f)(params)
    return loss + jax.tree.reduce(
        lambda a, g: a + g.sum().astype(jnp.float32), grads, jnp.float32(0))


@jax.jit
def full_step(params, opt_state, x, rng):
    def f(p):
        loss, _, _ = model.apply({"params": p}, x, rng=rng)
        return loss

    loss, grads = jax.value_and_grad(f)(params)
    updates, opt_state2 = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    return loss + jax.tree.reduce(
        lambda a, g: a + g.sum().astype(jnp.float32), new_params, jnp.float32(0))


t_e = timeit("encoder fwd (masked)", enc_only, params, x, key)
t_f = timeit("full fwd + loss", fwd_loss, params, x, key)
t_g = timeit("fwd+bwd", grad_step, params, x, key)
t_s = timeit("full step (+Adam)", full_step, params, opt_state, x, key)
print(f"\ndecoder+loss fwd {t_f - t_e:.1f} ms, backward {t_g - t_f:.1f} ms, "
      f"optimizer {t_s - t_g:.1f} ms")
