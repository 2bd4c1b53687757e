"""Same-process A/B of the MAE / Audio-MAE CP full train step: XLA loss vs
the fused Pallas train-kernel loss (models/mae_train_fused), both at the
given compute dtype. Variants alternate in ONE process (min over rounds) so
pool contention cancels — the protocol of bench/train_kernel_ablate.py.

Usage: [METHOD=mae|audiomae] [B=64] [DTYPE=bf16|f32] python bench/mae_fused_check.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.mae_train_fused import mae_train_loss_fused
from heart_murmur_detection_tpu.models.vit_mae import (
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from heart_murmur_detection_tpu.pretrain import steps

METHOD = os.environ.get("METHOD", "mae")
B = int(os.environ.get("B", 64))
DTYPE = os.environ.get("DTYPE", "bf16")
ROUNDS = int(os.environ.get("ROUNDS", 8))

cd = jnp.bfloat16 if DTYPE == "bf16" else None
cfg = (mae_vit_small_config(compute_dtype=cd) if METHOD == "mae"
       else audiomae_base_config(compute_dtype=cd))
model = MaskedAutoencoderViT(cfg)
H, W = cfg.img_size
dev = jax.devices()[0]
print("backend:", jax.default_backend(), "method:", METHOD, "B:", B,
      "img:", cfg.img_size, "dtype:", DTYPE, flush=True)

rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    variables = model.init(rng, jnp.zeros((1, H, W)), rng=rng)
tx = steps.adam_with_epoch_decay(100)
with jax.default_device(jax.devices("cpu")[0]):
    opt_state0 = tx.init(variables["params"])

r = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(r.standard_normal((B, H, W)), jnp.float32), dev)
key = jax.random.PRNGKey(1)

mm = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
fused_loss = lambda p, xx, rr: mae_train_loss_fused(model, p, xx, rr, mm_dtype=mm)


def make_step(loss_fn):
    # no donation: both variants share one params copy across alternation
    @jax.jit
    def step(params, opt_state, x, rng):
        if loss_fn is not None:
            _loss = lambda p: loss_fn(p, x, rng)
        else:
            def _loss(p):
                loss, _, _ = model.apply({"params": p}, x, rng=rng)
                return loss
        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        gsum = jax.tree.reduce(lambda a, g: a + g.sum().astype(jnp.float32),
                               grads, jnp.float32(0))
        return loss, gsum
    return step


step_xla = make_step(None)
step_fused = make_step(fused_loss)

params = jax.device_put(variables["params"], dev)
opt_state = jax.device_put(opt_state0, dev)

# warm both (compile)
t0 = time.time()
l_x = step_xla(params, opt_state, x, key)
jax.tree.map(np.asarray, l_x)
print(f"xla compile+1 {time.time()-t0:.1f}s loss {float(l_x[0]):.4f}", flush=True)
t0 = time.time()
l_f = step_fused(params, opt_state, x, key)
jax.tree.map(np.asarray, l_f)
print(f"fused compile+1 {time.time()-t0:.1f}s loss {float(l_f[0]):.4f}", flush=True)

best = {"xla": 1e9, "fused": 1e9}
for rd in range(ROUNDS):
    for name, fn in (("xla", step_xla), ("fused", step_fused)):
        t0 = time.time()
        for _ in range(3):
            out = fn(params, opt_state, x, key)
        jax.tree.map(np.asarray, out)
        best[name] = min(best[name], (time.time() - t0) / 3 * 1000)
print(f"\nxla   {best['xla']:8.2f} ms/step ({B/best['xla']*1000:7.1f} clips/s)")
print(f"fused {best['fused']:8.2f} ms/step ({B/best['fused']*1000:7.1f} clips/s)")
print(f"ratio {best['xla']/best['fused']:.2f}x   "
      f"loss xla {float(l_x[0]):.5f} fused {float(l_f[0]):.5f}")
