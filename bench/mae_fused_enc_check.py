"""Same-process A/B of the MAE encoder fwd+bwd (the part the fused Pallas
train kernels replace) + absolute timing of the FULL fused CP step.

Why not a full-step XLA-vs-fused A/B: the XLA full step's backward (16
swin-v2-cr decoder blocks) takes >28 min to compile through this
environment's remote-compile link (bench/mae_fused_check.py timed out twice)
— the encoder-only XLA backward compiles in minutes. The full-step ratio is
derived: t_full(xla) ≈ t_enc(xla) + t_rest, with t_rest = t_full(fused) -
t_enc(fused) (decoder+loss+Adam identical between variants).

Usage: [METHOD=mae|audiomae] [B=64] [DTYPE=bf16] python -u bench/mae_fused_enc_check.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.mae_train_fused import (
    mae_encode_train_fused,
    mae_train_loss_fused,
)
from heart_murmur_detection_tpu.models.vit_mae import (
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from heart_murmur_detection_tpu.pretrain import steps

METHOD = os.environ.get("METHOD", "mae")
B = int(os.environ.get("B", 64))
DTYPE = os.environ.get("DTYPE", "bf16")
ROUNDS = int(os.environ.get("ROUNDS", 6))

cd = jnp.bfloat16 if DTYPE == "bf16" else None
cfg = (mae_vit_small_config(compute_dtype=cd) if METHOD == "mae"
       else audiomae_base_config(compute_dtype=cd))
model = MaskedAutoencoderViT(cfg)
H, W = cfg.img_size
dev = jax.devices()[0]
mm = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
print("backend:", jax.default_backend(), "method:", METHOD, "B:", B,
      "img:", cfg.img_size, "dtype:", DTYPE, flush=True)

rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    variables = model.init(rng, jnp.zeros((1, H, W)), rng=rng)
params = jax.device_put(variables["params"], dev)
tx = steps.adam_with_epoch_decay(100)
with jax.default_device(jax.devices("cpu")[0]):
    opt_state0 = tx.init(variables["params"])
opt_state = jax.device_put(opt_state0, dev)

r = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(r.standard_normal((B, H, W)), jnp.float32), dev)
key = jax.random.PRNGKey(1)


def enc_loss_xla(p):
    h, mask, ids = model.apply(
        {"params": p}, x, key, cfg.mask_ratio, method=model.forward_encoder
    )
    return h.sum()


def enc_loss_fused(p):
    h, mask, ids = mae_encode_train_fused(p, x, key, cfg, mm_dtype=mm)
    return h.sum()


@jax.jit
def enc_bwd_xla(p):
    l, g = jax.value_and_grad(enc_loss_xla)(p)
    return l + jax.tree.reduce(lambda a, q: a + q.sum().astype(jnp.float32),
                               g, jnp.float32(0))


@jax.jit
def enc_bwd_fused(p):
    l, g = jax.value_and_grad(enc_loss_fused)(p)
    return l + jax.tree.reduce(lambda a, q: a + q.sum().astype(jnp.float32),
                               g, jnp.float32(0))


@jax.jit
def full_step_fused(p, opt_state):
    loss, grads = jax.value_and_grad(
        lambda q: mae_train_loss_fused(model, q, x, key, mm_dtype=mm)
    )(p)
    updates, opt_state = tx.update(grads, opt_state, p)
    return loss + jax.tree.reduce(lambda a, q: a + q.sum().astype(jnp.float32),
                                  updates, jnp.float32(0))


@jax.jit
def full_step_dopt(p, opt_state):
    """+ the TPU-shaped decoder (models/mae_decoder_opt) — the production
    fused-CP configuration (pretrain/mae_training decoder_opt=True)."""
    loss, grads = jax.value_and_grad(
        lambda q: mae_train_loss_fused(
            model, q, x, key, mm_dtype=mm, decoder_opt=True
        )
    )(p)
    updates, opt_state = tx.update(grads, opt_state, p)
    return loss + jax.tree.reduce(lambda a, q: a + q.sum().astype(jnp.float32),
                                  updates, jnp.float32(0))


for name, fn, args in (("enc_bwd_fused", enc_bwd_fused, (params,)),
                       ("full_step_fused", full_step_fused, (params, opt_state)),
                       ("full_step_dopt", full_step_dopt, (params, opt_state)),
                       ("enc_bwd_xla", enc_bwd_xla, (params,))):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out)
    print(f"{name} compile+1: {time.time()-t0:.1f}s val={float(out):.4f}", flush=True)

best = {}
for rd in range(ROUNDS):
    for name, fn, args in (("enc_bwd_xla", enc_bwd_xla, (params,)),
                           ("enc_bwd_fused", enc_bwd_fused, (params,)),
                           ("full_step_fused", full_step_fused, (params, opt_state)),
                           ("full_step_dopt", full_step_dopt, (params, opt_state))):
        t0 = time.time()
        for _ in range(3):
            out = fn(*args)
        np.asarray(out)
        best[name] = min(best.get(name, 1e9), (time.time() - t0) / 3 * 1000)
    print(f"round {rd}: " + " ".join(f"{k}={v:.1f}ms" for k, v in best.items()),
          flush=True)

t_rest = best["full_step_fused"] - best["enc_bwd_fused"]
t_xla_full = best["enc_bwd_xla"] + t_rest
print(f"\nencoder fwd+bwd: xla {best['enc_bwd_xla']:.1f} ms, fused "
      f"{best['enc_bwd_fused']:.1f} ms -> {best['enc_bwd_xla']/best['enc_bwd_fused']:.2f}x")
print(f"full step: fused {best['full_step_fused']:.1f} ms "
      f"({B/best['full_step_fused']*1000:.0f} clips/s); derived xla "
      f"{t_xla_full:.1f} ms -> {t_xla_full/best['full_step_fused']:.2f}x "
      f"(t_rest={t_rest:.1f} ms shared decoder+loss+Adam)")
print(f"full step + decoder_opt: {best['full_step_dopt']:.1f} ms "
      f"({B/best['full_step_dopt']*1000:.0f} clips/s) -> "
      f"{t_xla_full/best['full_step_dopt']:.2f}x vs derived xla, "
      f"{best['full_step_fused']/best['full_step_dopt']:.2f}x vs fused-enc-only")
