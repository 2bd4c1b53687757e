"""MAE encoders: default (f32/HIGHEST) vs bf16 default-matmul-precision —
time + feature cosine. Params device-resident (explicit device_put)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.vit_mae import (
    AudioMAEClassifierBackbone,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)

REPS = 8
ROUNDS = int(os.environ.get("ROUNDS", 8))
r = np.random.default_rng(0)

def check(name, model, x, method=None):
    with jax.default_device(jax.devices("cpu")[0]):
        if method is None:
            v = model.init(jax.random.PRNGKey(0), x[:1])
        else:
            v = model.init(
                {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
                x[:1],
            )
    v = jax.device_put(v, jax.devices()[0])
    xj = jnp.asarray(x)

    def base_apply(v, x):
        if method is None:
            return model.apply(v, x)
        return model.apply(v, x, method=method)

    f32 = jax.jit(base_apply)

    @jax.jit
    def bf16(v, x):
        with jax.default_matmul_precision("bfloat16"):
            return base_apply(v, x)

    @jax.jit
    def bf16x3(v, x):
        with jax.default_matmul_precision("high"):
            return base_apply(v, x)

    y0 = np.asarray(f32(v, xj))
    res = {}
    for tag, fn in (("f32", f32), ("bf16x3", bf16x3), ("bf16", bf16)):
        y = np.asarray(fn(v, xj))
        cos = np.sum(y0 * y, -1) / (
            np.linalg.norm(y0, axis=-1) * np.linalg.norm(y, axis=-1)
        )
        res[tag] = [fn, cos.min()]
    mins = {}
    for rnd in range(ROUNDS):
        for tag, (fn, _) in res.items():
            t0 = time.time()
            for _ in range(REPS):
                y = fn(v, xj)
            np.asarray(y)
            mins[tag] = min(mins.get(tag, 1e9), (time.time() - t0) / REPS * 1000)
    B = x.shape[0]
    for tag, (fn, c) in res.items():
        print(f"{name} {tag:7s}: {mins[tag]:7.1f} ms  {B/(mins[tag]/1000):6.0f} clips/s  cos_min={c:.6f}", flush=True)

x_gt = r.random((64, 256, 64)).astype(np.float32)
check("operaGT ", MaskedAutoencoderViT(mae_vit_small_config()), x_gt,
      method=MaskedAutoencoderViT.forward_feature)
x_am = r.random((32, 998, 128)).astype(np.float32)
check("audiomae", AudioMAEClassifierBackbone(audiomae_base_config()), x_am)
