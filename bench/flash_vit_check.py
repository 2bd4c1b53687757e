"""Flash-attention MAE paths on TPU: numerics vs the XLA einsum attention
(same weights) and min-over-rounds throughput for operaGT / audiomae."""
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
ROUNDS = int(os.environ.get("ROUNDS", 6))
r = np.random.default_rng(0)

def check(name, mk_model, x, method=None):
    cfg_x = mk_model("xla")
    cfg_f = mk_model("flash")
    with jax.default_device(jax.devices("cpu")[0]):
        v = cfg_x.init(jax.random.PRNGKey(0), x[:1]) if method is None else cfg_x.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}, x[:1]
        )
    # explicit device: device_put(v, None) would leave the CPU-committed
    # init where it is and re-upload ~100-344MB of params per call
    v = jax.device_put(v, jax.devices()[0])
    xj = jnp.asarray(x)

    def apply(m):
        if method is None:
            return jax.jit(lambda v, x: m.apply(v, x))
        return jax.jit(lambda v, x: m.apply(v, x, method=method))

    fx, ff = apply(cfg_x), apply(cfg_f)
    yx = np.asarray(fx(v, xj))
    yf = np.asarray(ff(v, xj))
    cos = np.sum(yx * yf, -1) / (
        np.linalg.norm(yx, axis=-1) * np.linalg.norm(yf, axis=-1)
    )
    print(f"{name}: cos min={cos.min():.6f} max|d|={np.abs(yx - yf).max():.2e}", flush=True)
    mins = {"xla": 1e9, "flash": 1e9}
    for rnd in range(ROUNDS):
        for tag, fn in (("xla", fx), ("flash", ff)):
            t0 = time.time()
            for _ in range(REPS):
                y = fn(v, xj)
            np.asarray(y)
            mins[tag] = min(mins[tag], (time.time() - t0) / REPS * 1000)
    B = x.shape[0]
    print(f"{name}: xla {mins['xla']:.1f} ms  flash {mins['flash']:.1f} ms "
          f"({mins['xla']/mins['flash']:.2f}x; {B/(mins['flash']/1000):.0f} clips/s)", flush=True)

# operaGT ViT-S forward_feature: (B, 256, 64) mel
x_gt = r.random((64, 256, 64)).astype(np.float32)
check(
    "operaGT vit-s",
    lambda impl: MaskedAutoencoderViT(mae_vit_small_config(attn_impl=impl)),
    x_gt,
    method=MaskedAutoencoderViT.forward_feature,
)

# audiomae ViT-B backbone: (B, 998, 128) fbank
x_am = r.random((32, 998, 128)).astype(np.float32)
check(
    "audiomae vit-b",
    lambda impl: AudioMAEClassifierBackbone(audiomae_base_config(attn_impl=impl)),
    x_am,
)
