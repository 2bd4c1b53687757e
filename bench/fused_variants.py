"""Full-graph variants with numerics: min-over-rounds timing + cosine vs
unfused. Output fetch is tiny (64x768), so np.asarray sync is honest."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json, os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.cola import Cola
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused

SR = 16000
B = 64
REPS = 12
ROUNDS = int(os.environ.get("ROUNDS", 10))
cfg = HTSATConfig()
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
enc_vars = {"params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"]}
r = np.random.default_rng(0)
clips = [
    (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(10.0 * SR)) / SR)
     + 0.05 * r.standard_normal(int(10.0 * SR))).astype(np.float32)
    for _ in range(B)
]
max_len = ((int(10.0 * SR) + 511) // 512) * 512
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wavj, lenj = jnp.asarray(wav), jnp.asarray(lengths)

@jax.jit
def unfused(wav, lengths):
    mel, nf = dsp.mel_frontend(wav, lengths)
    return model.apply(variables, mel, 768, nf, method=Cola.extract_feature)

def mkfused(md, dt):
    @jax.jit
    def f(wav, lengths):
        mel, nf = dsp.mel_frontend(wav, lengths)
        return htsat_apply_fused(enc_vars, mel, nf, cfg, max_fused_dim=md, mm_dtype=dt)
    return f

variants = {
    "unfused": unfused,
    "fused192_f32": mkfused(192, jnp.float32),
    "fused192_bf16": mkfused(192, jnp.bfloat16),
    "fused384_bf16": mkfused(384, jnp.bfloat16),
}
ya = None
mins = {}
for name, fn in list(variants.items()):
    try:
        y = np.asarray(fn(wavj, lenj))
        if name == "unfused":
            ya = y
        else:
            cos = np.sum(ya*y,-1)/(np.linalg.norm(ya,axis=-1)*np.linalg.norm(y,axis=-1))
            print(f"{name}: cos min={cos.min():.6f} mean={cos.mean():.6f} max|d|={np.abs(ya-y).max():.4f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}", flush=True)
        del variants[name]

for rnd in range(ROUNDS):
    for name, fn in variants.items():
        t0 = time.time()
        for _ in range(REPS):
            y = fn(wavj, lenj)
        np.asarray(y)
        ms = (time.time() - t0) / REPS * 1000
        mins[name] = min(mins.get(name, 1e9), ms)
    print(f"round {rnd}: " + " ".join(f"{k}={v:.1f}" for k, v in mins.items()), flush=True)
print(json.dumps(mins, indent=1))
