"""Why does the operaGT production graph spend ~39 ms in a block stack that
costs 4.7 ms standalone (bench/vit_sweep.py)? Same-process A/B: production
mae_forward_feature_fused with the depth truncated to k blocks, vs the
standalone stack on random bf16 tokens at identical geometry."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor
from heart_murmur_detection_tpu.models.vit_fused import mae_forward_feature_fused
from heart_murmur_detection_tpu.ops.pallas_vit import block_plan, fused_vit_block

SR = 16000
B = 64
r = np.random.default_rng(0)


def timeit(name, fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(6):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / 6 * 1000)
    print(f"  {name:40s} {best:8.2f} ms", flush=True)
    return best


fe = FeatureExtractor("operaGT", dim=384, input_sec=8.18, batch_size=B,
                      random_init=True)
clip = int(8.18 * SR)
clips = [(0.3 * np.sin(2 * np.pi * 80 * np.arange(clip) / SR)
          + 0.05 * r.standard_normal(clip)).astype(np.float32) for _ in range(B)]
max_len = ((clip + 511) // 512) * 512
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wj = jnp.asarray(wire.encode_np(wav, fe.wire))
lj = jnp.asarray(lengths)
v = fe.variables
cfg = fe.model.config
print("cfg depth/heads/dim:", cfg.depth, cfg.num_heads, cfg.embed_dim,
      "plan:", block_plan(80, 384, 1536, 6, jnp.bfloat16, jnp.bfloat16))

for k in (0, 1, 2, 4, 8, 12):
    cfgk = dataclasses.replace(cfg, depth=k)

    @jax.jit
    def g(v, wav, lengths, cfgk=cfgk):
        w, l = fe._prologue(wav, lengths)
        mel, nf = fe._mel(w, l)
        mel = mel[:, :256]
        return mae_forward_feature_fused(
            v, mel, cfgk, mm_dtype=jnp.bfloat16, fast_softmax=True
        ).sum()

    timeit(f"production prefix depth={k}", g, v, wj, lj)

# standalone same-process control: 12 blocks on random bf16 tokens,
# REAL production weights
params = v["params"]
x = jnp.asarray(r.standard_normal((B, 80, 384)).astype(np.float32)).astype(
    jnp.bfloat16
)


@jax.jit
def stack(params, x):
    h = x
    for i in range(12):
        h = fused_vit_block(
            h, params[f"blocks_{i}"], 65, num_heads=6, q_chunk=128,
            mm_dtype=jnp.bfloat16, fast_softmax=True,
        )
    return h.astype(jnp.float32).sum()


timeit("standalone 12 blocks (real weights)", stack, params, x)

# and with the mel-derived tokens (data dependence check)
@jax.jit
def tokens(v, wav, lengths):
    from heart_murmur_detection_tpu.models.vit_fused import (
        _patch_embed, sincos_pos_embed_flexible,
    )
    w, l = fe._prologue(wav, lengths)
    mel, nf = fe._mel(w, l)
    mel = mel[:, :256]
    pe = v["params"]["patch_embed_proj"]
    h = _patch_embed(mel, pe["kernel"], pe["bias"], cfg.patch_size, jnp.bfloat16)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h + pos[:, 1 : h.shape[1] + 1]
    cls = v["params"]["cls_token"] + pos[:, :1]
    h = jnp.concatenate(
        [jnp.broadcast_to(cls, (h.shape[0], 1, h.shape[2])), h], axis=1
    )
    from heart_murmur_detection_tpu.ops.pallas_vit import pad_tokens
    h, n = pad_tokens(h, 16)
    return h.astype(jnp.bfloat16)


xt = tokens(v, wj, lj)
np.asarray(xt)
timeit("standalone 12 blocks (mel tokens)", stack, params, xt)
