"""Same-process A/B of fast_softmax (skip the rowwise max pass) on the
fused ViT extraction towers (operaGT ViT-S, audiomae ViT-B): ms/batch both
ways + feature cosine. The swin towers' fast_softmax was measured in round 2
(-0.7 ms at B=64); this measures the ViT analog added in round 4.

Usage: [ROUNDS=6] python -u bench/zoo_fast_softmax.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

SR = 16000
ROUNDS = int(os.environ.get("ROUNDS", 6))
r = np.random.default_rng(0)

ZOO = [
    ("operaGT", 384, 8.18, 8.18, 64),
    ("audiomae", 768, 10.0, 10.0, 32),
]

cases = {}
for pretrain, dim, input_sec, clip_sec, B in ZOO:
    clips = [
        (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(clip_sec * SR)) / SR)
         + 0.05 * r.standard_normal(int(clip_sec * SR))).astype(np.float32)
        for _ in range(B)
    ]
    for fast in (False, True):
        fe = FeatureExtractor(
            pretrain, dim=dim, input_sec=input_sec, batch_size=B,
            random_init=True, fast_softmax=fast,
        )
        if fe.is_audiomae:
            max_len = int(clip_sec * SR)
        else:
            max_len = ((int(clip_sec * SR) + 511) // 512) * 512
        wav, lengths = dsp.pad_batch(clips, max_len=max_len)
        wj = jax.device_put(jnp.asarray(wire.encode_np(wav, fe.wire)))
        lj = jax.device_put(jnp.asarray(lengths))
        t0 = time.time()
        y = np.asarray(fe._fn(fe.variables, wj, lj))
        print(f"compiled {pretrain} fast={fast} in {time.time()-t0:.1f}s", flush=True)
        cases[(pretrain, fast)] = (fe, wj, lj, B, y)

for pretrain, *_ in ZOO:
    a = cases[(pretrain, False)][4]
    b = cases[(pretrain, True)][4]
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    print(f"{pretrain}: cosine fast-vs-slow = {float(np.min((an*bn).sum(1))):.7f}",
          flush=True)

best = {}
for rd in range(ROUNDS):
    for key, (fe, wj, lj, B, _) in cases.items():
        t0 = time.time()
        for _ in range(6):
            y = fe._fn(fe.variables, wj, lj)
        np.asarray(y)
        best[key] = min(best.get(key, 1e9), (time.time() - t0) / 6 * 1000)
    print(f"round {rd}: " + " ".join(f"{k[0]}/{'fast' if k[1] else 'slow'}={v:.1f}ms"
                                     for k, v in best.items()), flush=True)

print()
for pretrain, dim, _, clip_sec, B in ZOO:
    slow, fast = best[(pretrain, False)], best[(pretrain, True)]
    print(f"{pretrain:9s} slow {slow:6.1f} ms  fast {fast:6.1f} ms  "
          f"{slow / fast:.3f}x  ({B / fast * 1000:.0f} clips/s fast)")
