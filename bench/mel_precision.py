"""Mel-frontend DFT precision: HIGHEST (bf16x6, strict parity) vs HIGH
(bf16x3) vs DEFAULT (bf16x1) — time + output delta, min over rounds."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp

SR = 16000
B = 64
REPS = 16
ROUNDS = int(os.environ.get("ROUNDS", 8))
r = np.random.default_rng(0)
clips = [
    (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(10.0 * SR)) / SR)
     + 0.05 * r.standard_normal(int(10.0 * SR))).astype(np.float32)
    for _ in range(B)
]
max_len = ((int(10.0 * SR) + 511) // 512) * 512
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wavj, lenj = jnp.asarray(wav), jnp.asarray(lengths)

P = jax.lax.Precision
variants = {
    "highest": jax.jit(lambda w, l: dsp.mel_frontend(w, l)[0].sum()),
    "high": jax.jit(lambda w, l: dsp.mel_frontend(w, l, precision=P.HIGH)[0].sum()),
    "default": jax.jit(lambda w, l: dsp.mel_frontend(w, l, precision=P.DEFAULT)[0].sum()),
}
full = {
    k: jax.jit(lambda w, l, p=p: dsp.mel_frontend(w, l, precision=p)[0])
    for k, p in (("highest", None), ("high", P.HIGH), ("default", P.DEFAULT))
}
ref = np.asarray(full["highest"](wavj, lenj))
for k in ("high", "default"):
    d = np.abs(np.asarray(full[k](wavj, lenj)) - ref).max()
    print(f"{k}: max|mel delta| = {d:.2e} (mel is min-max normalized to [0,1])")

mins = {}
for v in variants.values():
    np.asarray(v(wavj, lenj))
for rnd in range(ROUNDS):
    for k, v in variants.items():
        t0 = time.time()
        for _ in range(REPS):
            y = v(wavj, lenj)
        np.asarray(y)
        mins[k] = min(mins.get(k, 1e9), (time.time() - t0) / REPS * 1000)
print({k: round(v, 2) for k, v in mins.items()})
