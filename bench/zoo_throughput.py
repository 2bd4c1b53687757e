"""Per-encoder extraction throughput: the production FeatureExtractor graph
for every registry-served encoder, device-resident batches, min over rounds.
Complements bench.py (flagship operaCT only)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

SR = 16000
REPS = 8
ROUNDS = int(os.environ.get("ROUNDS", 6))
r = np.random.default_rng(0)

# (pretrain, dim, input_sec, clip_sec, batch)
ZOO = [
    ("operaCT", 768, 8.0, 10.0, 64),
    ("operaCE", 1280, 8.0, 10.0, 64),
    ("operaGT", 384, 8.18, 8.18, 64),
    ("audiomae", 768, 10.0, 10.0, 32),
]

fns = {}
for pretrain, dim, input_sec, clip_sec, B in ZOO:
    fe = FeatureExtractor(
        pretrain, dim=dim, input_sec=input_sec, batch_size=B, random_init=True
    )
    if fe.is_audiomae:
        max_len = int(clip_sec * SR)
    else:
        max_len = ((int(clip_sec * SR) + 511) // 512) * 512
    clips = [
        (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(clip_sec * SR)) / SR)
         + 0.05 * r.standard_normal(int(clip_sec * SR))).astype(np.float32)
        for _ in range(B)
    ]
    wav, lengths = dsp.pad_batch(clips, max_len=max_len)
    wj = jnp.asarray(wire.encode_np(wav, fe.wire))
    lj = jnp.asarray(lengths)
    np.asarray(fe._fn(fe.variables, wj, lj))  # compile+warm
    print("compiled", pretrain, flush=True)
    fns[pretrain] = (lambda w, l, fe=fe: fe._fn(fe.variables, w, l), wj, lj, B)

mins = {}
for rnd in range(ROUNDS):
    for name, (fn, wj, lj, B) in fns.items():
        t0 = time.time()
        for _ in range(REPS):
            y = fn(wj, lj)
        np.asarray(y)
        ms = (time.time() - t0) / REPS * 1000
        mins[name] = min(mins.get(name, 1e9), ms)
    print(f"round {rnd}: " + " ".join(f"{k}={v:.1f}ms" for k, v in mins.items()), flush=True)

# analytic FLOPs/clip via XLA's cost model on the exact-f32 unfused graph
# (same math as the fused bf16 production graph; Pallas custom calls would
# under-count). MFU vs the v5e bf16 MXU peak. Set MFU=0 to skip the extra
# compiles.
V5E_PEAK_BF16 = 197e12
flops_clip = {}
if os.environ.get("MFU", "1") != "0":
    for pretrain, dim, input_sec, clip_sec, B in ZOO:
        try:
            fe = FeatureExtractor(
                pretrain, dim=dim, input_sec=input_sec, batch_size=B,
                random_init=True, use_fused_htsat=False, use_fused_vit=False,
                compute_dtype=jnp.float32,
            )
            _, wj, lj, _ = fns[pretrain]
            ca = fe._fn.lower(fe.variables, wj, lj).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops_clip[pretrain] = float(ca["flops"]) / B
        except Exception as e:  # noqa: BLE001 — MFU is best-effort reporting
            print(f"mfu probe failed for {pretrain}: {e}", flush=True)

print("\nencoder  ms/batch  clips/s  TFLOP/s   MFU  (device-resident, production graph)")
for (pretrain, dim, _, clip_sec, B) in ZOO:
    ms = mins[pretrain]
    cps = B / (ms / 1000)
    if pretrain in flops_clip:
        tf = flops_clip[pretrain] * cps / 1e12
        mfu = f"{tf * 1e12 / V5E_PEAK_BF16:5.1%}"
        tf = f"{tf:7.1f}"
    else:
        tf, mfu = "      -", "    -"
    print(f"{pretrain:9s} {ms:7.1f}  {cps:7.0f} {tf} {mfu}  "
          f"(batch {B}, {clip_sec:.2f}s clips, dim {dim}, "
          f"{flops_clip.get(pretrain, 0) / 1e9:.1f} GFLOP/clip)")
