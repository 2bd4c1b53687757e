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

# ---------------------------------------------------------------------------
# baseline towers (hear / clap-2023 / clap-2022 Cnn14 / vggish): their device
# graphs are not FeatureExtractor-routed, so build each production forward
# directly (same policies as models.{hear,clap,vggish} extract_* functions).
# Completes the 7-tower table (round-4 weak #7).
# ---------------------------------------------------------------------------
EXTRA = []  # (name, dim, clip_sec, B, prod_fn, args, exact_lower)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]

if os.environ.get("BASELINES", "1") != "0":
    from heart_murmur_detection_tpu.models.clap import (
        CLAPAudioEncoder, CLAPConfig, clap_audio_forward_fused,
    )
    from heart_murmur_detection_tpu.models.hear import HeAREncoder
    from heart_murmur_detection_tpu.models.vggish import VGGish
    from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

    # hear: 2 s @16k clips, ViT-L, fused+fast_softmax production path
    Bh = 64
    hm = HeAREncoder()
    with jax.default_device(cpu):
        hv = hm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)))
    hv = jax.device_put(hv, dev)
    hw = jnp.asarray(r.standard_normal((Bh, 32000)).astype(np.float32) * 0.1)
    h_prod = jax.jit(
        lambda v, w: hear_forward_fused(v, w, hm.config, fast_softmax=True)
    )
    h_exact = jax.jit(lambda v, w: hm.apply(v, w)["pooled"])
    EXTRA.append(("hear", 512, 2.0, Bh, h_prod, (hv, hw), lambda: h_exact.lower(hv, hw)))

    # clap-2023: 7 s @44.1k, HTS-AT tower fused+fast_softmax
    for ver, Bc in (("2023", 32), ("2022", 32)):
        ccfg = CLAPConfig(version=ver)
        cm = CLAPAudioEncoder(ccfg)
        n = int(ccfg.duration * ccfg.sample_rate)
        n = (n + ccfg.hop - 1) // ccfg.hop * ccfg.hop
        with jax.default_device(cpu):
            cv = cm.init(
                jax.random.PRNGKey(0), jnp.zeros((1, n)), jnp.full((1,), n, jnp.int32)
            )
        cv = jax.device_put(cv, dev)
        cw = jnp.asarray(r.standard_normal((Bc, n)).astype(np.float32) * 0.1)
        cl = jnp.full((Bc,), n, jnp.int32)
        if ver == "2023":
            c_prod = jax.jit(
                lambda v, w, l, _c=ccfg: clap_audio_forward_fused(
                    v, w, l, _c, fast_softmax=True
                )
            )
        else:  # Cnn14 tower: XLA already fuses the convs — production = apply
            c_prod = jax.jit(lambda v, w, l, _m=cm: _m.apply(v, w, l))
        c_exact = jax.jit(lambda v, w, l, _m=cm: _m.apply(v, w, l))
        EXTRA.append(
            (f"clap{ver}", 1024, ccfg.duration, Bc, c_prod, (cv, cw, cl),
             (lambda _e=c_exact, _a=(cv, cw, cl): _e.lower(*_a)))
        )

    # vggish: (B, 96, 64) log-mel examples; a 10 s clip yields ~10 examples,
    # so clips/s here = examples/s / 10 (reported per-example row)
    Bv = 128
    vm = VGGish()
    with jax.default_device(cpu):
        vv = vm.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64)))
    vv = jax.device_put(vv, dev)
    vx = jnp.asarray(r.standard_normal((Bv, 96, 64)).astype(np.float32))
    v_fn = jax.jit(lambda v, x: vm.apply(v, x))
    EXTRA.append(("vggish", 128, 0.96, Bv, v_fn, (vv, vx),
                  lambda: v_fn.lower(vv, vx)))

    for name, dim, csec, B, fn, args, lower in EXTRA:
        np.asarray(fn(*args))
        print("compiled", name, flush=True)
        best = 1e9
        for _ in range(ROUNDS):
            t0 = time.time()
            for _ in range(REPS):
                y = fn(*args)
            np.asarray(y)
            best = min(best, (time.time() - t0) / REPS * 1000)
        mins[name] = best
        if os.environ.get("MFU", "1") != "0":
            try:
                ca = lower().compile().cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                flops_clip[name] = float(ca["flops"]) / B
            except Exception as e:  # noqa: BLE001 — MFU is best-effort
                print(f"mfu probe failed for {name}: {e}", flush=True)

print("\nencoder  ms/batch  clips/s  TFLOP/s   MFU  (device-resident, production graph)")
ROWS = [(p, d, None, c, B) for (p, d, _, c, B) in ZOO] + [
    (n, d, None, c, B) for (n, d, c, B, _, _, _) in EXTRA
]
for (pretrain, dim, _, clip_sec, B) in ROWS:
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
