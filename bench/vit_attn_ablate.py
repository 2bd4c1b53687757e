"""In-kernel ablation of the fused ViT attention half at the real operaGT
shape: which piece eats the 53%-MFU gap — the per-head lane-slice hcat
concats, the softmax, or the score matmuls? Bench-only kernel variants
(wrong numerics for the ablated pieces, identical op mix otherwise).

Plus an in-process decomposition of the CLAP-2023 production graph
(frontend vs tower) — the zoo table's 44.9 ms was cross-process."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heart_murmur_detection_tpu.ops.pallas_swin import _ln

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
r = np.random.default_rng(0)


def timeit(name, fn, *args):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f"  {name:30s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(6):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / 6 * 1000)
    print(f"  {name:30s} {best:8.2f} ms", flush=True)
    return best


def attn_kernel(x_ref, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b, out_ref,
                *, heads, q_chunk, mode):
    x = x_ref[:]
    bb, Np, C = x.shape
    hd = C // heads
    mm = lambda a: a.astype(jnp.bfloat16)
    h = _ln(x, ln1_s[0], ln1_b[0], eps=1e-6).astype(jnp.bfloat16)
    qkv = (
        jnp.dot(mm(h.reshape(bb * Np, C)), mm(w_qkv[:]),
                preferred_element_type=jnp.float32) + b_qkv[0]
    ).astype(jnp.bfloat16).reshape(bb, Np, 3 * C)
    if mode == "ident":
        o = qkv[:, :, :C].reshape(bb * Np, C)
    else:
        if mode == "aligned_hcat":
            # aligned (wrong-numerics) head slices: every slice starts at a
            # multiple of 128 lanes
            hoff = lambda off, hh: off + (hh * 128) % (2 * C)
        else:
            hoff = lambda off, hh: off + hh * hd
        hcat = lambda off: jnp.concatenate(
            [qkv[:, :, hoff(off, hh) : hoff(off, hh) + hd] for hh in range(heads)], 0
        )
        qs, ks, vs = hcat(0), hcat(C), hcat(2 * C)
        if mode == "no_attn":
            ost = qs
        else:
            outs = []
            o_ = 0
            while o_ < Np:
                qc = min(q_chunk, Np - o_)
                s = jax.lax.dot_general(
                    mm(qs[:, o_ : o_ + qc]), mm(ks),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                if mode == "no_softmax":
                    pass
                else:
                    e = jnp.exp(s)
                    s = e / jnp.sum(e, axis=-1, keepdims=True)
                outs.append(
                    jax.lax.dot_general(
                        mm(s), mm(vs),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                )
                o_ += qc
            ost = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        o = jnp.concatenate(
            [ost[hh * bb : (hh + 1) * bb] for hh in range(heads)], axis=-1
        ).reshape(bb * Np, C)
    o = (
        jnp.dot(mm(o), mm(w_proj[:]), preferred_element_type=jnp.float32)
        + b_proj[0]
    ).reshape(bb, Np, C)
    out_ref[:] = (x.astype(jnp.float32) + o).astype(x.dtype)


def build(B, Np, C, heads, mode, q_chunk=208, depth=8):
    g = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.02)
    w = (g(C, 3 * C).astype(jnp.bfloat16), g(1, 3 * C), g(C, C).astype(jnp.bfloat16),
         g(1, C), jnp.ones((1, C)), jnp.zeros((1, C)))
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Np, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def one(x):
        return pl.pallas_call(
            functools.partial(attn_kernel, heads=heads, q_chunk=q_chunk, mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
            grid=(B,),
            in_specs=[xspec] + [full(a) for a in w],
            out_specs=xspec,
            compiler_params=_VMEM,
        )(x, *w)

    @jax.jit
    def f(x):
        h = x
        for _ in range(depth):
            h = one(h)
        return h.astype(jnp.float32).sum()
    return f


B, Np, C, heads = 64, 1040, 384, 6
x = jnp.asarray(r.standard_normal((B, Np, C)).astype(np.float32)).astype(jnp.bfloat16)
print(f"=== attn-half ablation (GT shape, {B}x{Np}x{C}, 8 chained) ===", flush=True)
for mode in ("full", "no_softmax", "no_attn", "aligned_hcat", "ident"):
    timeit(mode, build(B, Np, C, heads, mode), x)

# ---------------- CLAP-2023 decomposition ----------------
from heart_murmur_detection_tpu.audio.dsp import logmel_frontend_general
from heart_murmur_detection_tpu.models.clap import (
    CLAPConfig, clap_audio_forward_fused,
)
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused
from heart_murmur_detection_tpu.models.clap import CLAPAudioEncoder

cfg = CLAPConfig(version="2023")
Bc = 32
n = int(cfg.duration * cfg.sample_rate)
n = (n + cfg.hop - 1) // cfg.hop * cfg.hop
model = CLAPAudioEncoder(cfg)
with jax.default_device(jax.devices("cpu")[0]):
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, n)),
                   jnp.full((1,), n, jnp.int32))
v = jax.device_put(v, jax.devices()[0])
wav = jnp.asarray(r.standard_normal((Bc, n)).astype(np.float32) * 0.1)
lengths = jnp.full((Bc,), n, jnp.int32)

print(f"\n=== CLAP-2023 (B={Bc}, {cfg.duration}s @44.1k) ===", flush=True)
timeit("full fused graph",
       jax.jit(lambda v, w, l: clap_audio_forward_fused(
           v, w, l, cfg, fast_softmax=True).sum()), v, wav, lengths)
timeit("frontend only (HIGHEST)",
       jax.jit(lambda w, l: logmel_frontend_general(
           w, l, cfg.sample_rate, cfg.mel_bins, cfg.fmin, cfg.fmax,
           cfg.n_fft, cfg.hop)[0].sum()), wav, lengths)


@jax.jit
def tower_only(v, logmel, nf):
    sub = {"params": v["params"]["base"], "batch_stats": v["batch_stats"]["base"]}
    return htsat_apply_fused(
        sub, logmel, nf, HTSATConfig(mel_bins=cfg.mel_bins,
                                     num_classes=cfg.classes_num),
        mm_dtype=jnp.bfloat16, fast_softmax=True).sum()


logmel, nf = jax.jit(lambda w, l: logmel_frontend_general(
    w, l, cfg.sample_rate, cfg.mel_bins, cfg.fmin, cfg.fmax, cfg.n_fft,
    cfg.hop))(wav, lengths)
np.asarray(logmel)
timeit("tower only (bf16 fused)", tower_only, v, logmel, nf)
