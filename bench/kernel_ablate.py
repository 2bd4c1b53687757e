"""Ablate the fused swin kernel on stage-1 geometry (bf16): which part costs?
Variants monkeypatch pieces to identity. Same-process min-over-rounds."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.htsat import _relative_position_index
import heart_murmur_detection_tpu.ops.pallas_swin as ps

B = 64
REPS = 16
ROUNDS = int(os.environ.get("ROUNDS", 8))
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
p = variables["params"]["encoder"]["layers_0_blocks_0"]
heads, window, N = 4, 8, 64
table = np.asarray(p["attn"]["relative_position_bias_table"])
rel_idx = np.asarray(_relative_position_index(window, window).reshape(-1))
bias = jnp.asarray(table[rel_idx].reshape(N, N, heads).transpose(2, 0, 1))
r = np.random.default_rng(0)
x = jnp.asarray(r.standard_normal((B, 64, 64, 96)).astype(np.float32) * 0.1)


def make_kernel(mode):
    """mode: full | no_attn (skip per-head attention; o=h tail) | no_mlp |
    ln_only (just LN1 + residual) | copy (pure read->write) |
    no_gelu (full, gelu->identity) | no_softmax (full, softmax->identity) |
    one_head (full but a single head's attention result reused 4x)"""
    def _kernel(x_ref, mask_ref, w_qkv, b_qkv, w_proj, b_proj, bias_ref,
                ln1_s, ln1_b, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2,
                out_ref, *, bb, tw, win, heads, use_mask, hdp, mm_dtype, roll_w, **_):
        C = x_ref.shape[-1]
        hd = C // heads
        Nn = win * win
        nw = bb * tw
        Cp = heads * hdp
        mm = lambda a: a.astype(mm_dtype)
        prec = None
        xx = x_ref[:]
        if mode == "copy":
            out_ref[:] = xx
            return
        xw = xx.reshape(bb, win, tw, win, C).transpose(0, 2, 1, 3, 4).reshape(nw, Nn, C)
        tww = nw
        h = ps._ln(xw, ln1_s[0], ln1_b[0])
        if mode == "ln_only":
            out = xw + h
        else:
            qkv = (jnp.dot(mm(h.reshape(tww * Nn, C)), mm(w_qkv[:]), precision=prec,
                           preferred_element_type=jnp.float32) + b_qkv[0]
                   ).reshape(tww, Nn, 3 * Cp)
            if mode == "no_attn":
                o = qkv[:, :, :Cp]
            elif mode in ("batched_heads", "batched_fast"):
                nwv = tww
                qs = jnp.concatenate([qkv[:, :, hh*hdp:hh*hdp+hdp] for hh in range(heads)], 0)
                ks = jnp.concatenate([qkv[:, :, Cp+hh*hdp:Cp+hh*hdp+hdp] for hh in range(heads)], 0)
                vs = jnp.concatenate([qkv[:, :, 2*Cp+hh*hdp:2*Cp+hh*hdp+hdp] for hh in range(heads)], 0)
                a = jax.lax.dot_general(mm(qs * (hd ** -0.5)), mm(ks),
                                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                        precision=prec, preferred_element_type=jnp.float32)
                a = a + jnp.repeat(bias_ref[:], nwv, axis=0)
                if mode == "batched_fast":
                    e = jnp.exp(a)
                    a = e / jnp.sum(e, -1, keepdims=True)
                else:
                    a = jax.nn.softmax(a, axis=-1)
                ost = jax.lax.dot_general(mm(a), mm(vs),
                                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                          precision=prec, preferred_element_type=jnp.float32)
                o = jnp.concatenate([ost[hh*nwv:(hh+1)*nwv] for hh in range(heads)], axis=-1)
            else:
                outs = []
                nh = 1 if mode == "one_head" else heads
                for hh in range(nh):
                    qh = qkv[:, :, hh * hdp: hh * hdp + hdp]
                    kh = qkv[:, :, Cp + hh * hdp: Cp + hh * hdp + hdp]
                    vh = qkv[:, :, 2 * Cp + hh * hdp: 2 * Cp + hh * hdp + hdp]
                    a = jax.lax.dot_general(mm(qh * (hd ** -0.5)), mm(kh),
                                            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                            precision=prec, preferred_element_type=jnp.float32)
                    a = a + bias_ref[hh]
                    if mode == "fast_softmax":
                        e = jnp.exp(a)
                        a = e / jnp.sum(e, -1, keepdims=True)
                    elif mode != "no_softmax":
                        a = jax.nn.softmax(a, axis=-1)
                    outs.append(jax.lax.dot_general(mm(a), mm(vh),
                                                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                                    precision=prec, preferred_element_type=jnp.float32))
                o = jnp.concatenate(outs * (heads // nh), axis=-1)
            o = (jnp.dot(mm(o.reshape(tww * Nn, Cp)), mm(w_proj[:]), precision=prec,
                         preferred_element_type=jnp.float32) + b_proj[0]).reshape(tww, Nn, C)
            h1 = xw + o
            if mode == "no_mlp":
                out = h1
            else:
                m = ps._ln(h1, ln2_s[0], ln2_b[0]).reshape(tww * Nn, C)
                m = (jnp.dot(mm(m), mm(w_fc1[:]), precision=prec,
                             preferred_element_type=jnp.float32) + b_fc1[0])
                if mode != "no_gelu":
                    m = ps._gelu_exact(m)
                m = (jnp.dot(mm(m), mm(w_fc2[:]), precision=prec,
                             preferred_element_type=jnp.float32) + b_fc2[0]).reshape(tww, Nn, C)
                out = h1 + m
        out_ref[:] = out.reshape(bb, tww // bb, win, win, C).transpose(
            0, 2, 1, 3, 4).reshape(bb, win, (tww // bb) * win, C)
    return _kernel

# Methodology: chain CHAIN kernel applications inside ONE jit with a scalar
# output. A single timed call then contains CHAIN device-side applications and
# transfers 4 bytes — per-call dispatch latency and the D2H pull (which
# dominate naive per-op timing through the axon tunnel: x+1 on the 100MB
# tensor "costs" 133 ms that way) divide out.
CHAIN = int(os.environ.get("CHAIN", 8))


def run_variant(mode):
    orig = ps._kernel
    ps._kernel = make_kernel(mode)
    try:
        def chain(x):
            for _ in range(CHAIN):
                x = ps.fused_swin_block(
                    x, p, bias, None, num_heads=heads, mm_dtype=jnp.bfloat16)
            return x.sum()
        f = jax.jit(chain)
        np.asarray(f(x))
        return f
    finally:
        ps._kernel = orig

variants = {}
MODES = os.environ.get("MODES", "full,no_mlp,no_attn,ln_only,copy,no_gelu,no_softmax,one_head").split(",")
for mode in MODES:
    try:
        variants[mode] = run_variant(mode)
        print("compiled", mode, flush=True)
    except Exception as e:
        print(mode, "failed:", type(e).__name__, str(e)[:120], flush=True)

mins = {}
for rnd in range(ROUNDS):
    for mode, f in variants.items():
        t0 = time.time()
        for _ in range(REPS):
            y = f(x)
        np.asarray(y)
        mins[mode] = min(
            mins.get(mode, 1e9), (time.time() - t0) / (REPS * CHAIN) * 1000)
print({k: round(v, 3) for k, v in mins.items()}, "ms/application")
