"""Decompose the fused-bf16 extraction graph: cumulative prefixes, scalar
outputs (avoids the 100MB-fetch trap), min over rounds in one process."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json, os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp
from heart_murmur_detection_tpu.audio.dsp import resize_bicubic_time
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.htsat import HTSATConfig, _relative_position_index, _shift_attn_mask
from heart_murmur_detection_tpu.models.htsat_fused import _ln, _block_jnp
from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_block

HI = jax.lax.Precision.HIGHEST
SR = 16000
B = 64
REPS = 12
ROUNDS = int(os.environ.get("ROUNDS", 8))
cfg = HTSATConfig()
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
params = variables["params"]["encoder"]
stats = variables["batch_stats"]["encoder"]
r = np.random.default_rng(0)
clips = [
    (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(10.0 * SR)) / SR)
     + 0.05 * r.standard_normal(int(10.0 * SR))).astype(np.float32)
    for _ in range(B)
]
max_len = ((int(10.0 * SR) + 511) // 512) * 512
wav, lengths = dsp.pad_batch(clips, max_len=max_len)
wavj, lenj = jnp.asarray(wav), jnp.asarray(lengths)
MM = jnp.bfloat16


def forward_until(stop):
    """stop: 'mel', 'preamble', 's1', 's2', 's3', 's4', 'all'."""
    def fn(wav, lengths):
        mel, nf = dsp.mel_frontend(wav, lengths)
        if stop == "mel":
            return mel.sum()
        x = mel
        bn = params["bn0"]
        x = (x - stats["bn0"]["mean"]) * jax.lax.rsqrt(stats["bn0"]["var"] + 1e-5) * bn["scale"] + bn["bias"]
        target_T = cfg.spec_size * cfg.freq_ratio
        T = x.shape[1]
        if T < target_T:
            x = jnp.pad(x, ((0, 0), (0, target_T - T), (0, 0)))
        x = resize_bicubic_time(x, nf, target_T)
        x = x.reshape(B, cfg.freq_ratio, cfg.spec_size, 64)
        x = x.transpose(0, 1, 3, 2).reshape(B, cfg.freq_ratio * 64, cfg.spec_size)[..., None]
        pe = params["patch_embed"]
        x = jax.lax.conv_general_dilated(
            x, pe["proj"]["kernel"], window_strides=cfg.patch_stride, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HI,
        ) + pe["proj"]["bias"]
        Bq, Hp, Wp, D = x.shape
        x = _ln(x.reshape(B, Hp * Wp, D), pe["norm"])
        if stop == "preamble":
            return x.sum()
        res = (Hp, Wp)
        for i_layer, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2 ** i_layer)
            heads = cfg.num_heads[i_layer]
            H, W = res
            window = cfg.window_size if min(H, W) > cfg.window_size else min(H, W)
            for b in range(depth):
                shift = 0 if b % 2 == 0 else (cfg.window_size // 2 if min(H, W) > cfg.window_size else 0)
                p = params[f"layers_{i_layer}_blocks_{b}"]
                table = p["attn"]["relative_position_bias_table"]
                rel_idx = _relative_position_index(window, window).reshape(-1)
                N = window * window
                bias = table[rel_idx].reshape(N, N, heads).transpose(2, 0, 1)
                mask = jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift else None
                if dim <= 384 and window == cfg.window_size:
                    xs = x.reshape(B, H, W, dim)
                    if shift:
                        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
                    xs = fused_swin_block(xs, p, bias, mask, window=window, num_heads=heads, mm_dtype=MM)
                    if shift:
                        xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
                    x = xs.reshape(B, H * W, dim)
                else:
                    x = _block_jnp(x, p, H, W, heads, window, shift, bias, mask)
            if i_layer < len(cfg.depths) - 1:
                pm = params[f"layers_{i_layer}_downsample"]
                xs = x.reshape(B, H, W, dim)
                xs = jnp.concatenate(
                    [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]],
                    axis=-1,
                ).reshape(B, -1, 4 * dim)
                x = _ln(xs, pm["norm"]) @ pm["reduction"]["kernel"]
                res = (H // 2, W // 2)
            if stop == f"s{i_layer + 1}":
                return x.sum()
        x = _ln(x, params["norm"])
        return x.mean(axis=1).sum()
    return jax.jit(fn)

stops = ["mel", "preamble", "s1", "s2", "s3", "s4", "all"]
fns = {}
for s in stops:
    fns[s] = forward_until(s)
    np.asarray(fns[s](wavj, lenj))
    print("compiled", s, flush=True)

mins = {}
for rnd in range(ROUNDS):
    for s, fn in fns.items():
        t0 = time.time()
        for _ in range(REPS):
            y = fn(wavj, lenj)
        np.asarray(y)
        mins[s] = min(mins.get(s, 1e9), (time.time() - t0) / REPS * 1000)
    print(f"round {rnd}: " + " ".join(f"{k}={v:.1f}" for k, v in mins.items()), flush=True)

prev = 0.0
print("\ncumulative -> marginal:")
for s in stops:
    print(f"  {s:9s} cum={mins[s]:6.2f} ms  marginal={mins[s]-prev:6.2f} ms")
    prev = mins[s]
