"""operaCT (HTS-AT) stage-level speed-of-light budget on the PRODUCTION
fused bf16 extraction graph: per stage, measured ms vs two ceilings —

  sol     analytic FLOPs / v5e bf16 peak (197 TFLOP/s): the MXU bound if
          every op ran at 100%
  sol_hd  the same with the attention qk/av matmuls capped by their
          head-dim contraction/output fill (hd_pad/128): the structural
          ceiling the layout experiment (bench/gt_attn_opt.py, round 5)
          showed is not closable by layout

Answers round-4 weak #2/#8: where the 18.4% whole-graph MFU goes,
stage-by-stage, and how much of the gap is structural vs unexplained.

Usage: [B=256] python -u bench/ct_stage_budget.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.htsat import (
    HTSATConfig, _relative_position_index, _shift_attn_mask,
)
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused
from heart_murmur_detection_tpu.ops.pallas_swin import (
    fused_swin_block, fused_swin_block_split, fused_swin_pair, pair_plan,
)

cfg = HTSATConfig()
B = int(os.environ.get("B", 256))
PEAK = 197e12
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
params = jax.device_put(variables["params"]["encoder"], jax.devices()[0])
stats = jax.device_put(variables["batch_stats"]["encoder"], jax.devices()[0])
r = np.random.default_rng(0)
REPS = 8


def timeit(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        for _ in range(REPS):
            y = fn(*args)
        np.asarray(y)
        best = min(best, (time.time() - t0) / REPS * 1000)
    return best


def stage_flops(i_layer, H, W, dim, heads, depth, window):
    """Analytic MAC*2 for one stage at batch B: qkv + qk + av + proj + mlp
    (+ downsample). Returns (total, attn_mm) flops."""
    N = window * window
    nW = (H // window) * (W // window)
    L = H * W
    per_block_dense = L * (dim * 3 * dim + dim * dim + 2 * dim * 4 * dim)
    per_block_attn = nW * heads * 2 * N * N * (dim // heads)
    f_dense = 2 * B * depth * per_block_dense
    f_attn = 2 * B * depth * per_block_attn
    f_down = 2 * B * (L // 4) * (4 * dim) * (2 * dim) if i_layer < 3 else 0
    return f_dense + f_attn + f_down, f_attn


def build_stage(i_layer):
    depth = cfg.depths[i_layer]
    dim = int(cfg.embed_dim * 2 ** i_layer)
    heads = cfg.num_heads[i_layer]
    H = W = 64 >> i_layer
    window = cfg.window_size if min(H, W) > cfg.window_size else min(H, W)
    N = window * window
    rel_idx = _relative_position_index(window, window).reshape(-1)

    def block_bias(p):
        t = p["attn"]["relative_position_bias_table"]
        return jnp.asarray(t)[jnp.asarray(rel_idx)].reshape(N, N, heads).transpose(2, 0, 1)

    blocks = []
    for b in range(depth):
        shift = 0 if b % 2 == 0 else (cfg.window_size // 2 if min(H, W) > cfg.window_size else 0)
        p = params[f"layers_{i_layer}_blocks_{b}"]
        blocks.append((p, shift))

    hidden = 4 * dim
    mm = jnp.bfloat16

    @jax.jit
    def fn(x):
        b = 0
        while b < depth:
            p, shift = blocks[b]
            shift_next = blocks[b + 1][1] if b + 1 < depth else 0
            fuse_ok = dim <= 384
            if (
                fuse_ok and shift == 0 and b + 1 < depth and shift_next
                and pair_plan(B, H, W, dim, heads, hidden, mm, window,
                              act_dtype=jnp.bfloat16)
            ):
                p2 = blocks[b + 1][0]
                mask = jnp.asarray(_shift_attn_mask(H, W, window, shift_next))
                xs = fused_swin_pair(
                    x.reshape(B, H, W, dim), p, p2, block_bias(p),
                    block_bias(p2), mask, window=window, num_heads=heads,
                    shift=shift_next, mm_dtype=mm, fast_softmax=True,
                )
                x = xs.reshape(B, H * W, dim)
                b += 2
                continue
            bias = block_bias(p)
            mask = jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift else None
            xs = x.reshape(B, H, W, dim)
            if shift:
                xs = jnp.roll(xs, -shift, axis=1)
            bf = fused_swin_block if fuse_ok else fused_swin_block_split
            xs = bf(xs, p, bias, mask, window=window, num_heads=heads,
                    mm_dtype=mm, roll_w=shift, fast_softmax=True)
            if shift:
                xs = jnp.roll(xs, shift, axis=1)
            x = xs.reshape(B, H * W, dim)
            b += 1
        if i_layer < 3:
            pm = params[f"layers_{i_layer}_downsample"]
            xs = x.reshape(B, H, W, dim)
            xs = jnp.concatenate(
                [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2],
                 xs[:, 1::2, 1::2]], axis=-1,
            ).reshape(B, -1, 4 * dim)
            mu = xs.mean(-1, keepdims=True)
            var = ((xs - mu) ** 2).mean(-1, keepdims=True)
            xs = (xs - mu) * jax.lax.rsqrt(var + 1e-5) * pm["norm"]["scale"] + pm["norm"]["bias"]
            x = jnp.matmul(
                xs.astype(jnp.bfloat16),
                pm["reduction"]["kernel"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum()

    return fn, (B, H * W, dim), (H, W, dim, heads, depth, window)


# whole production graph first (mel + encoder), for the roll-up
wav = jnp.asarray(r.standard_normal((B, 160256)).astype(np.float32) * 0.1)
lens = jnp.asarray(np.full((B,), 160000, np.int32))


@jax.jit
def whole(wav, lens):
    mel, nf = dsp.mel_frontend(wav, lens, precision=jax.lax.Precision.HIGH)
    return htsat_apply_fused(
        {"params": params, "batch_stats": stats}, mel, nf, cfg,
        mm_dtype=jnp.bfloat16, fast_softmax=True,
    )


@jax.jit
def mel_only(wav, lens):
    mel, nf = dsp.mel_frontend(wav, lens, precision=jax.lax.Precision.HIGH)
    return mel.sum()


t_whole = timeit(whole, wav, lens)
t_mel = timeit(mel_only, wav, lens)
print(f"whole graph: {t_whole:.2f} ms/batch-{B} ({B / t_whole * 1000:.0f} clips/s)")
print(f"mel frontend: {t_mel:.2f} ms", flush=True)

print(f"\n{'stage':28s} {'ms':>8s} {'sol':>7s} {'sol_hd':>7s} {'MFU':>6s} {'gap_vs_hd':>9s}")
tot = t_mel
for i in range(4):
    fn, shape, (H, W, dim, heads, depth, window) = build_stage(i)
    x = jnp.asarray(r.standard_normal(shape).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    ms = timeit(fn, x)
    tot += ms
    f_all, f_attn = stage_flops(i, H, W, dim, heads, depth, window)
    hd = dim // heads
    hdp = ((hd + 31) // 32) * 32
    sol = f_all / PEAK * 1000
    # attention matmuls capped at hdp/128 fill (contraction for qk, output
    # lanes for av); dense at 100%
    sol_hd = ((f_all - f_attn) / PEAK + f_attn / (PEAK * hdp / 128)) * 1000
    mfu = f_all / (ms / 1000) / PEAK
    print(f"stage{i} C={dim:<4d} hd={hd:<3d} d={depth} {ms:8.2f} {sol:7.2f} "
          f"{sol_hd:7.2f} {mfu:6.1%} {ms / sol_hd:8.2f}x")
print(f"{'mel + sum of stages':28s} {tot:8.2f}  (whole {t_whole:.2f} — "
      f"tscam/latent/resize account for the rest)")
