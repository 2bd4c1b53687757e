"""Training-path fused HTS-AT forward: same flax variables tree as
models.htsat.HTSAT, but swin blocks run through the custom-VJP fused Pallas
train kernels (ops.pallas_swin_train) so BOTH directions of the CP /
fine-tune step stay VMEM-resident (bench/cp_step_decomp.py: the XLA step is
103 ms fwd + 235 ms bwd at B=64 — entirely these blocks).

Differences from the eval path (htsat_fused.htsat_apply_fused):
- bn0 runs in train mode: normalizes with batch statistics and returns the
  updated running stats (flax BatchNorm semantics: momentum 0.9, biased
  variance), threaded by the caller exactly like model.apply(mutable=
  ['batch_stats']).
- DropPath (stochastic depth, rates linspace(0, drop_path_rate) per block —
  reference htsat.py SwinTransformerBlock) is drawn HERE as per-sample keep
  multipliers (B, 1) in {0, 1/keep} and passed into the kernels. The RNG
  stream differs from flax's module-path folding — same distribution, not
  the same draws (the torch reference can't be bit-matched either; PARITY.md
  'RNG streams').
- Both cyclic rolls of shifted blocks happen outside as jnp.roll: XLA
  differentiates a roll as the inverse roll. (The eval kernel's in-kernel W
  roll is an inference-only optimization.)

cola_train_apply replicates Cola.__call__ train semantics (projector
dropout p, g -> tanh(LN) -> bilinear linear) on top, so the CP train step
can swap it in for model.apply under a flag (pretrain/cola_training.py).

Numerics: tests/test_htsat_train_fused.py checks loss and every gradient
against jax.grad of HTSAT.apply / Cola.apply (train=True, dropout and
droppath rates zeroed so both paths are deterministic) in interpret mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.dsp import resize_bicubic_time
from ..ops.pallas_swin_train import fused_swin_block_train
from .htsat import HTSATConfig, _relative_position_index, _shift_attn_mask
from .htsat_fused import _ln

HI = jax.lax.Precision.HIGHEST


def _dropout(rng, x, p):
    """flax nn.Dropout semantics: mask ~ bernoulli(keep), scale 1/keep."""
    if p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _keep_mult(rng, B, rate, dtype=jnp.float32):
    """DropPath keep multiplier (B, 1): 0 or 1/keep (htsat.DropPath)."""
    if rate == 0.0:
        return jnp.ones((B, 1), dtype)
    keep = 1.0 - rate
    mask = jnp.floor(keep + jax.random.uniform(rng, (B, 1), dtype))
    return mask / keep


def _block_jnp_train(x, p, H, W, heads, window, shift, bias, mask, k1, k2):
    """Plain jnp train-mode swin block with droppath multipliers (fallback
    for VMEM-oversized stages; f32, HIGHEST)."""
    B, L, C = x.shape
    hd = C // heads
    N = window * window
    h = _ln(x, p["norm1"]).reshape(B, H, W, C)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    hw = (
        h.reshape(B, H // window, window, W // window, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, N, C)
    )
    qkv = hw @ p["attn"]["qkv"]["kernel"] + p["attn"]["qkv"]["bias"]
    q, k, v = [
        qkv[..., i * C : (i + 1) * C].reshape(-1, N, heads, hd).transpose(0, 2, 1, 3)
        for i in range(3)
    ]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd**-0.5, k, precision=HI) + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(-1, nW, heads, N, N) + mask[None, :, None]
        attn = attn.reshape(-1, heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=HI)
    o = o.transpose(0, 2, 1, 3).reshape(-1, N, C)
    o = o @ p["attn"]["proj"]["kernel"] + p["attn"]["proj"]["bias"]
    o = (
        o.reshape(B, H // window, W // window, window, window, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    if shift:
        o = jnp.roll(o, (shift, shift), axis=(1, 2))
    x = x + k1[:, :, None] * o.reshape(B, L, C)
    m = _ln(x, p["norm2"])
    m = jax.nn.gelu(m @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"],
                    approximate=False)
    m = m @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
    return x + k2[:, :, None] * m


def bn_train(x, bn_params, bn_stats, momentum=0.9, eps=1e-5, axes=(0, 1),
             axis_name=None):
    """flax BatchNorm train mode over `axes`: normalize with batch stats,
    return (y, new_running_stats). axis_name: also reduce the moments over
    that mesh axis (sync-BN for the data-parallel shard_map path) — the
    global variance is recovered from per-shard E[x] / E[x^2], exact for
    equal shard sizes."""
    bm = x.mean(axes)
    bv = ((x - bm) ** 2).mean(axes)  # biased, like flax
    if axis_name is not None:
        ex2 = jax.lax.pmean(bv + bm * bm, axis_name)
        bm = jax.lax.pmean(bm, axis_name)
        bv = ex2 - bm * bm
    y = (x - bm) * jax.lax.rsqrt(bv + eps) * bn_params["scale"] + bn_params["bias"]
    new = {
        "mean": momentum * bn_stats["mean"] + (1.0 - momentum) * jax.lax.stop_gradient(bm),
        "var": momentum * bn_stats["var"] + (1.0 - momentum) * jax.lax.stop_gradient(bv),
    }
    return y, new


def htsat_encode_train(
    variables: dict,
    mel: jnp.ndarray,
    rng,
    n_frames=None,
    cfg: HTSATConfig = HTSATConfig(),
    mm_dtype=jnp.float32,
    max_fused_dim: Optional[int] = None,
    deterministic: bool = False,
    interpret: bool = False,
    axis_name=None,
):
    """mel (B, T, F) -> (latent (B, 768), new bn0 batch_stats dict).

    variables: the HTSAT subtree ({'params': ..., 'batch_stats': ...}).
    deterministic=True keeps droppath multipliers at 1 (for parity tests);
    bn0 still normalizes with batch statistics (train-mode semantics).
    axis_name: reduce the bn0 batch moments over that mesh axis too
    (sync-BN for the data-parallel shard_map train path).
    """
    if max_fused_dim is None:
        max_fused_dim = 384
    assert cfg.drop_rate == 0.0 and cfg.attn_drop_rate == 0.0, (
        "fused train path supports the production config (dropout rates 0; "
        "droppath handled as keep multipliers)"
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    B, T, F = mel.shape

    x, new_bn0 = bn_train(mel, params["bn0"], stats["bn0"],
                          axis_name=axis_name)

    target_T = cfg.spec_size * cfg.freq_ratio
    if n_frames is None:
        n_frames = jnp.full((B,), T, dtype=jnp.int32)
    if T < target_T:
        x = jnp.pad(x, ((0, 0), (0, target_T - T), (0, 0)))
    x = resize_bicubic_time(x, n_frames, target_T)
    x = x.reshape(B, cfg.freq_ratio, cfg.spec_size, F)
    x = x.transpose(0, 1, 3, 2).reshape(B, cfg.freq_ratio * F, cfg.spec_size)
    x = x[..., None]

    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["proj"]["kernel"],
        window_strides=cfg.patch_stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=HI,
    ) + pe["proj"]["bias"]
    B_, Hp, Wp, D = x.shape
    x = _ln(x.reshape(B, Hp * Wp, D), pe["norm"])

    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
    res = (Hp, Wp)
    for i_layer, depth in enumerate(cfg.depths):
        dim = int(cfg.embed_dim * 2**i_layer)
        heads = cfg.num_heads[i_layer]
        H, W = res
        window = cfg.window_size if min(H, W) > cfg.window_size else min(H, W)
        rel_idx = _relative_position_index(window, window).reshape(-1)
        N = window * window
        fuse_ok = dim <= max_fused_dim and window == cfg.window_size
        for b in range(depth):
            shift = (
                0
                if b % 2 == 0
                else (cfg.window_size // 2 if min(H, W) > cfg.window_size else 0)
            )
            p = params[f"layers_{i_layer}_blocks_{b}"]
            table = p["attn"]["relative_position_bias_table"]
            bias = table[rel_idx].reshape(N, N, heads).transpose(2, 0, 1)
            mask = (
                jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift else None
            )
            rate = float(dpr[sum(cfg.depths[:i_layer]) + b])
            if deterministic:
                k1 = k2 = jnp.ones((B, 1), jnp.float32)
            else:
                rng, r1, r2 = jax.random.split(rng, 3)
                k1 = _keep_mult(r1, B, rate)
                k2 = _keep_mult(r2, B, rate)
            if fuse_ok:
                xs = x.reshape(B, H, W, dim).astype(act_dtype)
                if shift:
                    xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
                xs = fused_swin_block_train(
                    xs, p, bias, mask, k1, k2,
                    window=window, num_heads=heads,
                    mm_dtype=mm_dtype, interpret=interpret,
                )
                if shift:
                    xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
                x = xs.reshape(B, H * W, dim).astype(jnp.float32)
            else:
                x = _block_jnp_train(
                    x.astype(jnp.float32), p, H, W, heads, window, shift,
                    bias, mask, k1, k2,
                )
        if i_layer < len(cfg.depths) - 1:
            pm = params[f"layers_{i_layer}_downsample"]
            xs = x.reshape(B, H, W, dim)
            xs = jnp.concatenate(
                [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2],
                 xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]],
                axis=-1,
            ).reshape(B, -1, 4 * dim)
            x = _ln(xs, pm["norm"]) @ pm["reduction"]["kernel"]
            res = (H // 2, W // 2)

    x = _ln(x, params["norm"])
    return x.mean(axis=1), {"bn0": new_bn0}


def cola_train_apply(
    variables: dict,
    pair,
    rng,
    p_drop: float = 0.1,
    cfg: HTSATConfig = HTSATConfig(),
    mm_dtype=jnp.float32,
    max_fused_dim: Optional[int] = None,
    deterministic: bool = False,
    interpret: bool = False,
    axis_name=None,
):
    """Cola.__call__ train-mode semantics with the fused htsat encoder:
    pair (x1, x2) -> ((z1 @ W, z2), new_batch_stats).

    Matches models.cola.Cola with encoder='htsat' (middle disabled — the
    resolved dim_hidden equals dim_fea): encode -> dropout -> g -> dropout
    -> tanh(LayerNorm) -> dropout, then the bilinear 'linear' on view 1.
    bn0 running stats chain through the two encoder calls in order, exactly
    like two sequential flax mutable applies.
    """
    params = variables["params"]
    x1, x2 = pair
    enc_vars = {
        "params": params["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    if axis_name is not None:
        # per-shard independent dropout/droppath draws (statistically the
        # same policy as one global draw; bit-equality with the
        # single-device run holds when the rates are 0)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    rng, re1, re2 = jax.random.split(rng, 3)
    h1, bs1 = htsat_encode_train(
        enc_vars, x1, re1, cfg=cfg, mm_dtype=mm_dtype,
        max_fused_dim=max_fused_dim, deterministic=deterministic,
        interpret=interpret, axis_name=axis_name,
    )
    enc_vars = {"params": params["encoder"], "batch_stats": bs1}
    h2, bs2 = htsat_encode_train(
        enc_vars, x2, re2, cfg=cfg, mm_dtype=mm_dtype,
        max_fused_dim=max_fused_dim, deterministic=deterministic,
        interpret=interpret, axis_name=axis_name,
    )

    def project(h, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        if not deterministic:
            h = _dropout(r1, h, p_drop)
        h = h @ params["g"]["kernel"] + params["g"]["bias"]
        if not deterministic:
            h = _dropout(r2, h, p_drop)
        ln = params["layer_norm"]
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        h = jnp.tanh((h - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"])
        if not deterministic:
            h = _dropout(r3, h, p_drop)
        return h

    rng, rp1, rp2 = jax.random.split(rng, 3)
    z1 = project(h1, rp1)
    z2 = project(h2, rp2)
    z1w = z1 @ params["linear"]["kernel"]
    return (z1w, z2), {"encoder": bs2}
