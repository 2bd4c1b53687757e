"""TPU-optimized MAE swin-v2-cr decoder forward (training path).

Why: the CP step decomposition (bench/mae_fused_enc_check.py, round 5)
showed the FULL step at 833 ms/B64 with the fused encoder at only 45 ms —
the 16-block f32 decoder dominates (~788 ms shared decoder+loss+Adam, ~6%
MFU). The flax decoder (models/vit_mae.py SwinV2CRBlock) is built from
(4,4)-token windows: every attention tensor has a 16-wide trailing dim that
tiles onto the 128-lane VPU at 1/8 occupancy, and all matmuls run f32.

This functional forward produces the same math with TPU-shaped tensors:

- **Window packing**: G = 128//N consecutive windows are packed per
  attention instance, scores (B*nW/G, nh, 128, 128) — full lanes for the
  bias/mask adds and softmax (the same lane-packing trick as
  ops/pallas_swin pack2). Cross-window logits get -1e9 (exp -> exact 0);
  the in-window shift-mask keeps the reference's -100 semantics.
- **Cosine attention, normalize-first**: the reference computes
  s = (q@k^T) / max(|q||k|^T, 1e-6) / clip(tau, .01) (timm swin-v2-cr,
  src/model/mae_utils/swin_transformer.py:259-452). Here q, k are L2-
  normalized per token (floor 1e-3 per factor, equal for all non-degenerate
  vectors) and 1/tau is folded into q — one elementwise pass over (L, C)
  instead of an outer-product divide over (L, L) scores.
- **bf16 matmuls** (f32 accumulation) for qkv/proj/fc1/fc2; LayerNorms,
  softmax and residual carries stay f32 — the same precision class as the
  fused extraction/train kernels (PARITY.md).
- The meta-MLP relative-position bias and the shift masks are computed
  ONCE per block as an additive (nW/G, nh, 128, 128) tensor outside the
  attention chain (they are (16,16)-sized param functions, not activation
  work).

Parity: tests/test_mae_decoder_opt.py pins decoder_forward_opt(f32) against
model.apply(method=forward_decoder) and the grads against jax.grad of the
flax path. Wired into models/mae_train_fused.mae_train_loss_fused for the
TPU bf16 CP path (pretrain/mae_training.py), same auto policy as the fused
encoder kernels.

Reference context: /root/reference/src/pretrain/mae_training.py:141-368 and
src/model/models_mae.py:1052-1107 (decoder_mode=1 16-block swin decoder).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vit_mae import MAEConfig, sincos_pos_embed_flexible


@functools.lru_cache(maxsize=None)
def _pack_mask_np(H: int, W: int, window: Tuple[int, int],
                  shift: Tuple[int, int], G: int) -> np.ndarray:
    """Static additive mask for packed windows: (nW//G, G*N, G*N) with the
    per-window shift mask (-100, reference semantics) on the diagonal blocks
    and -1e9 on cross-window entries."""
    wh, ww = window
    N = wh * ww
    nW = (H // wh) * (W // ww)
    if shift[0] or shift[1]:
        # same construction as vit_mae._shift_mask_2d, kept pure numpy:
        # jnp-created constants inside a shard_map trace become tracers
        sh, sw = shift
        img = np.zeros((H, W))
        cnt = 0
        hs = ([slice(0, -wh), slice(-wh, -sh), slice(-sh, None)]
              if sh else [slice(None)])
        ws = ([slice(0, -ww), slice(-ww, -sw), slice(-sw, None)]
              if sw else [slice(None)])
        for a in hs:
            for b in ws:
                img[a, b] = cnt
                cnt += 1
        win = (
            img.reshape(H // wh, wh, W // ww, ww)
            .transpose(0, 2, 1, 3)
            .reshape(-1, N)
        )
        d = win[:, None, :] - win[:, :, None]
        m = np.where(d != 0, -100.0, 0.0).astype(np.float32)  # (nW, N, N)
    else:
        m = np.zeros((nW, N, N), np.float32)
    out = np.full((nW // G, G * N, G * N), -1e9, np.float32)
    mg = m.reshape(nW // G, G, N, N)  # group j packs windows j*G .. j*G+G-1
    for g in range(G):
        sl = slice(g * N, (g + 1) * N)
        out[:, sl, sl] = mg[:, g]
    return out


def _meta_bias(p, window: Tuple[int, int], nh: int) -> jnp.ndarray:
    """Continuous log-spaced relative-position bias via the block's meta-MLP:
    (nh, N, N). Same math as SwinV2CRAttention (models/vit_mae.py:160-172)."""
    wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel.reshape(-1, 2).astype(np.float32)
    rel_log = np.sign(rel) * np.log1p(np.abs(rel))
    h = jnp.asarray(rel_log) @ p["meta_fc1"]["kernel"] + p["meta_fc1"]["bias"]
    h = jax.nn.relu(h)
    bias = h @ p["meta_fc2"]["kernel"] + p["meta_fc2"]["bias"]  # (N*N, nh)
    N = wh * ww
    return bias.T.reshape(nh, N, N)


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p, mm):
    return (
        jnp.dot(mm(x), mm(p["kernel"]), preferred_element_type=jnp.float32)
        + p["bias"]
    )


def swin_v2_cr_block_opt(x, p, H: int, W: int, nh: int,
                         window: Tuple[int, int], shift: Tuple[int, int],
                         mm_dtype=jnp.bfloat16):
    """One post-norm swin-v2-cr block on x (B, L=H*W, C), packed-window
    cosine attention. Numerics match SwinV2CRBlock to float tolerance."""
    B, L, C = x.shape
    hd = C // nh
    mm = lambda a: a.astype(mm_dtype)
    wh = min(window[0], H)
    ww = min(window[1], W)
    sh = 0 if H <= window[0] else shift[0]
    sw = 0 if W <= window[1] else shift[1]
    N = wh * ww
    nW = (H // wh) * (W // ww)
    G = max(g for g in range(1, min(128 // N, nW) + 1) if nW % g == 0)

    h = x.reshape(B, H, W, C)
    if sh or sw:
        h = jnp.roll(h, (-sh, -sw), axis=(1, 2))
    # window partition straight into packed groups:
    # (B, H/wh, wh, W/ww, ww, C) -> (B, nW, N, C) -> (B*nW/G, G*N, C)
    hw = (
        h.reshape(B, H // wh, wh, W // ww, ww, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B * nW // G, G * N, C)
    )

    qkv = _dense(hw, p["attn"]["qkv"], mm)  # (inst, GN, 3C) f32
    q, k, v = jnp.split(qkv, 3, axis=-1)
    inst = B * nW // G
    # NO head-concat relayouts: reinterpret the lane dim as (nh, hd) and
    # batch the dot_generals over (instance, head). The head-major
    # concat-to-batch-axis form measured 211 vs 135 ms for the 16-block
    # decoder fwd+bwd at B=32 (bench/gt_decoder_probe.py 'bdims') — the
    # per-head lane-slice concats of (.., hd=16) tensors were ~35% of the
    # block.
    q = q.reshape(inst, G * N, nh, hd)
    k = k.reshape(inst, G * N, nh, hd)
    v = v.reshape(inst, G * N, nh, hd)
    # cosine attention, normalize-first (floor per factor; equal to the
    # reference's max(|q||k|, 1e-6) joint floor for non-degenerate vectors),
    # with 1/clip(tau) folded into q
    qn = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    kn = jnp.sqrt(jnp.sum(k * k, -1, keepdims=True))
    tau = jnp.clip(p["attn"]["tau"], 0.01, None)  # (nh,)
    q = q / jnp.maximum(qn, 1e-3) / tau[None, None, :, None]
    k = k / jnp.maximum(kn, 1e-3)
    s = jax.lax.dot_general(
        mm(q), mm(k),
        dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # (inst, nh, GN, GN)

    bias = _meta_bias(p["attn"], (wh, ww), nh)  # (nh, N, N)
    eye = jnp.asarray(np.eye(G, dtype=np.float32))
    bd_bias = jnp.einsum("gh,nij->ngihj", eye, bias).reshape(nh, G * N, G * N)
    bd_mask = jnp.asarray(_pack_mask_np(H, W, (wh, ww), (sh, sw), G))
    s = (
        s.reshape(B, nW // G, nh, G * N, G * N)
        + bd_bias[None, None] + bd_mask[None, :, None]
    ).reshape(s.shape)
    s = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        mm(s), mm(v),
        dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # (inst, nh, GN, hd)
    o = o.transpose(0, 2, 1, 3).reshape(inst, G * N, C)
    o = _dense(o, p["attn"]["proj"], mm)
    # window reverse
    h = (
        o.reshape(B, H // wh, W // ww, wh, ww, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H, W, C)
    )
    if sh or sw:
        h = jnp.roll(h, (sh, sw), axis=(1, 2))
    x = x + _ln(h.reshape(B, L, C), p["norm1"])

    m = _dense(x, p["mlp_fc1"], mm)
    m = jax.nn.gelu(m, approximate=False)
    m = _dense(m, p["mlp_fc2"], mm)
    return x + _ln(m, p["norm2"])


def decoder_forward_opt(params, h, ids_restore, cfg: MAEConfig,
                        mm_dtype=jnp.bfloat16):
    """forward_decoder (models/vit_mae.py:404-420) with TPU-shaped blocks.
    params: the model's flax param tree; h (B, 1+len_keep, D) encoder tokens;
    returns (B, L, patch**2) predictions."""
    C = cfg.decoder_embed_dim
    mm = lambda a: a.astype(mm_dtype)
    h = _dense(h, params["decoder_embed"], mm)
    B = h.shape[0]
    n_mask = ids_restore.shape[1] + 1 - h.shape[1]
    mask_tokens = jnp.broadcast_to(params["mask_token"], (B, n_mask, C))
    h_ = jnp.concatenate([h[:, 1:], mask_tokens], axis=1)
    # unshuffle as a one-hot matmul instead of take_along_axis: TPU gathers
    # serialize per row, the permutation rides the MXU (rows are exact
    # one-hots; f32 HIGHEST keeps the permuted values to f32 roundoff)
    Lr = ids_restore.shape[1]
    onehot = (
        ids_restore[:, :, None] == jnp.arange(Lr)[None, None, :]
    ).astype(jnp.float32)
    h_ = jnp.einsum(
        "bij,bjd->bid", onehot, h_, precision=jax.lax.Precision.HIGHEST
    )
    h = jnp.concatenate([h[:, :1], h_], axis=1)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(C, cfg.patch_hw, cls_token=True)
    )[None]
    h = h + pos[:, : h.shape[1]]
    h = h[:, 1:]  # decoder_mode != 0 drops cls

    W = cfg.grid[1]
    L = h.shape[1]
    H = L // W  # variable-length CP: time grid from the actual token count
    for i in range(cfg.decoder_depth):
        h = swin_v2_cr_block_opt(
            h, params[f"decoder_blocks_{i}"], H, W, cfg.decoder_num_heads,
            cfg.decoder_window,
            (0, 0) if i % 2 == 0 else cfg.decoder_shift,
            mm_dtype=mm_dtype,
        )
    h = _ln(h, params["decoder_norm"])
    return _dense(h, params["decoder_pred"], mm)
