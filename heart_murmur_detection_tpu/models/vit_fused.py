"""Fused-inference MAE-ViT forwards: same variables trees as
models.vit_mae.{MaskedAutoencoderViT, AudioMAEClassifierBackbone}, but the
encoder blocks run through the fused Pallas ViT kernels (ops.pallas_vit).
Eval-mode only (extraction / LP feature path), mirroring models.htsat_fused.

Routing policy (16 MB scoped-VMEM):
- ViT-S (operaGT, C=384): whole block in one kernel when block_plan fits,
  else the split (attention, MLP) kernel pair.
- ViT-B (audiomae, C=768): always the split pair — one block's weights are
  ~14 MB in bf16 alone.

Numerics match the flax forwards to the pallas_swin precision class
(tests/test_pallas_vit.py; feature cosine >= 0.9999 on hardware, PARITY.md).

Reference parity context: MaskedAutoencoderViT.forward_feature implements
/root/reference/src/model/models_mae.py:1032-1050 (mean tokens -> norm);
the audiomae backbone implements VisionTransformer.forward_feature
(models_mae.py:1193-1224, global-pool mean -> fc_norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_vit import (
    block_plan,
    fused_vit_attn,
    fused_vit_block,
    fused_vit_mlp,
    pad_tokens,
)
from .vit_mae import MAEConfig, sincos_pos_embed_flexible

HI = jax.lax.Precision.HIGHEST


def _ln(x, p, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _patch_embed(x, kernel, bias, patch: int, act_dtype):
    """(B, H, W) -> (B, L, D) via the stride-p conv, bf16-in/f32-accumulate
    when act_dtype is bf16 (tiny K = p*p contraction, same as htsat_fused)."""
    if act_dtype == jnp.bfloat16:
        h = jax.lax.conv_general_dilated(
            x[..., None].astype(act_dtype), kernel.astype(act_dtype),
            window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias
    else:
        h = jax.lax.conv_general_dilated(
            x[..., None], kernel,
            window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=HI,
        ) + bias
    B, Hp, Wp, D = h.shape
    return h.reshape(B, Hp * Wp, D)


def _encode(h, params, cfg: MAEConfig, mm_dtype, q_chunk: int,
            interpret: bool = False, fast_softmax: bool = False):
    """Shared block stack: pad tokens, run depth fused blocks, unpad."""
    return _encode_blocks(
        h, params, cfg.depth, cfg.num_heads, cfg.mlp_ratio, mm_dtype,
        q_chunk, interpret=interpret, fast_softmax=fast_softmax,
    )


def _encode_blocks(h, params, depth: int, num_heads: int, mlp_ratio: float,
                   mm_dtype, q_chunk: int, interpret: bool = False,
                   fast_softmax: bool = False):
    h, n_real = pad_tokens(h, 16)
    Np, C = h.shape[1], h.shape[2]
    hidden = int(C * mlp_ratio)
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    h = h.astype(act_dtype)
    whole = block_plan(Np, C, hidden, num_heads, mm_dtype, act_dtype,
                       q_chunk=q_chunk)
    for i in range(depth):
        p = params[f"blocks_{i}"]
        if whole is not None:
            h = fused_vit_block(
                h, p, n_real, num_heads=num_heads, q_chunk=q_chunk,
                mm_dtype=mm_dtype, fast_softmax=fast_softmax,
                interpret=interpret,
            )
        else:
            h = fused_vit_attn(
                h, p, n_real, num_heads=num_heads, q_chunk=q_chunk,
                mm_dtype=mm_dtype, fast_softmax=fast_softmax,
                interpret=interpret,
            )
            h = fused_vit_mlp(h, p, mm_dtype=mm_dtype, interpret=interpret)
    return h[:, :n_real].astype(jnp.float32)


def mae_forward_feature_fused(
    variables: dict,
    mel: jnp.ndarray,
    cfg: MAEConfig = MAEConfig(),
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """operaGT LP feature: mel (B, 256, 64) -> (B, 384). Equals
    MaskedAutoencoderViT.apply(..., method=forward_feature)."""
    params = variables["params"]
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    pe = params["patch_embed_proj"]
    h = _patch_embed(mel, pe["kernel"], pe["bias"], cfg.patch_size, act_dtype)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h + pos[:, 1 : h.shape[1] + 1]
    cls = params["cls_token"] + pos[:, :1]
    h = jnp.concatenate(
        [jnp.broadcast_to(cls, (h.shape[0], 1, h.shape[2])), h], axis=1
    )
    h = _encode(h, params, cfg, mm_dtype, q_chunk, interpret=interpret,
                fast_softmax=fast_softmax)
    return _ln(h[:, 1:].mean(axis=1), params["norm"])


def audiomae_backbone_fused(
    variables: dict,
    fb: jnp.ndarray,
    cfg: MAEConfig,
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """Audio-MAE extract feature: fbank (B, T<=1024, 128) -> (B, 768).
    Equals AudioMAEClassifierBackbone.apply (zero-pad to img, encode,
    global-pool mean, fc_norm)."""
    params = variables["params"]
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    B, T, F = fb.shape
    fb = jnp.pad(
        fb, ((0, 0), (0, cfg.img_size[0] - T), (0, cfg.img_size[1] - F))
    )
    pe = params["patch_embed_proj"]
    h = _patch_embed(fb, pe["kernel"], pe["bias"], cfg.patch_size, act_dtype)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h + pos[:, 1 : h.shape[1] + 1]
    cls = params["cls_token"] + pos[:, :1]
    h = jnp.concatenate(
        [jnp.broadcast_to(cls, (B, 1, h.shape[2])), h], axis=1
    )
    h = _encode(h, params, cfg, mm_dtype, q_chunk, interpret=interpret,
                fast_softmax=fast_softmax)
    return _ln(h[:, 1:].mean(axis=1), params["fc_norm"])


def hear_forward_fused(
    variables: dict,
    audio: jnp.ndarray,
    cfg=None,
    *,
    mm_dtype=jnp.bfloat16,
    q_chunk: int = 128,
    interpret: bool = False,
    from_spectrogram: bool = False,
    fast_softmax: bool = False,
) -> jnp.ndarray:
    """HeAR pooled embedding: waveform (B, <=32000) -> (B, 512). Equals
    models.hear.HeAREncoder.apply(...)["pooled"] (ViT-L/16 over 192x128
    mel-PCEN; reference finetuning.py:1081-1104, extract_feature.py:174-210).

    ViT-L blocks always take the split (attn, MLP) kernel pair — one block's
    weights are ~25 MB bf16, past the whole-block plan. HF-ViT differences vs
    the MAE forwards: learnable (not sincos) position embeddings added to the
    cls+patch stack, and CLS-token pooling through a linear pooler. LN before
    pooling is per-token, so norm(h)[:, 0] == norm(h[:, 0])."""
    from ..audio.hear_frontend import hear_preprocess
    from .hear import HeARConfig

    cfg = cfg or HeARConfig()
    params = variables["params"]
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    # bf16 path: bf16x3 DFT/mel passes (~1e-7 rel; the mel_frontend policy)
    prec = jax.lax.Precision.HIGH if mm_dtype == jnp.bfloat16 else None
    x = audio if from_spectrogram else hear_preprocess(audio, precision=prec)
    pe = params["patch_embed_proj"]
    h = _patch_embed(x, pe["kernel"], pe["bias"], cfg.patch_size, act_dtype)
    cls = params["cls_token"]
    h = jnp.concatenate(
        [jnp.broadcast_to(cls, (h.shape[0], 1, h.shape[2])), h], axis=1
    ) + params["pos_embed"]
    h = _encode_blocks(
        h, params, cfg.depth, cfg.heads, cfg.mlp_ratio, mm_dtype, q_chunk,
        interpret=interpret, fast_softmax=fast_softmax,
    )
    cls_out = _ln(h[:, 0], params["norm"])
    p = params["pooler"]
    return cls_out @ p["kernel"] + p["bias"]
