"""Training-path fused MAE forward: same flax variables tree as
models.vit_mae.MaskedAutoencoderViT, but the 12 encoder ViT blocks run
through the custom-VJP fused Pallas train kernels (ops.pallas_vit_train),
so both directions of the encoder — the bulk of the CP step at mask-ratio
0.7 token counts — stay VMEM-resident. The swin-v2-cr decoder, the masking
gathers, and the loss stay in XLA (the decoder's 16-token windows and
meta-MLP bias are a different kernel family; fusing them is a later
optimization), exactly mirroring how models.htsat_train_fused keeps the
rolls and bn0 outside its kernels.

mae_train_loss_fused replicates MaskedAutoencoderViT.__call__ train
semantics bit-for-bit on the RNG side: the same jax.random.uniform draw
and argsort shuffle (random_masking, models/vit_mae.py), so XLA-vs-fused
loss trajectories are directly comparable. pretrain/mae_training.py swaps
it in via `fused_train` (auto: TPU + bf16 + no mesh, like the COLA flag).

Reference context: the CP objective of
/root/reference/src/pretrain/mae_training.py:141-368 and
src/model/models_mae.py:1129-1154 (masked-patch MSE, mask_ratio 0.7).

Numerics: tests/test_mae_train_fused.py checks the loss and all encoder/
decoder gradients against jax.grad of model.apply in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_vit import pad_tokens
from ..ops.pallas_vit_train import fused_vit_block_train
from .vit_fused import _ln, _patch_embed
from .vit_mae import MAEConfig, MaskedAutoencoderViT, sincos_pos_embed_flexible


def mae_encode_train_fused(
    params: dict,
    x: jnp.ndarray,
    rng,
    cfg: MAEConfig,
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
    noise=None,
):
    """Masked encoder forward with fused differentiable blocks.

    x (B, H, W) spectrogram -> (h (B, 1+len_keep, D) post-norm tokens,
    mask (B, L), ids_restore (B, L)). RNG semantics identical to
    MaskedAutoencoderViT.random_masking. `noise` (B, L) overrides the
    in-function uniform draw — the data-parallel shard_map path hoists the
    draw outside the shard so each shard sees exactly the rows the
    single-device run would (pretrain/mae_training.py).
    """
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    pe = params["patch_embed_proj"]
    # patch-embed conv stays f32: its bf16-in/f32-out form has no valid
    # autodiff transpose (lax conv requires matching operand dtypes), and it
    # is negligible next to the 12 fused blocks — same choice as
    # models/htsat_train_fused.py's patch_embed.
    h = _patch_embed(x, pe["kernel"], pe["bias"], cfg.patch_size, jnp.float32)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h.astype(jnp.float32) + pos[:, 1 : h.shape[1] + 1]

    B, L, D = h.shape
    len_keep = int(L * (1 - cfg.mask_ratio))
    if noise is None:
        noise = jax.random.uniform(rng, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    # keep-token selection as a one-hot matmul (TPU gathers serialize per
    # row; exact to f32 roundoff at HIGHEST — same trick as the decoder's
    # unshuffle in models/mae_decoder_opt.py)
    sel = (ids_keep[:, :, None] == jnp.arange(L)[None, None, :]).astype(
        jnp.float32
    )
    h = jnp.einsum("bkj,bjd->bkd", sel, h,
                   precision=jax.lax.Precision.HIGHEST)
    mask = jnp.ones((B, L)).at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)

    cls = params["cls_token"] + pos[:, :1]
    h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), h], axis=1)

    h, n_real = pad_tokens(h, 16)
    h = h.astype(act_dtype)
    for i in range(cfg.depth):
        h = fused_vit_block_train(
            h, params[f"blocks_{i}"], n_real, num_heads=cfg.num_heads,
            q_chunk=q_chunk, mm_dtype=mm_dtype, interpret=interpret,
        )
    h = h[:, :n_real].astype(jnp.float32)
    return _ln(h, params["norm"]), mask, ids_restore


def audiomae_backbone_train_fused(
    params: dict,
    x: jnp.ndarray,
    cfg: MAEConfig,
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """AudioMAEClassifierBackbone forward (models/vit_mae.py:465-500) with
    the 12 ViT-B blocks as custom-VJP fused train kernels — the audiomae
    fine-tuning path's encoder fwd+bwd (reference
    src/benchmark/baseline/audioMAE/finetuning.py classifier backbone).
    params: the flax 'encoder' subtree (patch_embed_proj, cls_token,
    blocks_i, fc_norm). Returns the (B, D) fc_norm'd mean-token feature.
    """
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    B, T, F = x.shape
    x = jnp.pad(x, ((0, 0), (0, cfg.img_size[0] - T), (0, cfg.img_size[1] - F)))
    pe = params["patch_embed_proj"]
    # patch-embed conv stays f32: its bf16-in/f32-out form has no valid
    # autodiff transpose (lax conv requires matching operand dtypes), and it
    # is negligible next to the 12 fused blocks — same choice as
    # models/htsat_train_fused.py's patch_embed.
    h = _patch_embed(x, pe["kernel"], pe["bias"], cfg.patch_size, jnp.float32)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h.astype(jnp.float32) + pos[:, 1 : h.shape[1] + 1]
    B_, L, D = h.shape
    cls = params["cls_token"] + pos[:, :1]
    h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), h], axis=1)
    h, n_real = pad_tokens(h, 16)
    h = h.astype(act_dtype)
    for i in range(cfg.depth):
        h = fused_vit_block_train(
            h, params[f"blocks_{i}"], n_real, num_heads=cfg.num_heads,
            q_chunk=q_chunk, mm_dtype=mm_dtype, interpret=interpret,
        )
    h = h[:, 1:n_real].astype(jnp.float32).mean(axis=1)
    return _ln(h, params["fc_norm"])


def gt_backbone_train_fused(
    params: dict,
    x: jnp.ndarray,
    cfg: MAEConfig,
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """GTBackbone forward (train/finetune.py GTBackbone -> MAE
    forward_feature, models/vit_mae.py:455-462) with fused differentiable
    blocks — the operaGT fine-tuning encoder. params: the flax 'mae'
    subtree. Returns the (B, D) LN'd mean-token feature."""
    act_dtype = jnp.bfloat16 if mm_dtype == jnp.bfloat16 else jnp.float32
    pe = params["patch_embed_proj"]
    h = _patch_embed(x, pe["kernel"], pe["bias"], cfg.patch_size, jnp.float32)
    pos = jnp.asarray(
        sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
    )[None]
    h = h.astype(jnp.float32) + pos[:, 1 : h.shape[1] + 1]
    B, L, D = h.shape
    cls = params["cls_token"] + pos[:, :1]
    h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), h], axis=1)
    h, n_real = pad_tokens(h, 16)
    h = h.astype(act_dtype)
    for i in range(cfg.depth):
        h = fused_vit_block_train(
            h, params[f"blocks_{i}"], n_real, num_heads=cfg.num_heads,
            q_chunk=q_chunk, mm_dtype=mm_dtype, interpret=interpret,
        )
    h = h[:, 1:n_real].astype(jnp.float32).mean(axis=1)
    return _ln(h, params["norm"])


def mae_train_loss_fused(
    model: MaskedAutoencoderViT,
    params: dict,
    x: jnp.ndarray,
    rng,
    *,
    mm_dtype=jnp.float32,
    q_chunk: int = 128,
    interpret: bool = False,
    noise=None,
    decoder_opt: bool = False,
):
    """Full CP training loss with the fused encoder; decoder + masked MSE in
    XLA via model.apply(method=forward_decoder), or — decoder_opt=True, the
    TPU production policy — via models.mae_decoder_opt.decoder_forward_opt
    (packed-window bf16 swin-v2-cr blocks; the decoder is ~95% of the step
    at f32, bench/mae_fused_enc_check.py round 5). Equals
    model.apply({'params': params}, x, rng=rng)[0] to the documented fused
    train-kernel precision class."""
    cfg = model.config
    h, mask, ids_restore = mae_encode_train_fused(
        params, x, rng, cfg, mm_dtype=mm_dtype, q_chunk=q_chunk,
        interpret=interpret, noise=noise,
    )
    if decoder_opt:
        from .mae_decoder_opt import decoder_forward_opt

        pred = decoder_forward_opt(
            params, h, ids_restore, cfg, mm_dtype=mm_dtype
        )
    else:
        pred = model.apply(
            {"params": params}, h, ids_restore, method=model.forward_decoder
        )
    p = cfg.patch_size
    B, H, W = x.shape
    target = (
        x.reshape(B, H // p, p, W // p, p)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, (H // p) * (W // p), p * p)
    )
    if cfg.norm_pix_loss:
        mu = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + 1e-6)
    loss = ((pred - target) ** 2).mean(-1)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
