"""Flash attention for the ViT encoders (operaGT ViT-S, Audio-MAE ViT-B).

At their sequence lengths (1025 / 497 tokens incl. cls) the XLA attention
materializes per-layer logits in HBM (B·heads·N² f32 — ~1.6 GB/layer for
ViT-S at batch 64), which makes the MAE extraction paths HBM-bound
(bench/zoo_throughput.py: 430 clips/s vs operaCT's 2048). The in-tree Pallas
TPU flash kernel (jax.experimental.pallas.ops.tpu.flash_attention) keeps the
running softmax in VMEM and has a custom VJP, so it serves both extraction
and CP training.

The cls token makes N odd (1025/497); the kernel needs block-divisible
sequence lengths, so q/k/v are zero-padded to a multiple of 128 and the
padding is excluded EXACTLY via SegmentIds (padded tokens form their own
segment; real<->pad attention is masked inside the kernel). Padded rows of
the output are sliced away.
"""

from __future__ import annotations

import jax.numpy as jnp


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def flash_vit_attention(q, k, v, sm_scale: float):
    """(B, heads, N, hd) self-attention via the Pallas TPU flash kernel.

    Exact w.r.t. softmax(q k^T * sm_scale) v up to kernel accumulation order;
    arbitrary N (zero-pad + segment mask to the 128-multiple the kernel
    needs).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, N, D = q.shape
    Np = _round_up(N, 128)
    seg = None
    if Np != N:
        pad = ((0, 0), (0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        ids = (jnp.arange(Np) < N).astype(jnp.int32)[None, :].repeat(B, axis=0)
        seg = SegmentIds(q=ids, kv=ids)
    blk = min(512, Np)
    while Np % blk:
        blk //= 2
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        q, k, v, segment_ids=seg, sm_scale=sm_scale, block_sizes=sizes
    )
    return out[:, :, :N] if Np != N else out
