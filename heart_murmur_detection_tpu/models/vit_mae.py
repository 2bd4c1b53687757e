"""Masked-autoencoder ViT family in Flax: OPERA-GT (ViT-small, patch 4,
img 256x64) and Audio-MAE (ViT-B/16, img 1024x128).

Behavioral spec from src/model/models_mae.py (MaskedAutoencoderViTMD,
mae_vit_small :1357-1370, vit_base_patch16 :1373-1384) and the patched timm
swin-v2-cr decoder block (src/model/mae_utils/swin_transformer.py):
- fixed 2-D sin-cos pos embeds built over patch_hw == (W//p, H//p) — the
  reference's (transposed) grid convention is replicated exactly so converted
  checkpoints line up (mae_utils/patch_embed.py:15, pos_embed.py:38-55)
- encoder: patch conv -> +pos[1:L+1] -> random mask -> cls+pos[0] -> pre-norm
  ViT blocks (LN eps 1e-6) -> LN
- forward_feature: mean over tokens (no cls) THEN final LN (models_mae.py:1032-1050)
- decoder (decoder_mode=1): linear embed -> mask tokens unshuffled back ->
  +decoder pos -> drop cls -> 16 swin-v2-cr blocks (post-norm residuals,
  scaled-cosine attention with per-head tau, continuous log-CPB via a 2->384->
  heads ReLU meta-MLP, window (4,4), shift (2,0) on odd blocks) -> LN -> linear
  to p*p pixels; MSE on masked patches only
- Audio-MAE classifier path (VisionTransformer.forward_feature,
  models_mae.py:1193-1224): zero-pad input to (1024,128), global-pool tokens
  (no cls), fc_norm.

Deviation (documented): the reference decoder reshapes tokens with a
`view(B, H, W, L)` hack that only types-out for the Audio-MAE geometry and
scrambles token/channel axes for OPERA-GT (see SwinTransformerBlock
_shifted_window_attn, mae_utils/swin_transformer.py:393-398). Here feat_size
is always the true patch grid, so the GT decoder is semantically correct.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .htsat import window_partition, window_reverse


# ---------------------------------------------------------------------------
# fixed sin-cos position embeddings (reference grid convention)
# ---------------------------------------------------------------------------


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_flexible(dim: int, grid_size: Tuple[int, int], cls_token: bool):
    gh = np.arange(grid_size[0], dtype=np.float64)
    gw = np.arange(grid_size[1], dtype=np.float64)
    grid = np.stack(np.meshgrid(gw, gh), axis=0)  # w first, as reference
    emb = np.concatenate(
        [_sincos_1d(dim // 2, grid[0]), _sincos_1d(dim // 2, grid[1])], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros((1, dim)), emb], axis=0)
    return emb.astype(np.float32)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    eps: float = 1e-6
    # attention implementation: "xla" (einsum, materialized logits),
    # "flash" (Pallas TPU flash kernel, ops/flash_vit.py), or "auto"
    # (flash on TPU for N >= 256 — at ViT-S/B sequence lengths the XLA
    # logits are the HBM bottleneck; below that the kernel setup dominates).
    attn_impl: str = "xla"
    # None = exact f32. jnp.bfloat16 computes the Dense layers and attention
    # einsums in bf16 with f32 accumulation/softmax and f32 residual carries
    # + LayerNorms — the extraction-path precision class (same as the fused
    # HTS-AT kernels; see PARITY.md item 5).
    compute_dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cd = self.compute_dtype
        h = nn.LayerNorm(epsilon=self.eps, name="norm1")(x)
        B, N, C = h.shape
        nh, hd = self.num_heads, C // self.num_heads
        qkv = nn.Dense(3 * C, name="attn_qkv", dtype=cd)(h)
        # transpose-free head split: lane slices + reshape instead of the 5-D
        # (B,N,3,H,hd)->(3,B,H,N,hd) transpose (measured faster at ViT-S
        # geometry; same weights/columns so numerics are unchanged)
        q = qkv[..., 0 * C : 1 * C].reshape(B, N, nh, hd)
        k = qkv[..., 1 * C : 2 * C].reshape(B, N, nh, hd)
        v = qkv[..., 2 * C : 3 * C].reshape(B, N, nh, hd)
        impl = self.attn_impl
        if impl == "auto":
            # only pick flash when tracing for an actual TPU placement: the
            # default *backend* may be TPU while the computation is being
            # staged for CPU (e.g. registry inits params under
            # jax.default_device(cpu)), where pallas cannot lower
            dd = jax.config.jax_default_device
            on_tpu = jax.default_backend() == "tpu" and (
                dd is None or getattr(dd, "platform", "tpu") == "tpu"
            )
            impl = "flash" if on_tpu and N >= 256 else "xla"
        if impl == "flash":
            from ..ops.flash_vit import flash_vit_attention

            h = flash_vit_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), sm_scale=hd**-0.5,
            )
            h = h.transpose(0, 2, 1, 3).reshape(B, N, C)
        else:
            s = jnp.einsum(
                "bnhd,bmhd->bhnm", q * hd**-0.5, k,
                preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(s, axis=-1)
            if cd is not None:
                attn = attn.astype(cd)
            h = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v,
                preferred_element_type=jnp.float32,
            ).reshape(B, N, C)
        h = nn.Dense(C, name="attn_proj", dtype=cd)(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1", dtype=cd)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp_fc2", dtype=cd)(h)
        return x + h.astype(x.dtype)


class SwinV2CRAttention(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int]

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        Bw, L, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(Bw, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
        denom = jnp.maximum(qn @ jnp.swapaxes(kn, -2, -1), 1e-6)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / denom
        tau = self.param("tau", nn.initializers.ones, (nh,))
        attn = attn / jnp.clip(tau, 0.01, None).reshape(1, nh, 1, 1)

        # continuous log-spaced relative position bias via meta-MLP
        wh, ww = self.window
        coords = np.stack(
            np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
        ).reshape(2, -1)
        rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
        rel = rel.reshape(-1, 2).astype(np.float32)
        rel_log = np.sign(rel) * np.log1p(np.abs(rel))
        h = nn.Dense(384, name="meta_fc1")(jnp.asarray(rel_log))
        h = nn.relu(h)
        bias = nn.Dense(nh, name="meta_fc2")(h)  # (L*L, nh)
        bias = bias.T.reshape(nh, L, L)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, nh, L, L) + mask[None, :, None]
            attn = attn.reshape(Bw, nh, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        return nn.Dense(C, name="proj")(out.reshape(Bw, L, C))


class SwinV2CRBlock(nn.Module):
    """Post-norm swin block (timm v2-cr style) used as the MAE decoder."""

    dim: int
    num_heads: int
    feat_size: Tuple[int, int]
    window: Tuple[int, int]
    shift: Tuple[int, int]
    mlp_ratio: float = 4.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        H, W = self.feat_size
        B, L, C = x.shape
        if L != H * W:
            # variable-length input (multi-corpus CP feeds per-corpus max_len):
            # the freq-patch count W is fixed by the mel bins, time varies.
            # The reference's MD decoder instead hard-codes feat_size and a
            # view(B,H,W,L) shape hack (models_mae.py:663,398) — built sanely
            # here: derive the time grid from the actual token count.
            H = L // W
        wh = min(self.window[0], H)
        ww = min(self.window[1], W)
        sh = 0 if H <= self.window[0] else self.shift[0]
        sw = 0 if W <= self.window[1] else self.shift[1]
        h = x.reshape(B, H, W, C)
        if sh or sw:
            h = jnp.roll(h, (-sh, -sw), axis=(1, 2))
        hw = _window_partition_2d(h, (wh, ww))
        mask = _shift_mask_2d(H, W, (wh, ww), (sh, sw)) if (sh or sw) else None
        hw = SwinV2CRAttention(C, self.num_heads, (wh, ww), name="attn")(hw, mask)
        h = _window_reverse_2d(hw, (wh, ww), H, W)
        if sh or sw:
            h = jnp.roll(h, (sh, sw), axis=(1, 2))
        h = h.reshape(B, L, C)
        x = x + nn.LayerNorm(epsilon=self.eps, name="norm1")(h)

        m = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(x)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(C, name="mlp_fc2")(m)
        x = x + nn.LayerNorm(epsilon=self.eps, name="norm2")(m)
        return x


def _window_partition_2d(x, window: Tuple[int, int]):
    B, H, W, C = x.shape
    wh, ww = window
    x = x.reshape(B, H // wh, wh, W // ww, ww, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def _window_reverse_2d(x, window: Tuple[int, int], H: int, W: int):
    wh, ww = window
    C = x.shape[-1]
    B = x.shape[0] // ((H // wh) * (W // ww))
    x = x.reshape(B, H // wh, W // ww, wh, ww, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _shift_mask_2d(H, W, window, shift):
    wh, ww = window
    sh, sw = shift
    img = np.zeros((H, W))
    cnt = 0
    hs = [slice(0, -wh), slice(-wh, -sh), slice(-sh, None)] if sh else [slice(None)]
    ws = [slice(0, -ww), slice(-ww, -sw), slice(-sw, None)] if sw else [slice(None)]
    for a in hs:
        for b in ws:
            img[a, b] = cnt
            cnt += 1
    win = (
        img.reshape(H // wh, wh, W // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    )
    m = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(m != 0, -100.0, 0.0).astype(np.float32))


# ---------------------------------------------------------------------------
# MAE model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    img_size: Tuple[int, int] = (256, 64)
    patch_size: int = 4
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    decoder_embed_dim: int = 256
    decoder_depth: int = 16  # swin decoder_mode=1 always builds 16 blocks
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    mask_ratio: float = 0.7
    norm_pix_loss: bool = False
    decoder_window: Tuple[int, int] = (4, 4)
    decoder_shift: Tuple[int, int] = (2, 0)
    # encoder ViTBlock attention: "xla" (default — measured: this XLA
    # version's own attention fusion already runs the MAE encoders at
    # parity with the Pallas flash kernel, RESULTS.md round-2 negative
    # results), "flash" (ops/flash_vit.py, exact softmax via segment
    # masking, has a custom VJP), or "auto" (flash on TPU placements at
    # N>=256)
    attn_impl: str = "xla"
    # encoder ViTBlock compute dtype: None = exact f32; jnp.bfloat16 is the
    # TPU extraction-path class (f32 softmax/accum/residuals, see ViTBlock)
    compute_dtype: Optional[object] = None

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        return self.grid[0] * self.grid[1]

    @property
    def patch_hw(self) -> Tuple[int, int]:
        # reference convention: (W//p, H//p) — pos-embed grid is transposed
        return (self.grid[1], self.grid[0])


def mae_vit_small_config(**kw) -> MAEConfig:
    """OPERA-GT (model_util.py:190-211)."""
    return MAEConfig(**kw)


def audiomae_base_config(**kw) -> MAEConfig:
    """Audio-MAE ViT-B (mae_training.py:282-309, extract_feature.py:130-137)."""
    base = dict(
        img_size=(1024, 128),
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        decoder_embed_dim=512,
        decoder_num_heads=16,
    )
    base.update(kw)
    return MAEConfig(**base)


class MaskedAutoencoderViT(nn.Module):
    config: MAEConfig = MAEConfig()

    def setup(self):
        cfg = self.config
        self.patch_proj = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed_proj",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
        )[None]
        self.decoder_pos_embed = jnp.asarray(
            sincos_pos_embed_flexible(
                cfg.decoder_embed_dim, cfg.patch_hw, cls_token=True
            )
        )[None]
        self.blocks = [
            ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                     attn_impl=cfg.attn_impl, compute_dtype=cfg.compute_dtype,
                     name=f"blocks_{i}")
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        self.decoder_embed = nn.Dense(cfg.decoder_embed_dim, name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.decoder_embed_dim)
        )
        self.decoder_blocks = [
            SwinV2CRBlock(
                cfg.decoder_embed_dim,
                cfg.decoder_num_heads,
                feat_size=cfg.grid,
                window=cfg.decoder_window,
                shift=(0, 0) if i % 2 == 0 else cfg.decoder_shift,
                name=f"decoder_blocks_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")
        self.decoder_pred = nn.Dense(cfg.patch_size**2, name="decoder_pred")

    # -- pieces ------------------------------------------------------------
    def _embed_patches(self, x):
        """x: (B, H, W) spectrogram -> (B, L, D) + pos (no cls)."""
        h = self.patch_proj(x[..., None])
        B, Hp, Wp, D = h.shape
        h = h.reshape(B, Hp * Wp, D)
        return h + self.pos_embed[:, 1 : h.shape[1] + 1]

    def random_masking(self, rng, x, mask_ratio):
        B, L, D = x.shape
        len_keep = int(L * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (B, L))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((B, L))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def forward_encoder(self, x, rng, mask_ratio):
        h = self._embed_patches(x)
        h, mask, ids_restore = self.random_masking(rng, h, mask_ratio)
        cls = self.cls_token + self.pos_embed[:, :1]
        h = jnp.concatenate([jnp.broadcast_to(cls, (h.shape[0], 1, h.shape[2])), h], 1)
        for blk in self.blocks:
            h = blk(h)
        return self.norm(h), mask, ids_restore

    def forward_decoder(self, h, ids_restore):
        cfg = self.config
        h = self.decoder_embed(h)
        B = h.shape[0]
        n_mask = ids_restore.shape[1] + 1 - h.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (B, n_mask, cfg.decoder_embed_dim)
        )
        h_ = jnp.concatenate([h[:, 1:], mask_tokens], axis=1)
        h_ = jnp.take_along_axis(h_, ids_restore[:, :, None], axis=1)
        h = jnp.concatenate([h[:, :1], h_], axis=1)
        h = h + self.decoder_pos_embed[:, : h.shape[1]]
        h = h[:, 1:]  # decoder_mode != 0 drops cls (models_mae.py:1076-1078)
        for blk in self.decoder_blocks:
            h = blk(h)
        h = self.decoder_norm(h)
        return self.decoder_pred(h)

    def patchify(self, x):
        p = self.config.patch_size
        B, H, W = x.shape
        h, w = H // p, W // p
        x = x.reshape(B, h, p, w, p)
        return x.transpose(0, 1, 3, 2, 4).reshape(B, h * w, p * p)

    def unpatchify(self, tokens):
        p = self.config.patch_size
        H, W = self.config.img_size
        h, w = H // p, W // p
        B = tokens.shape[0]
        x = tokens.reshape(B, h, w, p, p).transpose(0, 1, 3, 2, 4)
        return x.reshape(B, H, W)

    # -- entry points --------------------------------------------------------
    def __call__(self, x, rng=None, mask_ratio: Optional[float] = None):
        """Training forward: returns (loss, pred, mask)."""
        cfg = self.config
        if rng is None:
            rng = self.make_rng("masking")
        ratio = cfg.mask_ratio if mask_ratio is None else mask_ratio
        h, mask, ids_restore = self.forward_encoder(x, rng, ratio)
        pred = self.forward_decoder(h, ids_restore)
        target = self.patchify(x)
        if cfg.norm_pix_loss:
            mu = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        loss = ((pred - target) ** 2).mean(-1)
        loss = (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, pred, mask

    def forward_feature(self, x):
        """LP feature: mean tokens (no cls) then final LN (models_mae.py:1032-1050)."""
        h = self._embed_patches(x)
        cls = self.cls_token + self.pos_embed[:, :1]
        h = jnp.concatenate([jnp.broadcast_to(cls, (h.shape[0], 1, h.shape[2])), h], 1)
        for blk in self.blocks:
            h = blk(h)
        return self.norm(h[:, 1:].mean(axis=1))


class AudioMAEClassifierBackbone(nn.Module):
    """Audio-MAE fine-tune/extract backbone (VisionTransformer global_pool
    variant, models_mae.py:1173-1224): pad fbank to (1024,128), encode, mean
    tokens, fc_norm."""

    config: MAEConfig = dataclasses.field(default_factory=audiomae_base_config)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        B, T, F = x.shape
        x = jnp.pad(x, ((0, 0), (0, cfg.img_size[0] - T), (0, cfg.img_size[1] - F)))
        h = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed_proj",
        )(x[..., None])
        Bh, Hp, Wp, D = h.shape
        h = h.reshape(B, Hp * Wp, D)
        pos = jnp.asarray(
            sincos_pos_embed_flexible(cfg.embed_dim, cfg.patch_hw, cls_token=True)
        )[None]
        h = h + pos[:, 1 : h.shape[1] + 1]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        cls = cls_token + pos[:, :1]
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), h], axis=1)
        for i in range(cfg.depth):
            h = ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                         attn_impl=cfg.attn_impl, compute_dtype=cfg.compute_dtype,
                         name=f"blocks_{i}")(h)
        h = h[:, 1:].mean(axis=1)
        return nn.LayerNorm(epsilon=1e-6, name="fc_norm")(h)
