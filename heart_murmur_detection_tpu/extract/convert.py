"""Torch checkpoint -> Flax params conversion.

The reference restores encoders with ``load_state_dict(ckpt["state_dict"],
strict=False)`` relying on key-prefix overlap (finetuning.py:1171,
model_util.py:134). Here conversion is explicit: each converter walks the
torch key space and emits the matching flax param/batch-stats tree.

Tensor layout rules:
- Linear  (out,in)        -> kernel (in,out)           [transpose]
- Conv2d  (out,in,kh,kw)  -> kernel (kh,kw,in,out)
- Depthwise Conv2d (out,1,kh,kw) -> (kh,kw,1,out)
- LayerNorm/BatchNorm weight/bias -> scale/bias; running_* -> batch_stats
- relative_position_bias_table et al. copied as-is

Loading is torch-free at runtime: `.ckpt`/`.pth` files are read with
torch.load(map_location='cpu') when torch is present (it is in this image),
and converted trees are cached as msgpack next to the source checkpoint.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "cpu")}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(sd, tkey, tree, fpath, bias=True):
    _set(tree, fpath + ("kernel",), sd[tkey + ".weight"].T)
    if bias and tkey + ".bias" in sd:
        _set(tree, fpath + ("bias",), sd[tkey + ".bias"])


def _conv(sd, tkey, tree, fpath, depthwise=False):
    w = sd[tkey + ".weight"]
    # torch (out, in/groups, kh, kw) -> flax (kh, kw, in/groups, out); for
    # depthwise convs in/groups == 1 and flax expects (kh, kw, 1, out)
    w = w.transpose(2, 3, 1, 0)
    _set(tree, fpath + ("kernel",), w)
    if tkey + ".bias" in sd:
        _set(tree, fpath + ("bias",), sd[tkey + ".bias"])


def _ln(sd, tkey, tree, fpath):
    _set(tree, fpath + ("scale",), sd[tkey + ".weight"])
    _set(tree, fpath + ("bias",), sd[tkey + ".bias"])


def _bn(sd, tkey, params, stats, fpath):
    _set(params, fpath + ("scale",), sd[tkey + ".weight"])
    _set(params, fpath + ("bias",), sd[tkey + ".bias"])
    _set(stats, fpath + ("mean",), sd[tkey + ".running_mean"])
    _set(stats, fpath + ("var",), sd[tkey + ".running_var"])


def _strip_prefix(sd: Dict[str, np.ndarray], prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                out[k[len(p) :]] = v
                break
    return out or sd


# ---------------------------------------------------------------------------
# HTS-AT (OPERA-CT)
# ---------------------------------------------------------------------------

_HTSAT_DEPTHS = (2, 2, 6, 2)


def convert_htsat(sd: Dict[str, np.ndarray], prefix: str = "") -> Tuple[dict, dict]:
    """Convert an HTSAT_Swin_Transformer state_dict subtree.

    prefix: torch key prefix up to and including 'htsat.' (e.g.
    'encoder.encoder.htsat.' inside a Cola checkpoint).
    Returns (params, batch_stats) for models.htsat.HTSAT.
    """
    params: dict = {}
    stats: dict = {}
    p = prefix
    _bn(sd, p + "bn0", params, stats, ("bn0",))
    _conv(sd, p + "patch_embed.proj", params, ("patch_embed", "proj"))
    _ln(sd, p + "patch_embed.norm", params, ("patch_embed", "norm"))

    for i, depth in enumerate(_HTSAT_DEPTHS):
        for b in range(depth):
            tp = f"{p}layers.{i}.blocks.{b}."
            fp = f"layers_{i}_blocks_{b}"
            _ln(sd, tp + "norm1", params, (fp, "norm1"))
            _set(
                params,
                (fp, "attn", "relative_position_bias_table"),
                sd[tp + "attn.relative_position_bias_table"],
            )
            _linear(sd, tp + "attn.qkv", params, (fp, "attn", "qkv"))
            _linear(sd, tp + "attn.proj", params, (fp, "attn", "proj"))
            _ln(sd, tp + "norm2", params, (fp, "norm2"))
            _linear(sd, tp + "mlp.fc1", params, (fp, "mlp", "fc1"))
            _linear(sd, tp + "mlp.fc2", params, (fp, "mlp", "fc2"))
        if i < len(_HTSAT_DEPTHS) - 1:
            tp = f"{p}layers.{i}.downsample."
            fp = f"layers_{i}_downsample"
            _ln(sd, tp + "norm", params, (fp, "norm"))
            _linear(sd, tp + "reduction", params, (fp, "reduction"), bias=False)

    _ln(sd, p + "norm", params, ("norm",))
    if p + "tscam_conv.weight" in sd:
        _conv(sd, p + "tscam_conv", params, ("tscam_conv",))
    return params, stats


def convert_cola_htsat(sd: Dict[str, np.ndarray]) -> dict:
    """Convert a full Cola(htsat) checkpoint -> variables for models.cola.Cola.

    Handles both Cola checkpoints (keys 'encoder.encoder.htsat.*', projector at
    top level) and bare EncoderHTSAT subtrees.
    """
    enc_prefix = None
    for cand in ("encoder.encoder.htsat.", "encoder.htsat.", "htsat."):
        if any(k.startswith(cand) for k in sd):
            enc_prefix = cand
            break
    if enc_prefix is None:
        raise KeyError("no htsat subtree found in checkpoint")
    enc_params, enc_stats = convert_htsat(sd, enc_prefix)
    params = {"encoder": enc_params}
    stats = {"encoder": enc_stats}
    if "g.weight" in sd:
        _linear(sd, "g", params, ("g",))
        _ln(sd, "layer_norm", params, ("layer_norm",))
        _linear(sd, "linear", params, ("linear",), bias=False)
        if "middle.weight" in sd:
            _linear(sd, "middle", params, ("middle",))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# EfficientNet-B0 (OPERA-CE)
# ---------------------------------------------------------------------------

_B0_NUM_BLOCKS = 16


def convert_cola_efficientnet(sd: Dict[str, np.ndarray]) -> dict:
    """Cola(efficientnet) checkpoint -> variables for Cola(config.encoder=
    'efficientnet'). Torch keys: encoder.cnn1.*, encoder.efficientnet._*."""
    params: dict = {}
    stats: dict = {}
    p = "encoder."
    _conv(sd, p + "cnn1", params, ("encoder", "cnn1"))
    e = p + "efficientnet."
    fe = ("encoder", "efficientnet")
    _conv(sd, e + "_conv_stem", params, fe + ("_conv_stem",))
    _bn(sd, e + "_bn0", params, stats, fe + ("_bn0", "BatchNorm_0"))
    for i in range(_B0_NUM_BLOCKS):
        tb = f"{e}_blocks.{i}."
        fb = fe + (f"_blocks_{i}",)
        if tb + "_expand_conv.weight" in sd:
            _conv(sd, tb + "_expand_conv", params, fb + ("_expand_conv",))
            _bn(sd, tb + "_bn0", params, stats, fb + ("_bn0", "BatchNorm_0"))
        _conv(sd, tb + "_depthwise_conv", params, fb + ("_depthwise_conv",), depthwise=True)
        _bn(sd, tb + "_bn1", params, stats, fb + ("_bn1", "BatchNorm_0"))
        _conv(sd, tb + "_se_reduce", params, fb + ("_se_reduce",))
        _conv(sd, tb + "_se_expand", params, fb + ("_se_expand",))
        _conv(sd, tb + "_project_conv", params, fb + ("_project_conv",))
        _bn(sd, tb + "_bn2", params, stats, fb + ("_bn2", "BatchNorm_0"))
    _conv(sd, e + "_conv_head", params, fe + ("_conv_head",))
    _bn(sd, e + "_bn1", params, stats, fe + ("_bn1", "BatchNorm_0"))

    if "g.weight" in sd:
        _linear(sd, "g", params, ("g",))
        _ln(sd, "layer_norm", params, ("layer_norm",))
        _linear(sd, "linear", params, ("linear",), bias=False)
        if "middle.weight" in sd:
            _linear(sd, "middle", params, ("middle",))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# MAE ViT (OPERA-GT / Audio-MAE)
# ---------------------------------------------------------------------------


def _vit_block(sd, tp: str, params: dict, fp: str):
    _ln(sd, tp + "norm1", params, (fp, "norm1"))
    _linear(sd, tp + "attn.qkv", params, (fp, "attn_qkv"))
    _linear(sd, tp + "attn.proj", params, (fp, "attn_proj"))
    _ln(sd, tp + "norm2", params, (fp, "norm2"))
    _linear(sd, tp + "mlp.fc1", params, (fp, "mlp_fc1"))
    _linear(sd, tp + "mlp.fc2", params, (fp, "mlp_fc2"))


def convert_mae(sd: Dict[str, np.ndarray], depth: int = 12, decoder_depth: int = 16) -> dict:
    """MaskedAutoencoderViT(MD) state_dict -> variables for
    models.vit_mae.MaskedAutoencoderViT."""
    params: dict = {}
    _conv(sd, "patch_embed.proj", params, ("patch_embed_proj",))
    params["cls_token"] = sd["cls_token"]
    for i in range(depth):
        _vit_block(sd, f"blocks.{i}.", params, f"blocks_{i}")
    _ln(sd, "norm", params, ("norm",))
    if "decoder_embed.weight" in sd:
        _linear(sd, "decoder_embed", params, ("decoder_embed",))
        params["mask_token"] = sd["mask_token"]
        for i in range(decoder_depth):
            tp = f"decoder_blocks.{i}."
            fp = f"decoder_blocks_{i}"
            _linear(sd, tp + "attn.qkv", params, (fp, "attn", "qkv"))
            _linear(sd, tp + "attn.proj", params, (fp, "attn", "proj"))
            _linear(sd, tp + "attn.meta_mlp.fc1", params, (fp, "attn", "meta_fc1"))
            _linear(sd, tp + "attn.meta_mlp.fc2", params, (fp, "attn", "meta_fc2"))
            _set(params, (fp, "attn", "tau"), sd[tp + "attn.tau"])
            _ln(sd, tp + "norm1", params, (fp, "norm1"))
            _ln(sd, tp + "norm2", params, (fp, "norm2"))
            _linear(sd, tp + "mlp.fc1", params, (fp, "mlp_fc1"))
            _linear(sd, tp + "mlp.fc2", params, (fp, "mlp_fc2"))
        _ln(sd, "decoder_norm", params, ("decoder_norm",))
        _linear(sd, "decoder_pred", params, ("decoder_pred",))
    return {"params": params}


def convert_audiomae_backbone(sd: Dict[str, np.ndarray], depth: int = 12) -> dict:
    """Audio-MAE vit_base_patch16 (timm VisionTransformer, global_pool) ->
    variables for AudioMAEClassifierBackbone. Accepts full MAE ckpts too
    (encoder subtree only)."""
    params: dict = {}
    _conv(sd, "patch_embed.proj", params, ("patch_embed_proj",))
    params["cls_token"] = sd["cls_token"]
    for i in range(depth):
        _vit_block(sd, f"blocks.{i}.", params, f"blocks_{i}")
    if "fc_norm.weight" in sd:
        _ln(sd, "fc_norm", params, ("fc_norm",))
    elif "norm.weight" in sd:  # MAE ckpt: reuse encoder norm as fc_norm
        _ln(sd, "norm", params, ("fc_norm",))
    else:
        params["fc_norm"] = {
            "scale": np.ones(sd["cls_token"].shape[-1], np.float32),
            "bias": np.zeros(sd["cls_token"].shape[-1], np.float32),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# CLAP audio tower (msclap 2022 Cnn14 / 2023 HTSAT)
# ---------------------------------------------------------------------------


def convert_clap_audio(sd: Dict[str, np.ndarray], version: str = "2023") -> dict:
    """msclap checkpoint -> variables for models.clap.CLAPAudioEncoder.

    Torch keys: [clap.]audio_encoder.base.(htsat.*|cnn14 blocks), and
    audio_encoder.projection.{linear1,linear2,layer_norm}."""
    # normalize prefix
    pref = None
    for cand in ("clap.audio_encoder.", "audio_encoder.", "model.audio_encoder."):
        if any(k.startswith(cand) for k in sd):
            pref = cand
            break
    if pref is None:
        raise KeyError("no audio_encoder subtree in CLAP checkpoint")
    sub = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}

    params: dict = {}
    stats: dict = {}
    if version == "2023":
        enc_params, enc_stats = convert_htsat(sub, "base.htsat.")
        params["base"] = enc_params
        stats["base"] = enc_stats
    else:  # Cnn14
        b = "base."
        _bn(sub, b + "bn0", params, stats, ("base", "bn0"))
        for i in range(1, 7):
            for j in (1, 2):
                _conv(sub, f"{b}conv_block{i}.conv{j}", params,
                      ("base", f"conv_block{i}", f"conv{j}"))
                _bn(sub, f"{b}conv_block{i}.bn{j}", params, stats,
                    ("base", f"conv_block{i}", f"bn{j}"))
        _linear(sub, b + "fc1", params, ("base", "fc1"))
        _linear(sub, b + "fc_audioset", params, ("base", "fc_audioset"))
    _linear(sub, "projection.linear1", params, ("projection", "linear1"), bias=False)
    _linear(sub, "projection.linear2", params, ("projection", "linear2"), bias=False)
    _ln(sub, "projection.layer_norm", params, ("projection", "layer_norm"))
    return {"params": params, "batch_stats": stats}


def convert_hear_vit(sd: Dict[str, np.ndarray], depth: int = 24) -> dict:
    """HF google/hear-pytorch ViTModel state_dict -> models.hear.HeAREncoder.

    HF key layout: embeddings.{cls_token,position_embeddings,
    patch_embeddings.projection.*}, encoder.layer.{i}.{attention.attention.
    {query,key,value}, attention.output.dense, intermediate.dense,
    output.dense, layernorm_before/after}, layernorm.*, pooler.dense.*"""
    params: dict = {}
    params["cls_token"] = sd["embeddings.cls_token"]
    params["pos_embed"] = sd["embeddings.position_embeddings"]
    _conv(sd, "embeddings.patch_embeddings.projection", params, ("patch_embed_proj",))
    for i in range(depth):
        tp = f"encoder.layer.{i}."
        fp = f"blocks_{i}"
        _ln(sd, tp + "layernorm_before", params, (fp, "norm1"))
        q = sd[tp + "attention.attention.query.weight"]
        k = sd[tp + "attention.attention.key.weight"]
        v = sd[tp + "attention.attention.value.weight"]
        qb = sd[tp + "attention.attention.query.bias"]
        kb = sd[tp + "attention.attention.key.bias"]
        vb = sd[tp + "attention.attention.value.bias"]
        _set(params, (fp, "attn_qkv", "kernel"), np.concatenate([q, k, v], 0).T)
        _set(params, (fp, "attn_qkv", "bias"), np.concatenate([qb, kb, vb], 0))
        _linear(sd, tp + "attention.output.dense", params, (fp, "attn_proj"))
        _ln(sd, tp + "layernorm_after", params, (fp, "norm2"))
        _linear(sd, tp + "intermediate.dense", params, (fp, "mlp_fc1"))
        _linear(sd, tp + "output.dense", params, (fp, "mlp_fc2"))
    _ln(sd, "layernorm", params, ("norm",))
    if "pooler.dense.weight" in sd:
        _linear(sd, "pooler.dense", params, ("pooler",))
    return {"params": params}


# ---------------------------------------------------------------------------
# cached load
# ---------------------------------------------------------------------------

_CONVERTERS = {
    "operaCT": convert_cola_htsat,
    "operaCE": convert_cola_efficientnet,
    "operaGT": convert_mae,
    "audiomae": convert_audiomae_backbone,
    "mae": convert_mae,
    "clap2022": lambda sd: convert_clap_audio(sd, "2022"),
    "clap2023": lambda sd: convert_clap_audio(sd, "2023"),
    "hear": convert_hear_vit,
}


def load_converted(path: str, kind: str, cache: bool = True) -> dict:
    """Load a torch checkpoint, convert for `kind`, optionally cache msgpack."""
    import flax.serialization as ser

    cache_path = path + f".{kind}.msgpack"
    if cache and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return ser.msgpack_restore(f.read())
    sd = load_torch_state_dict(path)
    variables = _CONVERTERS[kind](sd)
    if cache:
        try:
            with open(cache_path, "wb") as f:
                f.write(ser.msgpack_serialize(variables))
        except OSError:
            pass
    return variables
