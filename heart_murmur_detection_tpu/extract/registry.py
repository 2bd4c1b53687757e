"""Checkpoint registry + model factory (src/benchmark/model_util.py:25-216).

Path constants mirror the reference so a user's existing ``cks/`` tree works
unchanged. Base OPERA checkpoints auto-download from HF hub when the
environment has network access (`evelyn0414/OPERA`, model_util.py:107-110);
in offline environments a missing checkpoint raises with the expected path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.cola import Cola, ColaConfig
from ..models.vit_mae import (
    AudioMAEClassifierBackbone,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from . import convert

ENCODER_PATH_OPERA_CE_EFFICIENTNET = "cks/model/encoder-operaCE.ckpt"
ENCODER_PATH_OPERA_CT_HT_SAT = "cks/model/encoder-operaCT.ckpt"
ENCODER_PATH_OPERA_GT_VIT = "cks/model/encoder-operaGT.ckpt"

_CP_DIR = "cks/model/combined"

# continued-pretraining checkpoints keyed as in model_util.py:28-60
_CP_PATHS = {
    "operaCT-heart-indomain-physionet16": f"{_CP_DIR}/physionet16/encoder-operaCT-physionet16-indomain-epoch=239--valid_acc=0.98-valid_loss=0.0524.ckpt",
    "operaCT-heart-indomain-circor": f"{_CP_DIR}/circor/encoder-operaCT-circor-indomain-epoch=209--valid_acc=0.99-valid_loss=0.0397.ckpt",
    "operaCT-heart-indomain-pretrained-physionet16": f"{_CP_DIR}/physionet16/encoder-operaCT-physionet16-indomain-pretrained-epoch=169--valid_acc=0.99-valid_loss=0.0300.ckpt",
    "operaCT-heart-indomain-pretrained-circor": f"{_CP_DIR}/circor/encoder-operaCT-circor-indomain-pretrained-epoch=229--valid_acc=0.99-valid_loss=0.0342.ckpt",
    "operaCT-heart-nonoisy-circor": f"{_CP_DIR}/pascal_A_pascal_B_physionet16_zchsound_clean/encoder-operaCT-nocircor-nonoisy-epoch=249--valid_acc=0.96-valid_loss=0.2138.ckpt",
    "operaCT-heart-nonoisy-pascal": f"{_CP_DIR}/circor_physionet16_zchsound_clean/encoder-operaCT-nopascal-nonoisy-epoch=159--valid_acc=0.94-valid_loss=0.3256.ckpt",
    "operaCT-heart-nonoisy-physionet16": f"{_CP_DIR}/circor_pascal_A_pascal_B_zchsound_clean/encoder-operaCT-nophysionet-nonoisy-epoch=249--valid_acc=0.95-valid_loss=0.2898.ckpt",
    "operaCT-heart-nonoisy-zchsound": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16/encoder-operaCT-nozchsound-epoch=169--valid_acc=0.94-valid_loss=0.3174.ckpt",
    "operaCT-heart-all": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/encoder-operaCT-heart-all-epoch=159--valid_acc=0.94-valid_loss=0.3790.ckpt",
    "operaCT-heart-all-scratch": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/encoder-operaCT-heart-all-scratch-epoch=209--valid_acc=0.92-valid_loss=0.3899.ckpt",
    "operaCT-heart-cross-circor": f"{_CP_DIR}/pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/model.ckpt",
    "operaCT-heart-cross-pascal": f"{_CP_DIR}/circor_physionet16_zchsound_clean_zchsound_noisy/model.ckpt",
    "operaCT-heart-cross-zchsound": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16/model.ckpt",
    "operaCT-heart-cross-physionet16": f"{_CP_DIR}/circor_pascal_A_pascal_B_zchsound_clean_zchsound_noisy/model.ckpt",
}

_AUDIOMAE_PATHS = {
    "audiomae": "src/benchmark/baseline/audioMAE/pretrained.pth",
    "audiomae-heart-all": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/encoder-audiomae-heart-all-epoch=269--valid_acc=0.00-valid_loss=0.8422.ckpt",
    "audiomae-heart-circor-indomain": f"{_CP_DIR}/circor/encoder-audiomae-heart-circor-indomain-epoch=389--valid_acc=0.00-valid_loss=1.0124.ckpt",
    "audiomae-heart-nozchsound": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16/encoder-audiomae-heart-nozchsound-epoch=289--valid_acc=0.00-valid_loss=0.8262.ckpt",
    "audiomae-heart-nophysionet16": f"{_CP_DIR}/circor_pascal_A_pascal_B_zchsound_clean_zchsound_noisy/encoder-audiomae-heart-nophysionet16-epoch=329--valid_acc=0.00-valid_loss=0.9945.ckpt",
    "audiomae-heart-nopascal": f"{_CP_DIR}/circor_physionet16_zchsound_clean_zchsound_noisy/encoder-audiomae-heart-nopascal-epoch=329--valid_acc=0.00-valid_loss=0.8338.ckpt",
    "audiomae-heart-nocircor": f"{_CP_DIR}/pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/encoder-audiomae-heart-nocircor-epoch=429--valid_acc=0.00-valid_loss=0.6585.ckpt",
    "audiomae-heart-physionet16-indomain": f"{_CP_DIR}/physionet16/encoder-audiomae-heart-physionet16-indomain-epoch=459--valid_acc=0.00-valid_loss=0.5994.ckpt",
    "audiomae-heart-all-scratch": f"{_CP_DIR}/circor_pascal_A_pascal_B_physionet16_zchsound_clean_zchsound_noisy/encoder-audiomae-heart-all-scratch-epoch=389--valid_acc=0.00-valid_loss=1.1551.ckpt",
}


def get_encoder_path(pretrain: str) -> str:
    base = {
        "operaCT": ENCODER_PATH_OPERA_CT_HT_SAT,
        "operaCE": ENCODER_PATH_OPERA_CE_EFFICIENTNET,
        "operaGT": ENCODER_PATH_OPERA_GT_VIT,
    }
    paths = {**base, **_CP_PATHS}
    # zchsound_clean/zchsound_noisy variants share the zchsound CP ckpt
    for suffix in ("zchsound_clean", "zchsound_noisy"):
        paths[f"operaCT-heart-nonoisy-{suffix}"] = _CP_PATHS["operaCT-heart-nonoisy-zchsound"]
        paths[f"operaCT-heart-cross-{suffix}"] = _CP_PATHS["operaCT-heart-cross-zchsound"]
    if pretrain not in paths:
        raise KeyError(f"unknown pretrain: {pretrain}")
    path = paths[pretrain]
    if not os.path.exists(path):
        if pretrain in base:
            downloaded = _try_download(pretrain)
            if downloaded:
                return path
        raise FileNotFoundError(
            f"checkpoint for '{pretrain}' not found at {path}; "
            "run pretraining or place the checkpoint there"
        )
    return path


def get_audiomae_encoder_path(pretrain: str) -> str:
    if pretrain not in _AUDIOMAE_PATHS:
        raise KeyError(f"unknown audiomae pretrain: {pretrain}")
    path = _AUDIOMAE_PATHS[pretrain]
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    return path


def _try_download(pretrain: str) -> bool:
    try:
        from huggingface_hub import hf_hub_download

        hf_hub_download(
            "evelyn0414/OPERA", f"encoder-{pretrain}.ckpt", local_dir="cks/model"
        )
        return True
    except Exception:
        return False


def initialize_pretrained_model(
    pretrain: str,
    ckpt_path: Optional[str] = None,
    random_init: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[object, dict]:
    """Build the model for `pretrain` and load its (converted) weights.

    Returns (flax module, variables). random_init=True skips checkpoint load
    (used by tests and from-scratch training, pretrain='null' in the reference).
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    # param init is pure allocation — run it on host CPU (remote-TPU compile of
    # the init graph is pointlessly slow through the axon tunnel) and let the
    # forward jit place params on the accelerator.
    cpu = jax.devices("cpu")[0]
    if "operaCT" in pretrain or pretrain == "null-htsat":
        model = Cola(ColaConfig(encoder="htsat"))
        init_fn = lambda: model.init(
            rng, (jnp.zeros((1, 64, 64)), jnp.zeros((1, 64, 64)))
        )
        kind = "operaCT"
    elif pretrain in ("operaCE", "null", "null-efficientnet"):
        model = Cola(ColaConfig(encoder="efficientnet"))
        init_fn = lambda: model.init(
            rng, (jnp.zeros((1, 64, 64)), jnp.zeros((1, 64, 64)))
        )
        kind = "operaCE"
    elif pretrain == "operaGT":
        model = MaskedAutoencoderViT(mae_vit_small_config())
        init_fn = lambda: model.init(
            {"params": rng, "masking": rng}, jnp.zeros((1, 256, 64))
        )
        kind = "operaGT"
    elif "audiomae" in pretrain:
        model = AudioMAEClassifierBackbone(audiomae_base_config())
        init_fn = lambda: model.init(rng, jnp.zeros((1, 998, 128)))
        kind = "audiomae"
    else:
        raise NotImplementedError(f"Model not found: {pretrain}")

    if random_init or pretrain.startswith("null"):
        return model, _cached_init(kind, init_fn, cpu)

    if ckpt_path is None:
        if "audiomae" in pretrain:
            ckpt_path = get_audiomae_encoder_path(pretrain)
        else:
            ckpt_path = get_encoder_path(pretrain)
    if ckpt_path.endswith(".msgpack"):
        loaded = _adapt_msgpack_ckpt(ckpt_path)
    else:
        loaded = convert.load_converted(ckpt_path, kind)
    # merge into randomly-initialized template so missing leaves keep defaults
    template = _cached_init(kind, init_fn, cpu)
    variables = _merge_trees(jax.device_get(template), loaded)
    return model, variables


def _adapt_msgpack_ckpt(path: str) -> dict:
    """Load one of OUR checkpoints (CP Cola tree, or a fine-tuned
    EncoderClassifier tree whose encoder subtree maps onto Cola.encoder —
    mirrors the reference's strict=False prefix-overlap loading,
    finetuning.py:1171 / eval pipeline cross-FT extraction)."""
    import flax.serialization as ser

    with open(path, "rb") as f:
        tree = ser.msgpack_restore(f.read())
    params = tree.get("params", tree)
    stats = tree.get("batch_stats", {})
    if "head" in params and "encoder" in params:  # FT classifier tree
        return {
            "params": {"encoder": params["encoder"]},
            "batch_stats": {"encoder": stats.get("encoder", {})},
        }
    return {"params": params, "batch_stats": stats}


def _cached_init(kind: str, init_fn, cpu):
    """Initializing the big encoders compiles a full forward (~2 min on this
    host); cache the variable tree to disk keyed by model kind+version."""
    import flax.serialization as ser

    cache_dir = os.environ.get("HMDT_CACHE", os.path.expanduser("~/.cache/hmdt"))
    path = os.path.join(cache_dir, f"init-{kind}-v1.msgpack")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return ser.msgpack_restore(f.read())
    with jax.default_device(cpu):
        variables = jax.device_get(init_fn())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "wb") as f:
            f.write(ser.msgpack_serialize(variables))
    except OSError:
        pass
    return variables


def _merge_trees(base: dict, update: dict) -> dict:
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        else:
            out[k] = v
    return out
