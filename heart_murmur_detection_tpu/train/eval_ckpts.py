"""Checkpoint re-evaluation (src/benchmark/other_eval/eval_ckpts.py).

Reloads best LP/FT checkpoints by their hyperparameter-encoded filename
pattern and re-tests, including CROSS-TASK evaluation: an encoder fine-tuned
on task A evaluated on task B's test split (finetuned_dataset_name /
finetuned_task routing, eval_ckpts.py:161-218)."""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.htsat import HTSATConfig
from . import metrics as M
from .checkpoints import load_params
from .finetune import EncoderClassifier, build_ft_spectrogram_cache
from .linear_eval import HEART_METRICS, load_feature_split


def _find_ckpt(ck_dir: str, prefix: str, ext: str = ".msgpack") -> str:
    cands = sorted(glob.glob(os.path.join(ck_dir, f"{prefix}*{ext}")))
    if not cands:
        raise FileNotFoundError(f"No checkpoint starting with {prefix} in {ck_dir}")
    return cands[0]


def evaluate_linear_head(
    seed: int,
    metrics: Sequence[str] = HEART_METRICS,
    use_feature: str = "operaCE1280",
    l2_strength: float = 1e-5,
    epochs: int = 64,
    batch_size: int = 32,
    lr: float = 1e-4,
    head: str = "linear",
    dataset_name: str = "circor",
    task: str = "murmurs",
    feature_dir: str = "feature/circor_eval/",
    labels_filename: str = "murmurs.npy",
    loss: str = "unweighted",
    ckpt_path: Optional[str] = None,
) -> Dict[str, object]:
    from ..models.heads import Head

    x, y, y_set, valid = load_feature_split(feature_dir, use_feature, labels_filename)
    n_cls = len(set(y.tolist()))
    te = y_set == "test"
    x_te, y_te = x[te], y[te]

    if ckpt_path is None:
        ck_dir = (
            f"cks/linear/{dataset_name}_{task}/" if task else f"cks/linear/{dataset_name}"
        )
        prefix = "_".join(
            [head, use_feature, str(batch_size), str(lr), str(epochs), str(l2_strength), str(seed)]
        )
        if loss == "weighted":  # reference appends this tag (eval_ckpts.py:78)
            prefix += "_weighted"
        ckpt_path = _find_ckpt(ck_dir, prefix)
    params = load_params(ckpt_path)

    model = Head(classes=n_cls, head=head, feat_dim=x.shape[1])
    probs = np.asarray(
        jax.nn.softmax(model.apply({"params": params}, jnp.asarray(x_te)), axis=-1)
    )
    y_pred = probs.argmax(1)
    ann = None
    if dataset_name == "physionet16":
        ann = np.load(os.path.join(feature_dir, "annotations.npy")).astype(np.int32)[
            valid
        ][te]
    out = M.compute_metrics(metrics, y_te, y_pred, probs, n_cls, dataset_name, task, ann)
    out["test_auc"] = M.auroc(y_te, probs, n_cls, "macro")
    return out


def evaluate_finetuned_model(
    seed: int,
    metrics: Sequence[str] = HEART_METRICS,
    pretrain: str = "operaCT",
    l2_strength: float = 1e-4,
    epochs: int = 64,
    batch_size: int = 64,
    lr: float = 1e-4,
    head: str = "linear",
    feat_dim: int = 768,
    dataset_name: str = "circor",
    task: str = "murmurs",
    feature_dir: str = "feature/circor_eval/",
    labels_filename: str = "murmurs.npy",
    freeze_encoder: str = "none",
    loss: str = "weighted",
    finetuned_dataset_name: Optional[str] = None,
    finetuned_task: Optional[str] = None,
    ckpt_path: Optional[str] = None,
    htsat_config: Optional[HTSATConfig] = None,
) -> Dict[str, object]:
    finetuned_dataset_name = finetuned_dataset_name or dataset_name
    finetuned_task = finetuned_task if finetuned_task is not None else task

    y_label = np.load(os.path.join(feature_dir, labels_filename))
    y_set = np.load(os.path.join(feature_dir, "train_test_split.npy"))
    valid = ~np.isnan(np.asarray(y_label, np.float64))
    y_label = y_label[valid].astype(np.int32)
    y_set = np.asarray(y_set)[valid]
    n_cls = len(set(y_label.tolist()))
    x_data = build_ft_spectrogram_cache(feature_dir, pretrain)[valid]
    te = y_set == "test"
    x_te, y_te = x_data[te], y_label[te]

    if ckpt_path is None:
        ck_dir = (
            f"cks/finetune/{finetuned_dataset_name}_{finetuned_task}/"
            if finetuned_task
            else f"cks/finetune/{finetuned_dataset_name}"
        )
        prefix = "_".join(
            ["finetuning", head, pretrain, str(batch_size), str(lr), str(epochs), str(l2_strength), str(seed)]
        )
        if freeze_encoder == "early":
            prefix += "_early"
        if loss == "weighted":
            prefix += "_weighted"
        ckpt_path = _find_ckpt(ck_dir, prefix, ".msgpack")
    variables = load_params(ckpt_path)

    if "audiomae" in pretrain:
        encoder_kind, feat_dim = "audiomae", 768
    elif "GT" in pretrain:
        encoder_kind, feat_dim = "gt", 384
    elif "operaCE" in pretrain or pretrain == "null":
        encoder_kind, feat_dim = "efficientnet", 1280
    else:
        encoder_kind, feat_dim = "htsat", 768

    model = EncoderClassifier(
        encoder_kind=encoder_kind,
        classes=n_cls,
        head=head,
        feat_dim=feat_dim,
        htsat_config=htsat_config,
    )
    has_bn = bool(jax.tree.leaves(variables.get("batch_stats", {})))
    vars_in = {"params": variables["params"]}
    if has_bn:
        vars_in["batch_stats"] = variables["batch_stats"]

    @jax.jit
    def predict(x):
        return jax.nn.softmax(model.apply(vars_in, x, train=False), axis=-1)

    probs = []
    bs = 32
    for i in range(0, len(x_te), bs):
        chunk = x_te[i : i + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)], 0)
        probs.append(np.asarray(predict(jnp.asarray(chunk)))[: bs - pad or None])
    probs = np.concatenate(probs, axis=0)
    y_pred = probs.argmax(1)
    ann = None
    if dataset_name == "physionet16":
        ann = np.load(os.path.join(feature_dir, "annotations.npy")).astype(np.int32)[
            valid
        ][te]
    out = M.compute_metrics(metrics, y_te, y_pred, probs, n_cls, dataset_name, task, ann)
    out["test_auc"] = M.auroc(y_te, probs, n_cls, "macro")
    return out
