"""Checkpoint re-evaluation CLI (src/benchmark/other_eval/eval_ckpts.py:432-516).

Reloads saved LP heads / fine-tuned models by their hyperparameter-encoded
checkpoint filenames and re-tests, including CROSS-TASK evaluation via
`finetuned_task` (encoder fine-tuned on task A, tested on task B's split).

    python -m heart_murmur_detection_tpu.cli.eval_ckpts task=circor_murmurs \\
        pretrain=operaCT dim=768 head_only=False finetuned_task=pascal_A
"""

from __future__ import annotations

import sys

import numpy as np

from ..train.eval_ckpts import evaluate_finetuned_model, evaluate_linear_head
from .config import resolve
from .linear_eval import route_heart_task


def _split_finetuned(finetuned_task: str):
    """'pascal_A' -> ('pascal', 'A'); 'zchsound_clean_murmurs' ->
    ('zchsound_clean', 'murmurs'); bare dataset -> (ds, '')
    (eval_ckpts.py:442-450)."""
    parts = finetuned_task.split("_")
    if len(parts) == 1:
        return parts[0], ""
    if len(parts) == 2:
        return parts[0], parts[1]
    return f"{parts[0]}_{parts[1]}", parts[2]


def evaluate_one(cfg, seed: int) -> float:
    ds, task, fdir, labels = route_heart_task(cfg["task"])
    # pretrain=null coerces to None; downstream string-compares "null"
    if cfg.get("pretrain") is None:
        cfg = {**cfg, "pretrain": "null"}
    common = dict(
        seed=seed,
        metrics=cfg["metrics"],
        epochs=64,
        l2_strength=cfg["l2_strength"],
        batch_size=cfg["batch_size"],
        loss=cfg["loss"],
        dataset_name=ds,
        task=task,
        feature_dir=fdir,
        labels_filename=labels,
    )
    if cfg["head_only"]:
        res = evaluate_linear_head(use_feature=cfg["pretrain"], head="linear", **common)
    else:
        if cfg.get("finetuned_task") not in (None, "none"):
            fds, ft = _split_finetuned(cfg["finetuned_task"])
            common.update(finetuned_dataset_name=fds, finetuned_task=ft)
        res = evaluate_finetuned_model(
            pretrain=cfg["pretrain"],
            head="linear",
            feat_dim=cfg["dim"],
            freeze_encoder=cfg["freeze_encoder"],
            **common,
        )
    from ..train.metrics import expand_per_class

    for k, v in sorted(expand_per_class(res, ds, task).items()):
        print(f"  {k}: {v:.4f}")
    return float(res["test_auc"])


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("eval_config", argv):
        scores = []
        for seed in range(cfg["n_run"]):
            print(f"-- seed {seed} --")
            scores.append(evaluate_one(cfg, seed))
        print("=" * 48)
        print(scores)
        print(
            f"Five times mean task {cfg['task']} eval from {cfg['pretrain']} "
            f"results: auc mean {np.mean(scores):.3f} ± {np.std(scores):.3f}"
        )
        print("=" * 48)


if __name__ == "__main__":
    main()
