"""LP evaluation CLI (src/benchmark/linear_eval.py main, :1701-1998).

Usage: python -m heart_murmur_detection_tpu.cli.linear_eval [-m] task=circor_murmurs pretrain=operaCT dim=768 ...
"""

from __future__ import annotations

import sys

import numpy as np

from ..train.linear_eval import (
    linear_evaluation_heart,
    linear_evaluation_heart_cv,
)
from .config import resolve

HEART_TASK_ROUTES = {}


def route_heart_task(task: str):
    """Task -> (dataset_name, task, feature_dir, labels_filename)
    (linear_eval.py:1895-1937)."""
    if task in ("zchsound_clean", "zchsound_noisy"):
        ds, t = task.split("_")
        return ds, t, f"feature/{task}_eval/", "outcomes.npy"
    if task in ("zchsound_clean_murmurs", "zchsound_noisy_murmurs"):
        a, b, c = task.split("_")
        return f"{a}_{b}", c, f"feature/{a}_{b}_eval/", f"{c}.npy"
    if task in ("pascal_A", "pascal_B"):
        ds, t = task.split("_")
        return ds, t, f"feature/{task}_eval/", "labels.npy"
    if task.startswith("circor_"):
        t = task.split("_", 1)[1]
        return "circor", t, "feature/circor_eval/", f"{t}.npy"
    if task == "physionet16":
        return "physionet16", "", "feature/physionet16_eval/", "labels.npy"
    raise SystemExit(f"unknown heart task: {task}")


def feature_name(cfg) -> str:
    feature = cfg["pretrain"]
    if (
        feature not in ["vggish", "opensmile", "clap", "audiomae", "hear", "clap2023"]
        and "audiomae" not in feature
        and "finetuned" not in feature
    ):
        feature += str(cfg["dim"])
    return feature


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("linear_eval_config", argv):
        feature = feature_name(cfg)
        ds, task, fdir, labels = route_heart_task(cfg["task"])
        if cfg.get("grid_search"):
            best = (-1, None)
            for l2 in cfg["l2_strength_grid"]:
                for lr in cfg["lr_grid"]:
                    scores = []
                    for seed in range(cfg["n_run"]):
                        scores.extend(
                            linear_evaluation_heart_cv(
                                seed=seed,
                                use_feature=feature,
                                feature_dir=fdir,
                                labels_filename=labels,
                                l2_strength=l2,
                                lr=lr,
                                loss=cfg["loss"],
                                head=cfg["head"],
                                epochs=64,
                            )
                        )
                    m = float(np.mean(scores))
                    print(f"l2={l2} lr={lr}: {m:.3f} ± {np.std(scores):.3f}")
                    if m > best[0]:
                        best = (m, {"l2_strength": l2, "lr": lr})
            print("=" * 48)
            print(f"Best AUC: {best[0]:.3f} with params: {best[1]}")
            continue
        scores = []
        for seed in range(cfg["n_run"]):
            res = linear_evaluation_heart(
                seed=seed,
                use_feature=feature,
                l2_strength=cfg["l2_strength"],
                lr=cfg["lr"],
                loss=cfg["loss"],
                head=cfg["head"],
                epochs=64,
                dataset_name=ds,
                task=task,
                feature_dir=fdir,
                labels_filename=labels,
                save_ckpt_dir=f"cks/linear/{ds}_{task}/",
            )
            print(f"seed {seed}: test_auc {res.test_auc:.4f}")
            scores.append(res.test_auc)
        print("=" * 48)
        print(scores)
        print(
            f"Five times mean task {cfg['task']} feature {feature} results: "
            f"auc mean {np.mean(scores):.3f} ± {np.std(scores):.3f}"
        )
        print("=" * 48)


if __name__ == "__main__":
    main()
