"""Two-model significance test CLI (src/benchmark/significance_test.py):
runs the 5-seed LP protocol for two models on one task and t-tests the scores.

Usage: python -m heart_murmur_detection_tpu.cli.significance \\
    task=circor_murmurs model1=operaCT dim1=768 model2=audiomae dim2=768 alpha=0.01
"""

from __future__ import annotations

import sys

import numpy as np

from ..analysis.significance import test_2models
from ..train.linear_eval import linear_evaluation_heart
from .config import parse_overrides
from .linear_eval import LEGACY_TASKS, route_heart_task, run_legacy

DEFAULTS = dict(
    task="circor_murmurs",
    label="smoker",
    modality="cough",
    model1="operaCT",
    model2="audiomae",
    dim1=768,
    dim2=768,
    alpha=0.01,
    lr=1e-4,
    l2_strength=1e-5,
    head="linear",
    n_run=5,
    loss="weighted",
)


def get_performance(model: str, dim: int, cfg: dict):
    feature = model
    if model not in ("vggish", "opensmile", "clap", "audiomae", "hear", "clap2023") and "finetuned" not in model:
        feature += str(dim)
    scores = []
    for seed in range(cfg["n_run"]):
        if cfg["task"] in LEGACY_TASKS:
            scores.append(run_legacy(cfg, feature, seed))
        else:
            ds, task, fdir, labels = route_heart_task(cfg["task"])
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
            )
            scores.append(res.test_auc)
    return scores


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    _, combos = parse_overrides(argv)
    cfg = dict(DEFAULTS)
    cfg.update(combos[0] if combos else {})
    s1 = get_performance(cfg["model1"], cfg["dim1"], cfg)
    s2 = get_performance(cfg["model2"], cfg["dim2"], cfg)
    print(f"{cfg['model1']}: {np.mean(s1):.3f} ± {np.std(s1):.3f}  {s1}")
    print(f"{cfg['model2']}: {np.mean(s2):.3f} ± {np.std(s2):.3f}  {s2}")
    test_2models(s1, s2, alpha=cfg["alpha"])


if __name__ == "__main__":
    main()
