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
    # pretrain=null coerces to None (yaml/hydra); downstream is all string
    # compares ("null" = random-init efficientnet, finetuning.py:183)
    feature = "null" if cfg["pretrain"] is None else cfg["pretrain"]
    if (
        feature not in ["vggish", "opensmile", "clap", "audiomae", "hear", "clap2023"]
        and "audiomae" not in feature
        and "finetuned" not in feature
    ):
        feature += str(cfg["dim"])
    return feature


LEGACY_TASKS = {
    "covid19sounds", "icbhidisease", "kauh", "coswarasmoker", "coswarasex",
    "copd", "coughvidcovid", "coughvidsex", "coviduk", "snoring",
}


def run_legacy(cfg, feature, seed):
    """Task routing for the legacy OPERA tasks (linear_eval.py:1798-1893)."""
    from ..train import legacy_tasks as lt

    t = cfg["task"]
    if t == "covid19sounds":
        return lt.linear_evaluation_covid19sounds(
            1, feature, modality=cfg["modality"], l2_strength=cfg["l2_strength"],
            lr=cfg["lr"], head=cfg["head"], seed=seed)
    if t == "icbhidisease":
        return lt.linear_evaluation_icbhidisease(
            use_feature=feature, epochs=64, batch_size=32,
            l2_strength=cfg["l2_strength"], lr=cfg["lr"], head=cfg["head"], seed=seed)
    if t == "kauh":
        return lt.linear_evaluation_kauh(
            use_feature=feature, epochs=50, batch_size=32,
            l2_strength=cfg["l2_strength"], lr=cfg["lr"], head=cfg["head"], seed=seed)
    if t in ("coswarasmoker", "coswarasex"):
        return lt.linear_evaluation_coswara(
            use_feature=feature, epochs=64, l2_strength=cfg["l2_strength"],
            batch_size=32, lr=cfg["lr"], modality=cfg["modality"],
            label=t.removeprefix("coswara"), head=cfg["head"], seed=seed)
    if t == "copd":
        return lt.linear_evaluation_copd(
            use_feature=feature, l2_strength=cfg["l2_strength"], lr=cfg["lr"],
            head=cfg["head"], epochs=64, seed=seed)
    if t in ("coughvidcovid", "coughvidsex"):
        return lt.linear_evaluation_coughvid(
            use_feature=feature, epochs=64, l2_strength=cfg["l2_strength"],
            lr=cfg["lr"], batch_size=64,
            label="covid" if t.endswith("covid") else "gender",
            head=cfg["head"], seed=seed)
    if t == "coviduk":
        return lt.linear_evaluation_coviduk(
            use_feature=feature, epochs=64, l2_strength=cfg["l2_strength"],
            lr=cfg["lr"], batch_size=64, modality=cfg["modality"],
            head=cfg["head"], seed=seed)
    if t == "snoring":
        return lt.linear_evaluation_ssbpr(
            use_feature=feature, l2_strength=cfg["l2_strength"], lr=cfg["lr"],
            head=cfg["head"], epochs=32, seed=seed)
    raise SystemExit(f"unknown legacy task {t}")


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("linear_eval_config", argv):
        feature = feature_name(cfg)
        if cfg.get("LOOCV"):
            from ..train import legacy_tasks as lt

            if cfg["task"] == "spirometry":
                maes, mapes = lt.linear_evaluation_mmlung(
                    use_feature=feature, l2_strength=1e-1, epochs=64, lr=1e-1,
                    batch_size=64, modality=cfg["modality"], label=cfg["label"],
                    head=cfg["head"])
            elif cfg["task"] == "rr":
                maes, mapes = lt.linear_evaluation_nosemic(
                    use_feature=feature, l2_strength=1e-1, epochs=64,
                    batch_size=64, lr=1e-4, head=cfg["head"])
            else:
                raise SystemExit(f"unknown LOOCV task {cfg['task']}")
            print(f"MAE mean {np.mean(maes):.3f} ± {np.std(maes):.3f}")
            print(f"MAPE mean {np.mean(mapes):.3f} ± {np.std(mapes):.3f}")
            continue
        if cfg["task"] in LEGACY_TASKS:
            scores = [run_legacy(cfg, feature, seed) for seed in range(cfg["n_run"])]
            print("=" * 48)
            print(scores)
            print(
                f"Five times mean task {cfg['task']} feature {feature} results: "
                f"auc mean {np.mean(scores):.3f} ± {np.std(scores):.3f}"
            )
            continue
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
