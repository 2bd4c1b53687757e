"""Golden regression rows: the 5-seed LP protocol on the reference's shipped
feature caches must keep reproducing recorded numbers. This is the analog of
the reference's committed golden logs (cks/logs/Test_Task10_results.log,
SURVEY §4.2): any drift in the LP harness (split handling, weighted CE,
schedule, AUROC) fails here.

All 39 rows of the recorded LP table (RESULTS.md round-1 tables plus the
`_old` legacy-cache variants) run as parametrized cases sharing nothing but
the shipped caches. Seeds are pinned (0..4) and the protocol is
deterministic up to backend float accumulation; the pinned means are the
CPU-backend values (recorded 2026-08-20 — the suite runs on the CPU
backend), asserted to ±0.01. High-variance rows (std ≥ ~0.02) differ from
the TPU-recorded RESULTS.md means by up to ±0.04 because backend
accumulation perturbs whole training trajectories; both sets are goldens of
the same harness on their own backend.

Matches the 5-seed protocol of
/root/reference/src/benchmark/linear_eval.py:1790-1957.
"""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.train.linear_eval import linear_evaluation_heart

REF_FEATURE = "/root/reference/feature"

# (feature_dir, use_feature, labels_file, dataset, task, cpu_mean)
GOLDEN = [
    ("pascal_A_eval", "audiomae", "labels.npy", "pascal", "A", 0.8150),
    ("pascal_A_eval", "clap", "labels.npy", "pascal", "A", 0.8757),
    ("pascal_A_eval", "clap2023", "labels.npy", "pascal", "A", 0.8799),
    ("pascal_A_eval", "hear", "labels.npy", "pascal", "A", 0.8659),
    ("pascal_A_eval", "operaCT768", "labels.npy", "pascal", "A", 0.8638),
    ("pascal_A_eval", "vggish", "labels.npy", "pascal", "A", 0.8529),
    ("pascal_A_eval", "operaCT768_old", "labels.npy", "pascal", "A", 0.8644),
    ("pascal_A_eval", "operaGT384_old", "labels.npy", "pascal", "A", 0.8771),
    ("pascal_A_eval", "operaCE1280_old", "labels.npy", "pascal", "A", 0.8578),
    ("pascal_B_eval", "audiomae", "labels.npy", "pascal", "B", 0.7514),
    ("pascal_B_eval", "clap", "labels.npy", "pascal", "B", 0.7432),
    ("pascal_B_eval", "clap2023", "labels.npy", "pascal", "B", 0.8169),
    ("pascal_B_eval", "hear", "labels.npy", "pascal", "B", 0.7742),
    ("pascal_B_eval", "operaCT768", "labels.npy", "pascal", "B", 0.6444),
    ("pascal_B_eval", "vggish", "labels.npy", "pascal", "B", 0.6245),
    ("pascal_B_eval", "operaCT768_old", "labels.npy", "pascal", "B", 0.6273),
    ("pascal_B_eval", "operaGT384_old", "labels.npy", "pascal", "B", 0.6721),
    ("pascal_B_eval", "operaCE1280_old", "labels.npy", "pascal", "B", 0.6206),
    ("zchsound_noisy_eval", "audiomae", "outcomes.npy", "zchsound", "noisy", 0.6471),
    ("zchsound_noisy_eval", "clap", "outcomes.npy", "zchsound", "noisy", 0.6044),
    ("zchsound_noisy_eval", "clap2023", "outcomes.npy", "zchsound", "noisy", 0.7219),
    ("zchsound_noisy_eval", "hear", "outcomes.npy", "zchsound", "noisy", 0.5984),
    ("zchsound_noisy_eval", "operaCT768", "outcomes.npy", "zchsound", "noisy", 0.6087),
    ("zchsound_noisy_eval", "vggish", "outcomes.npy", "zchsound", "noisy", 0.6537),
    ("zchsound_noisy_eval", "operaCT768_old", "outcomes.npy", "zchsound", "noisy", 0.6507),
    ("zchsound_noisy_eval", "operaGT384_old", "outcomes.npy", "zchsound", "noisy", 0.5801),
    ("zchsound_noisy_eval", "audiomae", "murmurs.npy", "zchsound", "noisy", 0.4912),
    ("zchsound_noisy_eval", "clap", "murmurs.npy", "zchsound", "noisy", 0.5676),
    ("zchsound_noisy_eval", "clap2023", "murmurs.npy", "zchsound", "noisy", 0.5977),
    ("zchsound_noisy_eval", "hear", "murmurs.npy", "zchsound", "noisy", 0.5875),
    ("zchsound_noisy_eval", "operaCT768", "murmurs.npy", "zchsound", "noisy", 0.6291),
    ("zchsound_noisy_eval", "vggish", "murmurs.npy", "zchsound", "noisy", 0.5012),
    ("zchsound_noisy_eval", "operaGT384_old", "murmurs.npy", "zchsound", "noisy", 0.4900),
    ("zchsound_clean_eval", "clap", "outcomes.npy", "zchsound", "clean", 0.7861),
    ("zchsound_clean_eval", "clap2023", "outcomes.npy", "zchsound", "clean", 0.8229),
    ("zchsound_clean_eval", "hear", "outcomes.npy", "zchsound", "clean", 0.7677),
    ("zchsound_clean_eval", "vggish", "outcomes.npy", "zchsound", "clean", 0.6958),
    ("zchsound_clean_eval", "operaGT384_old", "outcomes.npy", "zchsound", "clean", 0.7628),
    ("circor_eval_train_only", "vggish", "murmurs.npy", "circor", "murmurs", 0.5123),
]


def _feature_path(feature_dir, feat):
    if feat.endswith("_old"):
        return os.path.join(feature_dir, feat[: -len("_old")] + "_feature_old.npy")
    return os.path.join(feature_dir, feat + "_feature.npy")


@pytest.mark.parametrize(
    "fdir,feat,labels,ds,task,want",
    GOLDEN,
    ids=[f"{r[0]}-{r[1]}-{r[2].split('.')[0]}" for r in GOLDEN],
)
def test_golden_lp_row(fdir, feat, labels, ds, task, want):
    feature_dir = os.path.join(REF_FEATURE, fdir) + "/"
    if not os.path.exists(_feature_path(feature_dir, feat)):
        pytest.skip(f"shipped cache missing: {feat} in {fdir}")
    scores = []
    for seed in range(5):
        res = linear_evaluation_heart(
            seed=seed,
            use_feature=feat,
            loss="weighted",
            dataset_name=ds,
            task=task,
            feature_dir=feature_dir,
            labels_filename=labels,
        )
        scores.append(res.test_auc)
    mean = float(np.mean(scores))
    assert abs(mean - want) < 0.01, (
        f"{fdir}/{feat}/{labels}: mean AUROC {mean:.4f} != {want} ±0.01"
    )
