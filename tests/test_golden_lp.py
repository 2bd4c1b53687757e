"""Golden regression rows: the 5-seed LP protocol on the reference's shipped
feature caches must keep reproducing the round-1 recorded numbers
(RESULTS.md table). This is the analog of the reference's committed golden
logs (cks/logs/Test_Task10_results.log, SURVEY §4.2): any drift in the LP
harness (split handling, weighted CE, early schedule, AUROC) fails here.

Seeds are pinned (0..4) and the protocol is deterministic up to backend float
accumulation, so the mean is asserted to ±0.01.
"""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.train.linear_eval import linear_evaluation_heart

REF_FEATURE = "/root/reference/feature"

GOLDEN = [
    # (task row in RESULTS.md, feature_dir, use_feature, labels, dataset, task, mean)
    ("PASCAL A / VGGish", "pascal_A_eval", "vggish", "labels.npy", "pascal", "A", 0.853),
    (
        "ZCHSound clean outcomes / CLAP-2023",
        "zchsound_clean_eval",
        "clap2023",
        "outcomes.npy",
        "zchsound",
        "clean",
        0.823,
    ),
]


@pytest.mark.parametrize("name,fdir,feat,labels,ds,task,want", GOLDEN)
def test_golden_lp_row(name, fdir, feat, labels, ds, task, want):
    feature_dir = os.path.join(REF_FEATURE, fdir) + "/"
    fpath = os.path.join(feature_dir, f"{feat}_feature.npy")
    if not os.path.exists(fpath):
        pytest.skip(f"shipped cache missing: {fpath}")
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
    assert abs(mean - want) < 0.01, f"{name}: mean AUROC {mean:.4f} != {want} ±0.01"
