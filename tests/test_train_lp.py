"""Metric suite + linear-probe harness. Includes a REAL end-to-end LP run on
the reference's cached pascal_A operaCT768 features (data artifact, read-only)."""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.train import metrics as M
from heart_murmur_detection_tpu.train.linear_eval import (
    get_class_weights,
    linear_evaluation_heart,
    train_linear_head,
)

REF_FEAT = "/root/reference/feature/pascal_A_eval/"


class TestMetrics:
    def test_auroc_binary_perfect_and_random(self):
        y = np.array([0, 0, 1, 1])
        probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.2, 0.8], [0.1, 0.9]])
        assert M.auroc(y, probs, 2, "macro") == pytest.approx(1.0)
        probs_bad = probs[::-1]
        assert M.auroc(y, probs_bad, 2, "macro") == pytest.approx(0.0)

    def test_auroc_matches_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        r = np.random.default_rng(0)
        y = r.integers(0, 3, 200)
        logits = r.standard_normal((200, 3))
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        want = sk.roc_auc_score(y, probs, multi_class="ovr", average="macro")
        assert M.auroc(y, probs, 3, "macro") == pytest.approx(want, abs=1e-9)
        want_w = sk.roc_auc_score(y, probs, multi_class="ovr", average="weighted")
        assert M.auroc(y, probs, 3, "weighted") == pytest.approx(want_w, abs=1e-9)

    def test_auroc_absent_class_skipped(self):
        y = np.array([0, 0, 1, 1])  # class 2 absent
        probs = np.tile([0.4, 0.4, 0.2], (4, 1))
        v = M.auroc(y, probs, 3, "macro")
        assert np.isfinite(v)

    def test_f1_recall_match_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        r = np.random.default_rng(1)
        y = r.integers(0, 4, 300)
        p = r.integers(0, 4, 300)
        assert M.f1(y, p, 4, "weighted") == pytest.approx(
            sk.f1_score(y, p, average="weighted"), abs=1e-9
        )
        assert M.recall(y, p, 4, "macro") == pytest.approx(
            sk.recall_score(y, p, average="macro"), abs=1e-9
        )
        assert M.precision(y, p, 4, "weighted") == pytest.approx(
            sk.precision_score(y, p, average="weighted", zero_division=0), abs=1e-9
        )

    def test_circor_murmur_acc(self):
        y = np.array([1, 1, 2, 0, 0])
        assert M.circor_weighted_murmur_acc(y, y) == pytest.approx(1.0)
        pred = np.array([0, 0, 0, 0, 0])  # all absent: num = 1*mAA=2
        got = M.circor_weighted_murmur_acc(pred, y)
        assert got == pytest.approx(2 / (5 * 2 + 3 * 1 + 2))

    def test_physionet16_score_perfect(self):
        y = np.array([0, 0, 1, 1])
        ann = np.array([1, 0, 1, 0])
        assert M.physionet16_score(y, y, ann) == pytest.approx(1.0)

    def test_class_weights(self):
        w = get_class_weights(np.array([0, 0, 0, 1]), 2)
        assert w[1] > w[0]
        assert w.sum() == pytest.approx(1.0)


class TestLinearHeadTraining:
    def test_learns_separable_data(self):
        r = np.random.default_rng(0)
        n, d = 400, 16
        y = r.integers(0, 2, n)
        x = r.standard_normal((n, d)).astype(np.float32) + 2.0 * y[:, None]
        res = train_linear_head(
            x[:300], y[:300], x[300:350], y[300:350], x[350:], y[350:],
            n_cls=2, lr=1e-2, epochs=10, seed=0,
        )
        assert res.test_auc > 0.95
        assert res.best_epoch >= 0

    def test_weighted_loss_runs(self):
        r = np.random.default_rng(1)
        y = (r.random(200) < 0.15).astype(np.int32)
        x = r.standard_normal((200, 8)).astype(np.float32) + y[:, None]
        cw = get_class_weights(y[:150], 2)
        res = train_linear_head(
            x[:150], y[:150], x[150:175], y[150:175], x[175:], y[175:],
            n_cls=2, lr=1e-2, epochs=5, class_weights=cw, seed=0,
        )
        assert np.isfinite(res.test_auc)

    def test_mlp_head(self):
        r = np.random.default_rng(2)
        y = r.integers(0, 3, 150)
        x = (r.standard_normal((150, 8)) + y[:, None]).astype(np.float32)
        res = train_linear_head(
            x[:100], y[:100], x[100:125], y[100:125], x[125:], y[125:],
            n_cls=3, head="mlp", lr=1e-2, epochs=5, seed=0,
        )
        assert np.isfinite(res.test_auc)


@pytest.mark.skipif(not os.path.exists(REF_FEAT), reason="reference cache absent")
class TestRealPascalLP:
    def test_lp_on_real_cached_operact_features(self):
        """End-to-end slice: reference's real cached OPERA-CT features on
        PASCAL-A must linear-probe well above chance."""
        res = linear_evaluation_heart(
            seed=0,
            use_feature="operaCT768",
            dataset_name="pascal",
            task="A",
            feature_dir=REF_FEAT,
            labels_filename="labels.npy",
            loss="weighted",
            epochs=64,
        )
        assert np.isfinite(res.test_auc)
        assert res.test_auc > 0.60, f"test_auc={res.test_auc}"
        assert "weighted_F1" in res.metrics
