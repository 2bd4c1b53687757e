"""Legacy OPERA task drivers on synthetic feature dirs (layout contracts)."""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.train import legacy_tasks as lt
from heart_murmur_detection_tpu.train.linear_eval import train_regression_head


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _feat(n, d, y, seed=0):
    r = np.random.default_rng(seed)
    return (r.standard_normal((n, d)) + 1.5 * np.asarray(y)[:, None]).astype(np.float32)


class TestLegacyLayouts:
    def test_copd(self, workdir):
        os.makedirs("feature/copd_eval")
        n = 90
        y = np.random.default_rng(0).integers(0, 5, n)
        splits = np.array(["train"] * 60 + ["val"] * 15 + ["test"] * 15)
        np.save("feature/copd_eval/labels.npy", y)
        np.save("feature/copd_eval/train_test_split.npy", splits)
        np.save("feature/copd_eval/opensmile_feature.npy", _feat(n, 12, y))
        auc = lt.linear_evaluation_copd(use_feature="opensmile", epochs=5)
        assert np.isfinite(auc) and auc > 0.5

    def test_kauh(self, workdir):
        os.makedirs("feature/kauh_eval")
        n = 80
        labels = np.random.default_rng(1).choice(
            ["healthy", "asthma", "COPD"], n
        )
        y = np.array([0 if v == "healthy" else 1 for v in labels])
        splits = np.array(["train"] * 60 + ["test"] * 20)
        np.save("feature/kauh_eval/labels_both.npy", labels)
        np.save("feature/kauh_eval/train_test_split.npy", splits)
        np.save("feature/kauh_eval/operaCT768_feature_both.npy", _feat(n, 16, y))
        auc = lt.linear_evaluation_kauh(use_feature="operaCT768", epochs=5)
        assert np.isfinite(auc)

    def test_icbhidisease_filters_classes(self, workdir):
        os.makedirs("feature/icbhidisease_eval")
        n = 90
        labels = np.random.default_rng(2).choice(["Healthy", "COPD", "Asthma"], n)
        y = np.array([1 if v == "COPD" else 0 for v in labels])
        splits = np.array(["train"] * 70 + ["test"] * 20)
        np.save("feature/icbhidisease_eval/labels.npy", labels)
        np.save("feature/icbhidisease_eval/split.npy", splits)
        np.save("feature/icbhidisease_eval/opensmile_feature.npy", _feat(n, 10, y))
        auc = lt.linear_evaluation_icbhidisease(use_feature="opensmile", epochs=5)
        assert np.isfinite(auc)

    def test_coughvid_and_coviduk(self, workdir):
        for fd, key in [("coughvid", "covid"), ("coviduk", "exhalation")]:
            os.makedirs(f"feature/{fd}_eval", exist_ok=True)
            n = 80
            y = np.random.default_rng(3).integers(0, 2, n)
            splits = np.array(["train"] * 50 + ["val"] * 10 + ["test"] * 20)
            np.save(f"feature/{fd}_eval/label_{key}.npy", y)
            np.save(f"feature/{fd}_eval/split_{key}.npy", splits)
            np.save(f"feature/{fd}_eval/operaCE1280_feature_{key}.npy", _feat(n, 8, y))
        assert np.isfinite(
            lt.linear_evaluation_coughvid(use_feature="operaCE1280", label="covid", epochs=4)
        )
        assert np.isfinite(
            lt.linear_evaluation_coviduk(
                use_feature="operaCE1280", modality="exhalation", epochs=4
            )
        )

    def test_ssbpr_fixed_split(self, workdir):
        os.makedirs("feature/snoring_eval")
        n = 100
        y = np.random.default_rng(4).integers(0, 5, n)
        np.save("feature/snoring_eval/labels.npy", y)
        np.save("feature/snoring_eval/opensmile_feature.npy", _feat(n, 8, y))
        a1 = lt.linear_evaluation_ssbpr(use_feature="opensmile", epochs=4, seed=0)
        assert np.isfinite(a1)

    def test_nosemic_loocv(self, workdir):
        os.makedirs("feature/nosemic_eval")
        n = 96
        uids = np.array([str(u) for u in np.repeat(lt.NOSEMIC_UIDS[:4], 24)])[:n]
        rates = np.random.default_rng(5).uniform(10, 30, n)
        np.save("feature/nosemic_eval/uids.npy", uids)
        np.save("feature/nosemic_eval/labels.npy", rates.astype(str))
        np.save(
            "feature/nosemic_eval/opensmile_feature.npy",
            (np.random.default_rng(6).standard_normal((n, 6)) + rates[:, None] / 10).astype(
                np.float32
            ),
        )
        maes, mapes = lt.linear_evaluation_nosemic(
            use_feature="opensmile", epochs=3, batch_size=16
        )
        assert len(maes) == 4
        assert all(np.isfinite(m) for m in maes)


class TestRegressionHead:
    def test_learns_linear_target(self):
        r = np.random.default_rng(0)
        x = r.standard_normal((120, 6)).astype(np.float32)
        y = (x @ np.arange(1, 7) + 5).astype(np.float32).reshape(-1, 1)
        mae, mape = train_regression_head(
            x[:80], y[:80], x[80:100], y[80:100], x[100:], y[100:],
            head="mlp", lr=1e-2, l2_strength=1e-6, epochs=40, batch_size=16,
        )
        assert mae < np.abs(y).mean()  # clearly better than predicting zero
