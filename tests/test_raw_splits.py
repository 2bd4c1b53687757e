"""datasets_old raw-split builders on synthetic metadata."""

import os

import numpy as np
import pytest


class TestCoughvidSplits:
    def test_build(self, tmp_path, monkeypatch):
        pd = pytest.importorskip("pandas")
        from heart_murmur_detection_tpu.data.raw_splits import coughvid_build_splits

        d = str(tmp_path) + "/"
        n = 300
        r = np.random.default_rng(0)
        df = pd.DataFrame(
            {
                "uuid": [f"u{i}" for i in range(n)],
                "cough_detected": r.uniform(0.5, 1.0, n),
                "gender": r.choice(["female", "male"], n),
                "status": r.choice(["healthy", "COVID-19"], n, p=[0.85, 0.15]),
            }
        )
        df.to_csv(d + "metadata_compiled.csv", index=False)
        kept = df[df.cough_detected >= 0.8]
        nf = int((kept.gender == "female").sum()) // 2
        nm = int((kept.gender == "male").sum()) // 2
        tr, va, te = coughvid_build_splits(
            d, n_female_test=nf, n_male_test=nm,
            n_healthy_covid_test=5, n_covid_test=2,
        )
        assert te == nf + nm
        for f in (
            "coughvid__train_uuids.npy",
            "coughvid__val_uuids.npy",
            "coughvid_gender_test_uuids.npy",
            "coughvid_covid_test_uuids.npy",
        ):
            assert os.path.exists(d + f)
        train = set(np.load(d + "coughvid__train_uuids.npy", allow_pickle=True))
        test = set(np.load(d + "coughvid_gender_test_uuids.npy", allow_pickle=True))
        assert not (train & test)


class TestCovidUKSplits:
    def test_build(self, tmp_path):
        pd = pytest.importorskip("pandas")
        from heart_murmur_detection_tpu.data.raw_splits import coviduk_build_splits

        d = str(tmp_path) + "/"
        n = 30
        pd.DataFrame(
            {
                "participant_identifier": [f"p{i}" for i in range(n)],
                "exhalation_file_name": [f"e{i}.wav" for i in range(n)],
                "cough_file_name": [f"c{i}.wav" for i in range(n)],
            }
        ).to_csv(d + "audio_metadata.csv", index=False)
        pd.DataFrame(
            {
                "participant_identifier": [f"p{i}" for i in range(n)],
                "splits": ["train"] * 20 + ["val"] * 5 + ["test"] * 5,
            }
        ).to_csv(d + "train_test_splits.csv", index=False)
        coviduk_build_splits(d)
        tr = np.load(d + "exhalation_training_files_downsample.npy", allow_pickle=True)
        te = np.load(d + "cough_testing_files_downsample.npy", allow_pickle=True)
        assert len(tr) == 20 and len(te) == 5


class TestHFLung:
    def test_metadata(self, tmp_path):
        from heart_murmur_detection_tpu.data.raw_splits import hflung_build_metadata

        base = tmp_path / "HF_Lung_V1-master"
        for split, labels in [("train", ["Wheeze", ""]), ("test", ["Rhonchi Stridor"])]:
            os.makedirs(base / split, exist_ok=True)
            for i, content in enumerate(labels):
                with open(base / split / f"rec{split}{i}_label.txt", "w") as f:
                    f.write(content)
        out = hflung_build_metadata(str(base) + "/")
        lines = open(out).read().strip().split("\n")
        assert lines[0] == "filename,split,label"
        assert any(",train,Wheeze" in l for l in lines)
        assert any(",test,Both" in l for l in lines)
        assert any(",train,None" in l for l in lines)
