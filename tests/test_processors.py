"""Dataset processors on synthetic raw-data trees: artifact contract checks."""

import json
import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.data.processors import circor, pascal, physionet16, zchsound
from heart_murmur_detection_tpu.utils.audio_io import write_wav


def _wav(path, sec=2.0, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    r = np.random.default_rng(seed)
    write_wav(path, 0.2 * r.standard_normal(int(sec * 4000)).astype(np.float32), 4000)


class TestCircor:
    def test_read_data_artifacts(self, tmp_path):
        data = tmp_path / "circor"
        feat = str(tmp_path / "feat") + "/"
        os.makedirs(feat)
        murmur_info = {
            "100": ("Present", "Abnormal", "Holosystolic", "Plateau", "I/VI", "Low", "Harsh"),
            "101": ("Absent", "Normal", "nan", "nan", "nan", "nan", "nan"),
            "102": ("Unknown", "Abnormal", "nan", "nan", "nan", "nan", "nan"),
        }
        for d, pids in [("training_data", ["100", "101"]), ("test_data", ["102"])]:
            for pid in pids:
                m, o, t, s, g, p, q = murmur_info[pid]
                _wav(str(data / d / f"{pid}_AV.wav"), seed=int(pid))
                with open(data / d / f"{pid}.txt", "w") as f:
                    f.write(
                        f"#Murmur: {m}\n#Outcome: {o}\n"
                        f"#Systolic murmur timing: {t}\n"
                        f"#Systolic murmur shape: {s}\n"
                        f"#Systolic murmur grading: {g}\n"
                        f"#Systolic murmur pitch: {p}\n"
                        f"#Systolic murmur quality: {q}\n"
                    )
        os.makedirs(data / "validation_data")
        circor.read_data(str(data), feat)

        files = np.load(feat + "sound_dir_loc.npy")
        splits = np.load(feat + "train_test_split.npy")
        murmurs = np.load(feat + "murmurs.npy")
        outcomes = np.load(feat + "outcomes.npy")
        assert len(files) == len(splits) == len(murmurs) == len(outcomes) == 3
        assert set(splits) <= {"train", "val", "test"}
        timing = np.load(feat + "systolic-murmur-timing.npy")
        # Present->Holosystolic=1; Absent/Unknown -> NaN
        by_id = {os.path.basename(f).split("_")[0]: i for i, f in enumerate(files)}
        assert timing[by_id["100"]] == 1.0
        assert np.isnan(timing[by_id["101"]]) and np.isnan(timing[by_id["102"]])
        grading_wa = np.load(feat + "systolic-murmur-grading-w-absent.npy")
        assert grading_wa[by_id["101"]] == 0.0  # absent -> 0 in w-absent task
        pre = np.load(feat + "train_test_pretrain_split.npy")
        assert set(pre) <= {"train", "train_pretrain", "val", "test"}
        with open(feat + "int_to_murmurs.json") as f:
            assert json.load(f)["1"] == "Present"


class TestPascal:
    def test_preprocess_split(self, tmp_path):
        data = str(tmp_path / "PASCAL")
        feat = str(tmp_path / "feat") + "/"
        os.makedirs(feat)
        n = 0
        for d in pascal.DIRS["A"]:
            for i in range(10):
                _wav(os.path.join(data, d, f"x{n}.wav"), seed=n)
                n += 1
        pascal.preprocess_split("A", data, feat)
        labels = np.load(feat + "labels.npy")
        splits = np.load(feat + "train_test_split.npy")
        assert len(labels) == 40
        assert set(labels.tolist()) == {0, 1, 2, 3}
        # 64/16/20
        assert (splits == "train").sum() == 25 or (splits == "train").sum() == 26
        assert (splits == "test").sum() == 8


class TestZchsound:
    def test_preprocess_split(self, tmp_path):
        data = str(tmp_path / "ZCH") + "/"
        feat = str(tmp_path / "feat") + "/"
        os.makedirs(feat)
        rows = []
        diags = ["ASD", "NORMAL", "PDA", "PFO", "VSD"] * 6
        for i, dg in enumerate(diags):
            fid = f"p{i}.wav"
            _wav(os.path.join(data, "clean Heartsound Data", fid), seed=i)
            rows.append(f"{fid};x;y;{dg};z")
        os.makedirs(data, exist_ok=True)
        with open(data + "Clean Heartsound Data Details.csv", "w") as f:
            f.write("id;a;b;diag;c\n" + "\n".join(rows))
        zchsound.preprocess_split("clean", data, feat)
        outcomes = np.load(feat + "outcomes.npy")
        murmurs = np.load(feat + "murmurs.npy")
        assert len(outcomes) == 30
        assert set(murmurs.tolist()) == {0, 1}
        assert (murmurs == 0).sum() == 6  # NORMAL count


class TestPhysionet16:
    def _make(self, tmp_path):
        data = str(tmp_path / "phys") + "/"
        labels = {}
        n = 0
        for d in physionet16.TRAINING_DIRS:
            os.makedirs(os.path.join(data, "annotations/updated", d), exist_ok=True)
            ann_rows = []
            for i in range(6):
                base = f"r{n}"
                lab = "normal" if n % 2 == 0 else "abnormal"
                _wav(os.path.join(data, d, base + ".wav"), seed=n)
                with open(os.path.join(data, d, base + ".hea"), "w") as f:
                    f.write(f"{base} 1 2000 8000\n#{lab}\n")
                ann_rows.append(f"{base},{1 if lab=='abnormal' else -1},{n%2}")
                labels[base] = lab
                n += 1
            with open(
                os.path.join(data, "annotations/updated", d, "REFERENCE_withSQI.csv"), "w"
            ) as f:
                f.write("\n".join(ann_rows))
        return data

    def test_independent_split(self, tmp_path):
        data = self._make(tmp_path)
        feat = str(tmp_path / "feat") + "/"
        os.makedirs(feat)
        physionet16.preprocess_split_independent(data, feat)
        files = np.load(feat + "sound_dir_loc.npy")
        splits = np.load(feat + "train_test_split.npy")
        labels = np.load(feat + "labels.npy")
        ann = np.load(feat + "annotations.npy")
        assert len(files) == len(splits) == len(labels) == len(ann) == 36
        # d and f are test-only
        for f_, s in zip(files, splits):
            if "training-d" in f_ or "training-f" in f_:
                assert s == "test"
            if "training-b" in f_ or "training-c" in f_:
                assert s in ("train", "val")
