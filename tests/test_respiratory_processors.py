"""Respiratory processors + ICBHI cycle utilities on synthetic raw trees."""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.audio import icbhi
from heart_murmur_detection_tpu.data.processors import respiratory as resp
from heart_murmur_detection_tpu.utils.audio_io import write_wav


@pytest.fixture()
def wd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _wav(path, sec=3.0, seed=0, sr=4000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    r = np.random.default_rng(seed)
    write_wav(path, 0.2 * r.standard_normal(int(sec * sr)).astype(np.float32), sr)


class TestCopd:
    def test_split(self, wd):
        os.makedirs("datasets/copd/RespiratoryDatabase@TR", exist_ok=True)
        rows = ["patient,label"]
        for i in range(30):
            pid = f"D{i:03d}"
            rows.append(f"{pid},COPD{i % 3}")
            for ch in ("L1", "R1"):
                _wav(f"datasets/copd/RespiratoryDatabase@TR/{pid}_{ch}.wav", seed=i)
        with open("datasets/copd/Labels.csv", "w") as f:
            f.write("\n".join(rows))
        resp.copd_preprocess_split()
        labels = np.load("feature/copd_eval/labels.npy")
        splits = np.load("feature/copd_eval/train_test_split.npy")
        assert len(labels) == 60
        # patient-level split: both channels of a patient share the split
        files = np.load("feature/copd_eval/sound_dir_loc.npy")
        by_pid = {}
        for f, s in zip(files, splits):
            pid = os.path.basename(f)[:4]
            by_pid.setdefault(pid, set()).add(s)
        assert all(len(v) == 1 for v in by_pid.values())


class TestKauh:
    def test_subset_and_split(self, wd):
        os.makedirs("datasets/KAUH/AudioFiles", exist_ok=True)
        for i, lab in enumerate(["N", "Asthma", "COPD", "pneumonia"] * 12):
            _wav(f"datasets/KAUH/AudioFiles/BP{i}_{lab},x,{30+i},M.wav", seed=i)
        resp.kauh_preprocess()
        labels = np.load("feature/kauh_eval/labels_both.npy")
        assert set(labels.tolist()) == {"healthy", "asthma", "COPD"}
        assert len(labels) == 36  # pneumonia excluded
        splits = np.load("feature/kauh_eval/train_test_split.npy")
        assert set(splits.tolist()) == {"train", "test"}


class TestSsbprNosemic:
    def test_ssbpr(self, wd):
        for i in range(12):
            _wav(f"datasets/SSBPR/male/u{i:02d}/u{i:02d}_0_{i % 6}.wav", seed=i)
        resp.ssbpr_preprocess()
        labels = np.load("feature/snoring_eval/labels.npy")
        assert 5 not in set(labels.tolist())

    def test_nosemic(self, wd):
        os.makedirs("datasets/nosemic/audio", exist_ok=True)
        for u in ("4", "5"):
            for i in range(2):
                _wav(f"datasets/nosemic/audio/{u}_a_{i}_17.5.wav", seed=i)
        resp.nosemic_process_label()
        uids = np.load("feature/nosemic_eval/uids.npy")
        labels = np.load("feature/nosemic_eval/labels.npy")
        assert set(uids.tolist()) == {"4", "5"}
        assert all(l == "17.5" for l in labels)


class TestIcbhiCycles:
    def test_annotation_and_cycles(self, wd):
        d = "datasets/icbhi/ICBHI_final_database/"
        os.makedirs(d, exist_ok=True)
        name = "101_1b1_Al_sc_Meditron"
        _wav(d + name + ".wav", sec=6.0, sr=4000)
        with open(d + name + ".txt", "w") as f:
            f.write("0.0\t2.5\t0\t0\n2.5\t5.0\t1\t0\n5.0\t6.0\t1\t1\n")
        ann = icbhi.get_annotations("cycle", d)
        assert len(ann[name]) == 3
        cycles = icbhi.get_individual_cycles("cycle", ann[name], d, name, 4000, n_cls=4)
        assert [c[1] for c in cycles] == [0, 1, 3]
        assert len(cycles[0][0]) == int(2.5 * 4000)

    def test_labels(self):
        assert icbhi.get_lungsound_label(0, 1, 4) == 2
        assert icbhi.get_lungsound_label(1, 1, 2) == 1
        assert icbhi.get_diagnosis_label("COPD", 3) == 1
        assert icbhi.get_diagnosis_label("Healthy", 2) == 0


class TestCovid19Sounds:
    def test_downsample(self, wd):
        os.makedirs("feature/covid19sounds_eval", exist_ok=True)
        n = 50
        labels = np.arange(n)
        splits = np.array([0] * 30 + [1] * 10 + [2] * 10)
        np.save("feature/covid19sounds_eval/labels.npy", labels)
        np.save("feature/covid19sounds_eval/data_split.npy", splits)
        np.save(
            "feature/covid19sounds_eval/sound_dir_loc_cough.npy",
            np.array([f"f{i}.wav" for i in range(n)]),
        )
        resp.covid19sounds_task1_downsample()
        nl = np.load("feature/covid19sounds_eval/downsampled/labels.npy")
        assert len(nl) == 6 + 10 + 10
