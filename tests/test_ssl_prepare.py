"""Respiratory-corpus SSL preparation wrappers (src/pretrain/prepare_data/
{coughvid,covidUK,hflung,covid19sounds}_pressl.py equivalents)."""

import os

import numpy as np

from heart_murmur_detection_tpu.pretrain import prepare
from heart_murmur_detection_tpu.utils.audio_io import write_wav

SR = 16000


def _wav(path, sec=3.0, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    r = np.random.default_rng(seed)
    write_wav(path, (0.3 * r.standard_normal(int(sec * SR))).astype(np.float32), SR)


class TestCoughvid:
    def test_prep(self, tmp_path):
        d = str(tmp_path) + "/"
        for u in ("aa", "bb", "cc"):
            _wav(os.path.join(d, "wav", u + ".wav"))
        np.save(d + "coughvid__train_uuids.npy", np.array(["aa"], dtype=object))
        np.save(d + "coughvid__val_uuids.npy", np.array(["bb"], dtype=object))
        n = prepare.preprocess_coughvid_ssl(d, input_sec=2)
        assert n == 2  # cc excluded (not in train/val uuids)
        names = np.load(d + "entire_spec_filenames.npy")
        assert len(names) == 2
        spec = np.load(str(names[0]) + ".npy")
        assert spec.ndim == 2 and spec.shape[1] == 64


class TestCovidUK:
    def test_prep_flattens_nested_lists(self, tmp_path):
        d = str(tmp_path) + "/"
        for f in ("x1.wav", "x2.wav", "x3.wav"):
            _wav(os.path.join(d, "audio", f))
        np.save(
            d + "exhalation_training_files.npy",
            np.array([["x1.wav"], ["x2.wav"]], dtype=object),
        )
        np.save(d + "exhalation_val_files.npy", np.array([["x3.wav"]], dtype=object))
        n = prepare.preprocess_coviduk_ssl(d, modality="exhalation", input_sec=2)
        assert n == 3
        assert os.path.exists(d + "entire_exhalation_filenames.npy")

    def test_falls_back_to_downsample_names(self, tmp_path):
        d = str(tmp_path) + "/"
        _wav(os.path.join(d, "audio", "y1.wav"))
        np.save(
            d + "cough_training_files_downsample.npy",
            np.array(["y1.wav"], dtype=object),
        )
        np.save(d + "cough_val_files_downsample.npy", np.array([], dtype=object))
        assert prepare.preprocess_coviduk_ssl(d, modality="cough", input_sec=2) == 1


class TestHFLung:
    def test_prep_both_trees(self, tmp_path):
        d = str(tmp_path) + "/"
        _wav(os.path.join(d, "HF_Lung_V1-master", "train", "s1.wav"), sec=9)
        _wav(os.path.join(d, "HF_Lung_V1_IP-main", "train", "s2.wav"), sec=9)
        n = prepare.preprocess_hflung_ssl(d, input_sec=8)
        assert n == 2
        names = np.load(d + "entire_spec_filenames.npy")
        assert sorted(os.path.basename(str(x)) for x in names) == ["s1", "s2"]


class TestCovid19Sounds:
    def test_quality_gate_and_exclusions(self, tmp_path):
        d = str(tmp_path) + "/"
        os.makedirs(d + "covid19_data_0426_metadata")
        # u1 passes breath check; u2 fails it; u3 passes but is a test uid
        with open(d + "covid19_data_0426_metadata/chunk0.csv", "w") as f:
            f.write("Uid;Folder Name;Breath check;Cough check;Voice check\n")
            f.write("u1;f0;b;c;v\n")
            f.write("u2;f0;n;c;v\n")
            f.write("u3;f0;b;c;v\n")
        for u in ("u1", "u2", "u3"):
            _wav(os.path.join(d, "covid19_data_0426", u, "f0", "audio_breath_x.wav"))
        np.save(d + "test_uid.npy", np.array(["u3"]))
        with open(d + "data_0426_en_task1.csv", "w") as f:
            f.write("Uid;split\nzz;2\n")
        with open(d + "data_0426_en_task2.csv", "w") as f:
            f.write("uid,fold\nyy,test\n")
        n = prepare.preprocess_covid19sounds_ssl(d, modality="breath", input_sec=2)
        assert n == 1
        names = np.load(d + "SSL_entireaudio_filenames_breath.npy")
        assert len(names) == 1 and "u1_f0_breath" in str(names[0])

    def test_voice_fallback_to_read(self, tmp_path):
        d = str(tmp_path) + "/"
        os.makedirs(d + "covid19_data_0426_metadata")
        with open(d + "covid19_data_0426_metadata/chunk0.csv", "w") as f:
            f.write("Uid;Folder Name;Breath check;Cough check;Voice check\n")
            f.write("u1;f0;b;c;v\n")
        # no *voice* file; a *read* file instead (naming inconsistency path)
        _wav(os.path.join(d, "covid19_data_0426", "u1", "f0", "audio_read_x.wav"))
        np.save(d + "test_uid.npy", np.array([], dtype="<U4"))
        with open(d + "data_0426_en_task1.csv", "w") as f:
            f.write("Uid;split\n")
        with open(d + "data_0426_en_task2.csv", "w") as f:
            f.write("uid,fold\n")
        assert prepare.preprocess_covid19sounds_ssl(d, "voice", input_sec=2) == 1
