"""SSL data preparation (src/pretrain/prepare_data/heart_pressl.py).

Writes per-file spectrogram .npy + a filename manifest for each corpus:
- COLA/OPERA-CT path: whole-clip mel via get_entire_signal (input_sec floor,
  f_max 8000) -> feature/<t>_eval/entire_spec_npy/<id>.npy
- Audio-MAE path: first 10 s kaldi-fbank chunk ->
  feature/<t>_eval/audiomae_entire_spec_npy/<id>.npy
In-domain variant reads train_test_pretrain_split.npy and keeps
'train_pretrain' rows only (heart_pressl.py:19-25).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..audio.pipelines import get_entire_signal, get_split_signal_fbank_pad


def _select_files(feature_dir: str, in_domain: bool):
    sound_dir_loc = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
    if not in_domain:
        y_set = np.load(os.path.join(feature_dir, "train_test_split.npy"))
        keep = (y_set == "train") | (y_set == "val")
    else:
        y_set = np.load(os.path.join(feature_dir, "train_test_pretrain_split.npy"))
        keep = y_set == "train_pretrain"
    return sound_dir_loc[keep]


def preprocess_spectrogram_ssl(
    feature_dir: str, input_sec: float = 8, in_domain: bool = False
) -> int:
    files = _select_files(feature_dir, in_domain)
    spec_dir = "entire_spec_npy" + ("_in_domain" if in_domain else "")
    base = "entire_spec" + ("_in_domain" if in_domain else "")
    out_dir = os.path.join(feature_dir, spec_dir)
    names, invalid = [], 0
    for audio_file in files:
        file_id = os.path.basename(str(audio_file))[:-4]
        data = get_entire_signal(str(audio_file), input_sec=input_sec, spectrogram=True)
        if data is None:
            invalid += 1
            continue
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, file_id + ".npy"), data)
        names.append(os.path.join(feature_dir, spec_dir, file_id))
    np.save(os.path.join(feature_dir, base + "_filenames.npy"), names)
    print(f"prepared {feature_dir}: valid {len(names)}, invalid {invalid}")
    return len(names)


def preprocess_spectrogram_ssl_audiomae(
    feature_dir: str, input_sec: float = 10, in_domain: bool = False
) -> int:
    files = _select_files(feature_dir, in_domain)
    spec_dir = "audiomae_entire_spec_npy" + ("_in_domain" if in_domain else "")
    base = "audiomae_entire_spec" + ("_in_domain" if in_domain else "")
    out_dir = os.path.join(feature_dir, spec_dir)
    names, invalid = [], 0
    for audio_file in files:
        file_id = os.path.basename(str(audio_file))[:-4]
        chunks = get_split_signal_fbank_pad(
            str(audio_file), input_sec=input_sec, spectrogram=True, trim_tail=False
        )
        if not chunks:
            invalid += 1
            continue
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, file_id + ".npy"), chunks[0])
        names.append(os.path.join(feature_dir, spec_dir, file_id))
    np.save(os.path.join(feature_dir, base + "_filenames.npy"), names)
    print(f"prepared (audiomae) {feature_dir}: valid {len(names)}, invalid {invalid}")
    return len(names)
