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


def preprocess_entire_spec_files(
    files,
    out_dir: str,
    manifest_path: str,
    input_sec: float = 8,
    split_values=None,
    split_path: str = None,
) -> int:
    """Generic whole-clip SSL spectrogram prep over a file list (the shape of
    every *_pressl.py script: mel per clip -> per-file .npy + manifest [+
    optional parallel split array], e.g. icbhi_pressl.preprocess_entire_spectrogram)."""
    names, keep_split, invalid = [], [], 0
    for i, audio_file in enumerate(files):
        file_id = os.path.basename(str(audio_file))[:-4]
        data = get_entire_signal(str(audio_file), input_sec=input_sec, spectrogram=True)
        if data is None:
            invalid += 1
            continue
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, file_id + ".npy"), data)
        names.append(os.path.join(out_dir, file_id))
        if split_values is not None:
            keep_split.append(split_values[i])
    np.save(manifest_path, names)
    if split_values is not None and split_path:
        np.save(split_path, keep_split)
    print(f"prepared {manifest_path}: valid {len(names)}, invalid {invalid}")
    return len(names)


def preprocess_icbhi_entire(data_dir: str = "datasets/icbhi/", input_sec: float = 8):
    """icbhi_pressl.preprocess_entire_spectrogram: manifest + train/test split
    from the official challenge split file."""
    import glob as gb

    import pandas as pd

    splits = pd.read_csv(
        os.path.join(data_dir, "ICBHI_challenge_train_test.txt"),
        dtype=str, sep="\t", names=["fileID", "group"],
    ).set_index("fileID")["group"]
    files = sorted(gb.glob(os.path.join(data_dir, "ICBHI_final_database", "*.wav")))
    split_values = [splits.loc[os.path.basename(f)[:-4]] for f in files]
    return preprocess_entire_spec_files(
        files,
        os.path.join(data_dir, "entire_spec_npy"),
        os.path.join(data_dir, "entire_spec_filenames.npy"),
        input_sec,
        split_values,
        os.path.join(data_dir, "entire_spec_split.npy"),
    )


def preprocess_icbhi_cycles(data_dir: str = "datasets/icbhi/", input_sec: float = 2):
    """icbhi_pressl.preprocess_cycle_spectrogram: per-respiratory-cycle specs."""
    import glob as gb

    import pandas as pd

    from ..audio.icbhi import get_annotations, get_individual_cycles

    splits = pd.read_csv(
        os.path.join(data_dir, "ICBHI_challenge_train_test.txt"),
        dtype=str, sep="\t", names=["fileID", "group"],
    ).set_index("fileID")["group"]
    audio_dir = os.path.join(data_dir, "ICBHI_final_database")
    ann = get_annotations("cycle", audio_dir)
    out_dir = os.path.join(data_dir, "cycle_spec_pad2_npy")
    os.makedirs(out_dir, exist_ok=True)
    names, split_vals, valid, invalid = [], [], 0, 0
    for f in sorted(gb.glob(os.path.join(audio_dir, "*.wav"))):
        fid = os.path.basename(f)[:-4]
        cycles = get_individual_cycles("cycle", ann[fid], audio_dir, fid, 16000, 2)
        for j, (audio, _label) in enumerate(cycles, start=1):
            data = get_entire_signal(
                "", input_sec=input_sec, spectrogram=True, yt=audio
            )
            if data is None:
                invalid += 1
                continue
            np.save(os.path.join(out_dir, f"{fid}cycle{j}.npy"), data)
            names.append(os.path.join(out_dir, f"{fid}cycle{j}"))
            split_vals.append(splits.loc[fid])
            valid += 1
    np.save(os.path.join(data_dir, "cycle_spec_pad2_name.npy"), names)
    np.save(os.path.join(data_dir, "cycle_spec_split.npy"), split_vals)
    print("valid_data", valid, "invalid_data", invalid)
    return valid


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
