"""Raw-data split builders (datasets_old/ one-off scripts).

These generate the published split artifacts that the processors /
SSL loaders consume (SURVEY §2.2 "raw-data split helpers").
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def coughvid_build_splits(
    data_dir: str = "datasets/coughvid/",
    n_female_test: int = 1031,
    n_male_test: int = 1924,
    n_healthy_covid_test: int = 2237,
    n_covid_test: int = 172,
):
    """datasets_old/coughvid_split.py: gate on cough_detected >= 0.8; fixed-size
    gender-balanced test (seed 0); 75/25 train/val of the rest (seed 100);
    separate covid test subset sampled from the gender test set (seed 0)."""
    import pandas as pd
    from sklearn.model_selection import train_test_split

    df = pd.read_csv(os.path.join(data_dir, "metadata_compiled.csv"))
    df = df[df["cough_detected"] >= 0.8]

    female_test = df[df["gender"] == "female"].sample(n=n_female_test, random_state=0)["uuid"]
    male_test = df[df["gender"] == "male"].sample(n=n_male_test, random_state=0)["uuid"]
    test_uuids = pd.concat([female_test, male_test])
    train_val = df[~df["uuid"].isin(test_uuids)]
    train_uuids, val_uuids = train_test_split(train_val, test_size=0.25, random_state=100)

    np.save(os.path.join(data_dir, "coughvid__train_uuids.npy"), train_uuids["uuid"].values)
    np.save(os.path.join(data_dir, "coughvid__val_uuids.npy"), val_uuids["uuid"].values)
    np.save(os.path.join(data_dir, "coughvid_gender_test_uuids.npy"), test_uuids.values)

    test_df = df[df["uuid"].isin(test_uuids)]
    healthy = test_df[test_df["status"] == "healthy"].sample(
        n=n_healthy_covid_test, random_state=0
    )["uuid"]
    covid = test_df[test_df["status"] == "COVID-19"].sample(
        n=n_covid_test, random_state=0
    )["uuid"]
    covid_test = pd.concat([healthy, covid])
    np.save(os.path.join(data_dir, "coughvid_covid_test_uuids.npy"), covid_test.values)
    return len(train_uuids), len(val_uuids), len(test_uuids)


def coviduk_build_splits(
    data_dir: str = "datasets/covidUK/", downsample_factor: int = 1
):
    """datasets_old/covidUK_split.py: per-modality file lists from the official
    participant train/val/test splits (train_test_splits.csv). The published
    *_downsample.npy variants subsample trains; factor=1 keeps all."""
    import pandas as pd

    participant = pd.read_csv(os.path.join(data_dir, "audio_metadata.csv"))
    split = pd.read_csv(os.path.join(data_dir, "train_test_splits.csv"))
    merged = pd.merge(participant, split, on="participant_identifier")

    for modality in ("exhalation", "cough"):
        buckets: Dict[str, list] = {"train": [], "val": [], "test": []}
        col = f"{modality}_file_name"
        for _, row in merged.iterrows():
            s = row["splits"]
            if s in buckets and isinstance(row[col], str):
                buckets[s].append(row[col])
        if downsample_factor > 1:
            buckets["train"] = buckets["train"][::downsample_factor]
        np.save(
            os.path.join(data_dir, f"{modality}_training_files_downsample.npy"),
            np.array(buckets["train"], dtype=object),
        )
        np.save(
            os.path.join(data_dir, f"{modality}_val_files_downsample.npy"),
            np.array(buckets["val"], dtype=object),
        )
        np.save(
            os.path.join(data_dir, f"{modality}_testing_files_downsample.npy"),
            np.array(buckets["test"], dtype=object),
        )


def hflung_build_metadata(data_dir: str = "datasets/hf_lung/HF_Lung_V1-master/"):
    """datasets_old/hf_lung/hflung_split.py: label each recording from its
    annotation txt (Wheeze/Stridor/Rhonchi/Both/None) into metadata.csv."""
    rows = ["filename,split,label"]
    for split in ("train", "test"):
        path = os.path.join(data_dir, split)
        if not os.path.isdir(path):
            continue
        for f in sorted(os.listdir(path)):
            if not f.endswith(".txt"):
                continue
            content = open(os.path.join(path, f)).read()
            flags = [k for k in ("Wheeze", "Stridor", "Rhonchi") if k in content]
            label = "Both" if len(flags) > 1 else (flags[0] if flags else "None")
            rows.append(f"{f.split('.')[0][:-6]},{split},{label}")
    out = os.path.join(os.path.dirname(data_dir.rstrip("/")), "metadata.csv")
    with open(out, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return out
