"""Shared helpers for dataset processors: every processor writes the same
feature/<task>_eval/ contract as the reference (SURVEY §1 'data artifacts'):
sound_dir_loc.npy, train_test_split.npy, <labels>.npy, int_to_*.json, and the
extractors append <model><dim>_feature.npy.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def save_json(feature_dir: str, name: str, mapping: Dict) -> None:
    os.makedirs(feature_dir, exist_ok=True)
    with open(os.path.join(feature_dir, name), "w") as f:
        json.dump(mapping, f)


def stratified_64_16_20(files, labels, seed: int):
    """64/16/20 split: 20% test then 20% of remainder as val (both stratified)."""
    from sklearn.model_selection import train_test_split

    _x_train, x_test, _y_train, _ = train_test_split(
        files, labels, test_size=0.2, random_state=seed, stratify=labels
    )
    x_train, x_val, _, _ = train_test_split(
        _x_train, _y_train, test_size=0.2, random_state=seed, stratify=_y_train
    )
    tr, va = set(x_train), set(x_val)
    return ["train" if f in tr else "val" if f in va else "test" for f in files]


def extract_and_save(
    feature_dir: str,
    pretrain: str,
    input_sec: float = 8,
    dim: int = 1280,
    ckpt_path: Optional[str] = None,
    pad0: bool = False,
    fine_tuned: Optional[str] = None,
    seed=None,
    random_init: bool = False,
    batch_size: int = 16,
    wire_format: str = "int16",
    source_sr: Optional[int] = None,
) -> str:
    """Run batched extraction for a processed feature dir and save
    <pretrain><dim>_feature.npy (processing scripts' extract_and_save_embeddings).

    wire_format / source_sr: host->device transfer tuning (audio/wire.py,
    ops/resample.py) — e.g. source_sr=4000 ships CirCor at its native rate
    and upsamples on device (2.5x streaming extraction, RESULTS.md).

    Baseline encoders (vggish / clap / clap2023 / hear / opensmile) route to
    their module extractors and save <name>_feature.npy, matching the
    reference's dispatch (circor_processing.py:241-258)."""
    from ...extract.extract import FeatureExtractor

    sound_dir_loc = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
    if pretrain in ("vggish", "clap", "clap2023", "hear", "opensmile"):
        paths = [str(f) for f in sound_dir_loc]
        if pretrain == "vggish":
            from ...models.vggish import extract_vgg_feature

            feats = extract_vgg_feature(paths, random_init=random_init)
        elif pretrain in ("clap", "clap2023"):
            from ...models.clap import extract_clap_feature

            feats = extract_clap_feature(
                paths,
                version="2023" if pretrain == "clap2023" else "2022",
                random_init=random_init,
            )
        elif pretrain == "hear":
            from ...models.hear import extract_hear_feature

            feats = extract_hear_feature(paths, random_init=random_init)
        else:
            from ...models.vggish import extract_opensmile_features, opensmile_impl

            feats = np.stack(
                [
                    np.asarray(extract_opensmile_features(p)).reshape(-1)
                    for p in paths
                ]
            )
            # provenance marker: pip-opensmile and the native-emobase fallback
            # are correlated but not bit-identical — record which one built
            # this cache so features from the two are never mixed in a probe
            with open(
                os.path.join(feature_dir, pretrain + "_feature.provenance.json"), "w"
            ) as f:
                json.dump({"impl": opensmile_impl()}, f)
        out = os.path.join(feature_dir, pretrain + "_feature.npy")
        np.save(out, np.asarray(feats))
        return out
    ex = FeatureExtractor(
        pretrain,
        dim=dim,
        input_sec=input_sec,
        ckpt_path=ckpt_path,
        pad0=pad0,
        random_init=random_init,
        batch_size=batch_size,
        wire_format=wire_format,
        source_sr=source_sr,
    )
    feats = ex.extract_files([str(f) for f in sound_dir_loc])
    name = pretrain + ("" if "audiomae" in pretrain else str(dim))
    suffix = "" if not fine_tuned else f"_finetuned_{fine_tuned}_{seed}"
    out = os.path.join(feature_dir, name + suffix + "_feature.npy")
    np.save(out, feats)
    return out


def default_input_sec(pretrain: str, min_len_htsat: float = 8, min_len_cnn: float = 8):
    """Per-model window policy (circor_processing.py:325-343)."""
    if "operaCT" in pretrain:
        return min_len_htsat
    if pretrain == "operaCE":
        return min_len_cnn
    if pretrain == "operaGT":
        return 8.18
    if "audiomae" in pretrain:
        return 10
    return 8
