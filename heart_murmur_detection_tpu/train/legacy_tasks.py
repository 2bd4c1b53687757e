"""Legacy OPERA benchmark task drivers (Tasks 1-19, linear_eval.py:105-1346).

Each mirrors the reference's feature-dir layout, splits, hyperparameter
defaults, and monitored-metric protocol. These all delegate to
train_linear_head / train_regression_head.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from .linear_eval import train_linear_head, train_regression_head


def _split_tvt(x, y, split, train_key="train"):
    tr = split == train_key
    va = split == "val"
    te = split == "test"
    return x[tr], y[tr], x[va], y[va], x[te], y[te]


def _lp(x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls, **kw):
    res = train_linear_head(
        x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls=n_cls, **kw
    )
    return res.test_auc


def linear_evaluation_covid19sounds(
    task=1, use_feature="opensmile", modality="cough",
    l2_strength=1e-4, lr=1e-5, head="linear", batch_size=64, epochs=64, seed=0,
):
    """Task 3/4 (linear_eval.py:105-229): downsampled dir, data_split 0/1/2."""
    folder = f"feature/covid19sounds_eval/downsampled/"
    x = np.load(folder + use_feature + f"_feature_{modality}.npy").squeeze()
    y = np.load(folder + "labels.npy")
    s = np.load(folder + "data_split.npy")
    return _lp(
        x[s == 0], y[s == 0], x[s == 1], y[s == 1], x[s == 2], y[s == 2],
        n_cls=2, head=head, lr=lr, l2_strength=l2_strength,
        epochs=epochs, batch_size=batch_size, seed=seed,
    )


def linear_evaluation_icbhidisease(
    use_feature="opensmile", l2_strength=1e-4, epochs=64, batch_size=64,
    lr=1e-4, head="linear", seed=0,
):
    """Task 7 (linear_eval.py:232-347): Healthy-vs-COPD subset, val 20% seed 1337."""
    from sklearn.model_selection import train_test_split

    fd = "feature/icbhidisease_eval/"
    y_set = np.load(fd + "split.npy")
    y_label = np.load(fd + "labels.npy")
    x = np.load(fd + use_feature + "_feature.npy").squeeze()
    mask = (y_label == "Healthy") | (y_label == "COPD")
    y_label, y_set, x = y_label[mask], y_set[mask], x[mask]
    y = np.array([{"Healthy": 0, "COPD": 1}[v] for v in y_label])
    if use_feature == "vggish":
        x = np.nan_to_num(x)
    xt, yt = x[y_set == "train"], y[y_set == "train"]
    x_te, y_te = x[y_set == "test"], y[y_set == "test"]
    x_tr, x_va, y_tr, y_va = train_test_split(
        xt, yt, test_size=0.2, random_state=1337, stratify=yt
    )
    return _lp(x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls=2, head=head,
               lr=lr, l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_kauh(
    use_feature="opensmile", l2_strength=1e-6, epochs=50, lr=1e-5,
    batch_size=64, head="linear", seed=0,
):
    """Task 10 (linear_eval.py:350-463): healthy vs obstructive(asthma/COPD),
    val 10% seed 1337; features use the *_feature_both.npy suffix."""
    from sklearn.model_selection import train_test_split

    fd = "feature/kauh_eval/"
    labels = np.load(fd + "labels_both.npy")
    y_set = np.load(fd + "train_test_split.npy")
    x = np.load(fd + use_feature + "_feature_both.npy").squeeze()
    ld = {"healthy": 0, "asthma": 1, "COPD": 1, "obstructive": 1}
    y = np.array([ld[v] for v in labels])
    xt, yt = x[y_set == "train"], y[y_set == "train"]
    x_te, y_te = x[y_set == "test"], y[y_set == "test"]
    x_tr, x_va, y_tr, y_va = train_test_split(
        xt, yt, test_size=0.1, random_state=1337, stratify=yt
    )
    return _lp(x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls=2, head=head,
               lr=lr, l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_coswara(
    use_feature="operaCE1280", l2_strength=1e-6, epochs=64, lr=1e-5,
    batch_size=32, modality="breathing-deep", label="smoker", head="linear",
    seed=0,
):
    """Tasks 8/9 (linear_eval.py:466-593): 64/16/20 seed 1337 stratified."""
    from sklearn.model_selection import train_test_split

    fd = "feature/coswara_eval/"
    broad = modality.split("-")[0]
    y = np.load(fd + f"{broad}_aligned_{label}_label_{modality}.npy")
    x = np.load(fd + use_feature + f"_feature_{modality}_{label}.npy").squeeze()
    x_tr, x_te, y_tr, y_te = train_test_split(
        x, y, test_size=0.2, random_state=1337, stratify=y
    )
    x_tr, x_va, y_tr, y_va = train_test_split(
        x_tr, y_tr, test_size=0.2, random_state=1337, stratify=y_tr
    )
    if use_feature == "vggish":
        # vggish needs a balanced train set here (linear_eval.py:511-513)
        from ..utils.balance import downsample_balanced_dataset

        x_tr, y_tr = downsample_balanced_dataset(x_tr, y_tr, seed=seed)
    return _lp(x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls=2, head=head,
               lr=lr, l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_copd(
    n_cls=5, use_feature="opensmile", l2_strength=1e-5, epochs=64,
    batch_size=32, lr=1e-4, head="linear", seed=0,
):
    """Task 11 (linear_eval.py:596-699)."""
    fd = "feature/copd_eval/"
    y_set = np.load(fd + "train_test_split.npy")
    y = np.load(fd + "labels.npy")
    x = np.load(fd + use_feature + "_feature.npy").squeeze()
    return _lp(*_split_tvt(x, y, y_set), n_cls=n_cls, head=head, lr=lr,
               l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_coughvid(
    use_feature="operaCE1280", l2_strength=1e-6, epochs=64, lr=1e-5,
    batch_size=64, label="sex", head="linear", seed=0,
):
    """Tasks 5/6 (linear_eval.py:702-807)."""
    fd = "feature/coughvid_eval/"
    y_set = np.load(fd + f"split_{label}.npy")
    y = np.load(fd + f"label_{label}.npy")
    x = np.load(fd + use_feature + f"_feature_{label}.npy").squeeze()
    if use_feature == "vggish":
        x = np.nan_to_num(x)
    return _lp(*_split_tvt(x, y, y_set), n_cls=2, head=head, lr=lr,
               l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_coviduk(
    use_feature="operaCE1280", l2_strength=1e-6, epochs=64, lr=1e-5,
    batch_size=64, modality="exhalation", head="linear", seed=0,
):
    """Tasks 1/2 (linear_eval.py:810-914)."""
    fd = "feature/coviduk_eval/"
    y_set = np.load(fd + f"split_{modality}.npy")
    y = np.load(fd + f"label_{modality}.npy")
    x = np.load(fd + use_feature + f"_feature_{modality}.npy").squeeze()
    if use_feature == "vggish":
        x = np.nan_to_num(x)
    return _lp(*_split_tvt(x, y, y_set), n_cls=2, head=head, lr=lr,
               l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed)


def linear_evaluation_ssbpr(
    n_cls=5, use_feature="opensmile", l2_strength=1e-5, epochs=32,
    batch_size=64, lr=1e-4, head="linear", seed=None,
):
    """Task 12 snoring body position (linear_eval.py:917-1036): 60/20/20
    split with FIXED seed 42 regardless of run seed (reference behavior)."""
    from sklearn.model_selection import train_test_split

    fd = "feature/snoring_eval/"
    y = np.load(fd + "labels.npy")
    x = np.load(fd + use_feature + "_feature.npy").squeeze()
    if use_feature == "vggish":
        x = np.nan_to_num(x)
    _xt, x_te, _yt, y_te = train_test_split(
        x, y, test_size=0.2, random_state=42, stratify=y
    )
    x_tr, x_va, y_tr, y_va = train_test_split(
        _xt, _yt, test_size=0.25, random_state=42, stratify=_yt
    )
    return _lp(x_tr, y_tr, x_va, y_va, x_te, y_te, n_cls=n_cls, head=head,
               lr=lr, l2_strength=l2_strength, epochs=epochs,
               batch_size=batch_size, seed=seed or 0)


def linear_evaluation_mmlung(
    use_feature="opensmile", method="LOOCV", l2_strength=1e-1, epochs=64,
    lr=1e-1, batch_size=40, modality="breath", label="FVC", head="mlp",
) -> Tuple[List[float], List[float]]:
    """Tasks 13-18 LOOCV regression (linear_eval.py:1039-1196)."""
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    fd = "feature/mmlung_eval/"
    y_all = np.load(fd + "label.npy")
    col = {"FVC": 0, "FEV1": 1, "FEV1_FVC": 2}[label]
    y = y_all[:, col].reshape(-1, 1)
    prefix = "Deep_Breath_file_" if modality == "breath" else "O_Single_file_"
    x = np.load(fd + prefix + use_feature + "_feature.npy").squeeze()
    if use_feature == "vggish":
        x = np.nan_to_num(x)

    maes, mapes = [], []
    for s in range(len(x)):
        x_te, y_te = x[s : s + 1], y[s : s + 1]
        x_rest = np.delete(x, s, axis=0)
        y_rest = np.delete(y, s, axis=0)
        if "opensmile" in use_feature:
            sc = StandardScaler()
            x_rest = sc.fit_transform(x_rest)
            x_te = sc.transform(x_te)
        x_tr, x_va, y_tr, y_va = train_test_split(
            x_rest, y_rest, test_size=0.11, random_state=42
        )
        mae, mape = train_regression_head(
            x_tr, y_tr, x_va, y_va, x_te, y_te,
            head=head, lr=lr, l2_strength=l2_strength, epochs=epochs,
            batch_size=batch_size, patience=5,
        )
        maes.append(mae)
        mapes.append(mape)
    return maes, mapes


NOSEMIC_UIDS = ["4", "5", "6", "7", "8", "9", "10", "11", "12", "13", "14",
                "17", "18", "19", "20", "21"]


def linear_evaluation_nosemic(
    use_feature="opensmile", method="LOOCV", l2_strength=1e-1, epochs=64,
    batch_size=64, lr=1e-4, head="mlp",
) -> Tuple[List[float], List[float]]:
    """Task 19 respiratory-rate LOOCV by subject (linear_eval.py:1199-1346)."""
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    fd = "feature/nosemic_eval/"
    uids = np.load(fd + "uids.npy")
    y = np.array([float(v) for v in np.load(fd + "labels.npy")]).reshape(-1, 1)
    x = np.load(fd + use_feature + "_feature.npy").squeeze()

    maes, mapes = [], []
    for uid in NOSEMIC_UIDS:
        x_tr_all, x_te = x[uids != uid], x[uids == uid]
        y_tr_all, y_te = y[uids != uid], y[uids == uid]
        if len(x_te) == 0:
            continue
        if "opensmile" in use_feature:
            sc = StandardScaler()
            x_tr_all = sc.fit_transform(x_tr_all)
            x_te = sc.transform(x_te)
        x_tr, x_va, y_tr, y_va = train_test_split(
            x_tr_all, y_tr_all, test_size=0.2, random_state=42
        )
        mae, mape = train_regression_head(
            x_tr, y_tr, x_va, y_va, x_te, y_te,
            head=head, lr=lr, l2_strength=l2_strength, epochs=epochs,
            batch_size=batch_size,
        )
        maes.append(mae)
        mapes.append(mape)
    return maes, mapes
