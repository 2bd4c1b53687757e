"""Class-balance helpers (src/util.py:636-791).

`get_class_weights` (the inverse-frequency CE weights, util.py:636-645 /
linear_eval.py:93-102) lives in train.linear_eval; this module holds the
balanced downsampler used by the coswara vggish linear probe
(linear_eval.py:511-513).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def downsample_balanced_dataset(
    x_train: np.ndarray, y_train: np.ndarray, seed: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Randomly downsample every class to the size of the smallest one
    (util.py:764-791). The reference draws from the global numpy RNG; pass
    `seed` for a reproducible draw."""
    rng = np.random.default_rng(seed) if seed is not None else np.random
    y_train = np.asarray(y_train)
    min_samples = np.bincount(y_train).min()
    xs, ys = [], []
    for c in np.unique(y_train):
        idx = np.where(y_train == c)[0]
        sel = rng.choice(idx, min_samples, replace=False)
        xs.append(np.asarray(x_train)[sel])
        ys.append(y_train[sel])
    return np.concatenate(xs, axis=0), np.concatenate(ys, axis=0)
