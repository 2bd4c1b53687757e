"""t-SNE embedding visualisation (res_analysis/visualize_embedding.py,
src/util.py:648-708)."""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import numpy as np


def tsne_embed(x: np.ndarray, perplexity: int = 40, n_iter: int = 300, seed: int = 42):
    from sklearn.manifold import TSNE

    tsne = TSNE(
        n_components=2,
        perplexity=min(perplexity, max(2, len(x) // 4)),
        max_iter=max(n_iter, 250),
        random_state=seed,
        init="pca",
    )
    return tsne.fit_transform(np.asarray(x, np.float64))


def plot_tsne(
    x: np.ndarray,
    labels: Sequence,
    title: str = "",
    out_dir: str = "fig/tsne",
    order: Optional[Sequence] = None,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = tsne_embed(x)
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 6))
    labels = np.asarray(labels)
    uniq = order if order is not None else sorted(set(labels.tolist()))
    for u in uniq:
        m = labels == u
        ax.scatter(pts[m, 0], pts[m, 1], s=18, alpha=0.7, label=str(u))
    ax.legend()
    ax.set_title(title or "t-SNE")
    name = title or str(time.time())
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    print("t-sne plot saved to", path)
    return pts, path
