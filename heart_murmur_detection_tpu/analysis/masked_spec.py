"""MAE masked-spectrogram reconstruction visualisation
(res_analysis/visualize_masked_spec.py)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit_mae import MaskedAutoencoderViT


def reconstruct(model: MaskedAutoencoderViT, variables, mel: np.ndarray, seed: int = 0):
    """Returns (original, masked_input, reconstruction) as (T,F) arrays."""
    x = jnp.asarray(mel[None])
    loss, pred, mask = model.apply(
        variables, x, rngs={"masking": jax.random.PRNGKey(seed)}
    )
    target = model.apply(variables, x, method=MaskedAutoencoderViT.patchify)
    visible = target * (1 - mask[..., None])
    recon_tokens = pred * mask[..., None] + target * (1 - mask[..., None])
    recon = model.apply(variables, recon_tokens, method=MaskedAutoencoderViT.unpatchify)
    masked_img = model.apply(variables, visible, method=MaskedAutoencoderViT.unpatchify)
    return (
        np.asarray(mel),
        np.asarray(masked_img[0]),
        np.asarray(recon[0]),
        float(loss),
    )


def plot_reconstruction(mel, masked, recon, path: Optional[str] = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, img, name in zip(axes, [mel, masked, recon], ["original", "masked", "reconstruction"]):
        ax.imshow(np.asarray(img).T, aspect="auto", origin="lower")
        ax.set_title(name)
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig
