"""Evaluation heads and classifier composition (models_eval.py:320-600,
1461-1688).

- LinearHead/MLP head: init weight ~ N(0, 0.01), bias 0 (weights_init,
  models_eval.py:1834-1840)
- Classifier = frozen-or-finetuned encoder + head; freezing is applied in the
  optimizer (parallel/train loops) via param-path masks, mirroring the
  reference's requires_grad switches (models_eval.py:341-374):
  'early' keeps patch_embed/layers 0-2/norm trainable for htsat, blocks 0-4
  for efficientnet.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn

_head_init = nn.initializers.normal(0.01)


class Head(nn.Module):
    classes: int
    head: str = "linear"  # "linear" | "mlp"
    feat_dim: int = 768

    @nn.compact
    def __call__(self, x):
        if self.head == "linear":
            return nn.Dense(self.classes, kernel_init=_head_init, name="fc")(x)
        if self.head == "mlp":
            h = nn.Dense(self.feat_dim, kernel_init=_head_init, name="fc1")(x)
            h = nn.relu(h)
            return nn.Dense(self.classes, kernel_init=_head_init, name="fc2")(h)
        raise NotImplementedError(self.head)


def freeze_mask_fn(freeze_encoder: str, encoder_name: str = "encoder") -> Callable:
    """Returns path-predicate(path)->trainable for optax.masked, replicating
    models_eval.py:341-374 name matching."""

    def trainable(path_tuple) -> bool:
        path = "/".join(str(p) for p in path_tuple)
        if encoder_name not in path:
            return True  # head always trains
        if freeze_encoder == "none":
            return True
        if freeze_encoder == "all":
            return False
        if freeze_encoder == "early":
            keep = (
                "patch_embed",
                "layers_0",
                "layers_1",
                "layers_2",
                f"{encoder_name}/norm/",  # the final LayerNorm only
                "tscam_conv",
                # efficientnet early-block names
                "cnn1",
                "_blocks_0",
                "_blocks_1",
                "_blocks_2",
                "_blocks_3",
                "_blocks_4",
            )
            return any(k in path for k in keep)
        raise ValueError(freeze_encoder)

    return trainable
