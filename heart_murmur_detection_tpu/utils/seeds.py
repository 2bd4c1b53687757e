"""Determinism helpers.

The reference seeds numpy/torch per run (linear_eval.py:1793-1796,
finetuning.py:1373 seed_everything). In JAX all device randomness is explicit
PRNG keys; host-side shuffles/augmentation use a numpy Generator derived here.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy host RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def host_rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)
