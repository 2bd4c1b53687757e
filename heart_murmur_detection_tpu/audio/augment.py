"""Spectrogram augmentations as RNG-keyed JAX transforms (device-side) plus
numpy host equivalents.

Reference semantics (distribution-matched; exact torch RNG streams cannot be
reproduced, per SURVEY §7 "match distributions"):
- random_crop     src/util.py:30-32   start ~ U{0..T-crop}, contiguous window
- random_mask     src/util.py:35-46   markov row-masking to the clip mean:
                  P(mask row | prev not masked) = rate_start,
                  P(mask row | prev masked) = rate_start + (1-rate_start)*rate_seq
- random_multiply src/util.py:49-51   global gain ~ U(0.9, 1.1)
- SpecAugment     torchlibrosa.SpecAugmentation (htsat.py:604-609,
                  finetuning.py:63-69): per stripe, width ~ U{0..drop_width-1},
                  begin ~ U{0..dim-width-1}, zeroed. stripes_num per axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# JAX (device) versions — operate on (T, F); vmap for batches.
# ---------------------------------------------------------------------------


def random_crop(key: jax.Array, x: jnp.ndarray, crop_size: int) -> jnp.ndarray:
    """Contiguous time crop. x: (T, F) -> (crop_size, F)."""
    T = x.shape[0]
    u = jax.random.uniform(key)
    start = (u * (T - crop_size)).astype(jnp.int32)
    start = jnp.clip(start, 0, max(T - crop_size, 0))
    return jax.lax.dynamic_slice_in_dim(x, start, crop_size, axis=0)


def random_mask(
    key: jax.Array, x: jnp.ndarray, rate_start: float = 0.1, rate_seq: float = 0.2
) -> jnp.ndarray:
    """Markov row masking to the clip mean. x: (T, F)."""
    T = x.shape[0]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (T,))
    u2 = jax.random.uniform(k2, (T,))

    def step(prev_zero, uu):
        a, b = uu
        z = (a < rate_start) | (prev_zero & (b < rate_seq))
        return z, z

    _, z = jax.lax.scan(step, False, (u1, u2))
    mean = x.mean()
    return jnp.where(z[:, None], mean, x)


def random_multiply(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    return x * (0.9 + jax.random.uniform(key) / 5.0)


def cola_views(
    key: jax.Array, x: jnp.ndarray, crop_size: int, augment: bool = True
):
    """The COLA positive-pair pipeline (cola_training.py:63-76):
    mask -> two independent crops -> independent gains. x: (T, F)."""
    km, k1, k2, g1, g2 = jax.random.split(key, 5)
    if augment:
        x = random_mask(km, x)
    x1 = random_crop(k1, x, crop_size)
    x2 = random_crop(k2, x, crop_size)
    if augment:
        x1 = random_multiply(g1, x1)
        x2 = random_multiply(g2, x2)
    return x1, x2


def _drop_stripes(key: jax.Array, x: jnp.ndarray, axis: int, drop_width: int, num: int):
    """Zero `num` random stripes along `axis` of a (T, F) array."""
    if drop_width <= 0 or num <= 0:
        return x
    dim = x.shape[axis]
    idx = jnp.arange(dim)
    for i in range(num):
        kw, kb, key = jax.random.split(key, 3)
        width = jax.random.randint(kw, (), 0, drop_width)
        bgn = jax.random.randint(kb, (), 0, jnp.maximum(dim - width, 1))
        mask = (idx >= bgn) & (idx < bgn + width)
        shape = [1, 1]
        shape[axis] = dim
        x = jnp.where(mask.reshape(shape), 0.0, x)
    return x


def spec_augment(
    key: jax.Array,
    x: jnp.ndarray,
    time_drop_width: int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 8,
    freq_stripes_num: int = 2,
) -> jnp.ndarray:
    """SpecAugment stripes on (T, F)."""
    kt, kf = jax.random.split(key)
    x = _drop_stripes(kt, x, 0, time_drop_width, time_stripes_num)
    x = _drop_stripes(kf, x, 1, freq_drop_width, freq_stripes_num)
    return x


# ---------------------------------------------------------------------------
# numpy host versions (for host data loaders / parity tests)
# ---------------------------------------------------------------------------


def np_random_crop(rng: np.random.Generator, x: np.ndarray, crop_size: int):
    start = int(rng.random() * (x.shape[0] - crop_size))
    return x[start : start + crop_size]


def np_random_mask(rng, x, rate_start=0.1, rate_seq=0.2):
    out = x.copy()
    mean = out.mean()
    prev = False
    for i in range(out.shape[0]):
        if rng.random() < rate_start or (prev and rng.random() < rate_seq):
            prev = True
            out[i, :] = mean
        else:
            prev = False
    return out


def np_random_multiply(rng, x):
    return x * (0.9 + rng.random() / 5.0)
