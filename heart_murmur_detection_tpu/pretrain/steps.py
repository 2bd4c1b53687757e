"""Continued-pretraining train steps (COLA contrastive / MAE reconstruction),
written as pure functions so one jit serves single-chip and data-parallel
meshes (batch sharded on the leading axis; XLA inserts the gradient psum).

COLA semantics (models_cola.py:298-330, cola_training.py:63-80):
host supplies positive-pair crops (x1, x2) of shape (B, max_len, 64) — the
markov row-mask is applied to the full clip before cropping, so it runs on
host; the random gains are folded into the host pipeline too for exact
dataset-semantics. Loss = CE(x1 W x2^T, diag) with in-batch negatives.

MAE semantics (models_mae.py:1129-1154): masked-patch MSE, mask ratio 0.7.
Optimizer: Adam 1e-4 with x0.99 per-epoch decay (DecayLearningRate),
optionally freezing parameter subtrees (freeze_encoder='early',
models_cola.py:249-261).
"""

from __future__ import annotations

from typing import Callable, Optional

import functools

import jax
import optax

from ..models.cola import Cola, cola_loss
from ..models.vit_mae import MaskedAutoencoderViT


def adam_with_epoch_decay(steps_per_epoch: int, lr: float = 1e-4, decay: float = 0.99):
    """Adam whose LR decays x`decay` at each epoch boundary."""
    sched = lambda step: lr * decay ** (step // max(steps_per_epoch, 1))
    return optax.chain(optax.scale_by_adam(), optax.scale_by_learning_rate(sched))


def make_frozen(tx, trainable_fn: Optional[Callable] = None):
    """Route frozen leaves to set_to_zero (NB optax.masked passes masked-out
    updates through unchanged, which would apply raw gradients)."""
    if trainable_fn is None:
        return tx

    def labels(params):
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        vals = [
            "train"
            if trainable_fn(tuple(str(getattr(k, "key", k)) for k in path))
            else "freeze"
            for path, _ in flat
        ]
        return jax.tree_util.tree_unflatten(treedef, vals)

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_cola_train_step(model: Cola, tx):
    # donate params/opt_state: the returned trees reuse the input buffers
    # (halves peak HBM for the optimizer state; the caller always rebinds)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x1, x2, rng):
        def loss_fn(p):
            z1, z2 = model.apply(
                {"params": p}, (x1, x2), train=True, rngs={"dropout": rng}
            )
            return cola_loss(z1, z2)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    return step


def make_cola_eval_step(model: Cola):
    @jax.jit
    def step(params, x1, x2):
        z1, z2 = model.apply({"params": params}, (x1, x2), train=False)
        return cola_loss(z1, z2)

    return step


def make_mae_train_step(
    model: MaskedAutoencoderViT, tx, loss_fn=None, params_at_use_sharding=None
):
    """loss_fn(params, x, rng) overrides the default model.apply loss — used
    to swap in the fused-kernel training forward (models.mae_train_fused).
    params_at_use_sharding (a replicated NamedSharding) is the ZeRO-3
    gather-at-use constraint: GSPMD emits one all-gather per weight on entry
    and a reduce-scatter on its gradient, instead of propagating at-rest
    shardings into the attention compute (involuntary full remat)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, rng):
        def _loss(p):
            if params_at_use_sharding is not None:
                p = jax.lax.with_sharding_constraint(p, params_at_use_sharding)
            if loss_fn is not None:
                return loss_fn(p, x, rng)
            loss, _, _ = model.apply({"params": p}, x, rng=rng)
            return loss

        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_mae_eval_step(model: MaskedAutoencoderViT):
    @jax.jit
    def step(params, x, rng):
        loss, _, _ = model.apply({"params": params}, x, rng=rng)
        return loss

    return step
