"""Linear-probe evaluation harness (src/benchmark/linear_eval.py).

Protocol replicated from linear_evaluation_heart (:1354-1540):
- Adam(lr), per-epoch exponential LR decay x0.97 (DecayLearningRate :68-90)
- grad clip by global norm 1.0; CE loss (optionally inverse-frequency class
  weighted, get_weights_tensor :93-102) + l2_strength * sum(head params^2)
- max 64 epochs, batch 32, best checkpoint by valid AUROC (macro), restore for
  test; 5-seed mean +/- std at the driver.

TPU-first: the whole train set lives on device; one jit'd `lax.scan` runs an
entire epoch (amortizes the ~30 ms dispatch latency), validation is a single
batched forward. Typical LP run = 64x2 dispatches instead of ~5000.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.heads import Head
from . import metrics as M
from .metrics import STANDARD_METRICS

HEART_METRICS = STANDARD_METRICS + [
    "circor_weighted_murmur_acc",
    "circor_weighted_outcome_acc",
    "circor_outcome_cost",
    "physionet16_score",
]


def get_class_weights(labels: np.ndarray, n_cls: int) -> np.ndarray:
    """Inverse-frequency weights, normalized to sum 1 (linear_eval.py:93-102)."""
    counts = np.bincount(labels, minlength=n_cls).astype(np.float64)
    freqs = counts / counts.sum()
    w = 1.0 / freqs
    return (w / w.sum()).astype(np.float32)


@dataclasses.dataclass
class LPResult:
    test_auc: float
    valid_auc: float
    best_epoch: int
    metrics: Dict[str, object]
    params: dict


def _make_perms(rng: np.random.Generator, n: int, bs: int, epochs: int) -> np.ndarray:
    nb = (n + bs - 1) // bs
    out = np.full((epochs, nb * bs), -1, dtype=np.int32)
    for e in range(epochs):
        out[e, :n] = rng.permutation(n)
    return out.reshape(epochs, nb, bs)


import functools


@functools.lru_cache(maxsize=64)
def _lp_fns(feat_dim: int, n_cls: int, head: str, nb: int, grad_clip: float):
    """Compiled train/predict fns, cached across seeds/runs with identical
    static shape+arch (hyperparameters are runtime args => no recompiles)."""
    model = Head(classes=n_cls, head=head, feat_dim=feat_dim)
    adam = optax.scale_by_adam()

    def loss_fn(params, xb, yb, valid, cw, l2_strength):
        logits = model.apply({"params": params}, xb) + 1e-10
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
        w = cw[yb] * valid
        loss = (ce * w).sum() / jnp.maximum(w.sum(), 1e-12)
        l2 = sum(jnp.sum(p**2) for p in jax.tree.leaves(params))
        return loss + l2_strength * l2

    @jax.jit
    def run_epoch(params, opt_state, count, perm_e, X, Y, cw, lr, l2_strength, decay):
        def step(carry, idx):
            params, opt_state, count = carry
            xb = X[jnp.maximum(idx, 0)]
            yb = Y[jnp.maximum(idx, 0)]
            valid = (idx >= 0).astype(jnp.float32)
            grads = jax.grad(loss_fn)(params, xb, yb, valid, cw, l2_strength)
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = adam.update(grads, opt_state, params)
            lr_t = lr * decay ** (count // nb)
            updates = jax.tree.map(lambda u: -lr_t * u, updates)
            return (optax.apply_updates(params, updates), opt_state, count + 1), 0.0

        (params, opt_state, count), _ = jax.lax.scan(
            step, (params, opt_state, count), perm_e
        )
        return params, opt_state, count

    @jax.jit
    def predict(params, x):
        return jax.nn.softmax(model.apply({"params": params}, x), axis=-1)

    return model, adam, run_epoch, predict


def train_linear_head(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: np.ndarray,
    y_val: np.ndarray,
    x_test: Optional[np.ndarray] = None,
    y_test: Optional[np.ndarray] = None,
    *,
    n_cls: int,
    head: str = "linear",
    lr: float = 1e-4,
    l2_strength: float = 1e-5,
    epochs: int = 64,
    batch_size: int = 32,
    class_weights: Optional[np.ndarray] = None,
    lr_decay: float = 0.97,
    grad_clip: float = 1.0,
    seed: int = 0,
    metrics: Sequence[str] = (),
    dataset: Optional[str] = None,
    task: Optional[str] = None,
    annotations_test: Optional[np.ndarray] = None,
    head_dropout_rngs: Optional[dict] = None,
) -> LPResult:
    feat_dim = x_train.shape[1]
    nb = (len(x_train) + batch_size - 1) // batch_size
    model, adam, run_epoch, predict = _lp_fns(feat_dim, n_cls, head, nb, grad_clip)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, feat_dim)))["params"]
    opt_state = adam.init(params)

    cw = (
        jnp.asarray(class_weights)
        if class_weights is not None
        else jnp.ones((n_cls,), jnp.float32)
    )
    X = jnp.asarray(x_train)
    Y = jnp.asarray(y_train.astype(np.int32))
    Xv = jnp.asarray(x_val)

    rng = np.random.default_rng(seed)
    perms = _make_perms(rng, len(x_train), batch_size, epochs)

    count = jnp.zeros((), jnp.int32)
    best_auc, best_epoch, best_params = -1.0, -1, params
    for e in range(epochs):
        params, opt_state, count = run_epoch(
            params, opt_state, count, jnp.asarray(perms[e]), X, Y, cw,
            jnp.float32(lr), jnp.float32(l2_strength), jnp.float32(lr_decay),
        )
        probs_v = np.asarray(predict(params, Xv))
        vauc = M.auroc(y_val, probs_v, n_cls, "macro")
        if vauc > best_auc:
            best_auc, best_epoch, best_params = vauc, e, params

    result_metrics: Dict[str, object] = {}
    test_auc = float("nan")
    if x_test is not None:
        probs_t = np.asarray(predict(best_params, jnp.asarray(x_test)))
        y_pred = probs_t.argmax(axis=1)
        test_auc = M.auroc(y_test, probs_t, n_cls, "macro")
        result_metrics = M.compute_metrics(
            metrics, y_test, y_pred, probs_t, n_cls, dataset, task, annotations_test
        )
        result_metrics["test_auc"] = test_auc
    return LPResult(
        test_auc=test_auc,
        valid_auc=best_auc,
        best_epoch=best_epoch,
        metrics=result_metrics,
        params=jax.device_get(best_params),
    )


# ---------------------------------------------------------------------------
# feature-dir drivers (linear_evaluation_heart :1354-1540)
# ---------------------------------------------------------------------------


def load_feature_split(
    feature_dir: str, use_feature: str, labels_filename: str
):
    y_set = np.load(os.path.join(feature_dir, "train_test_split.npy"))
    y_label = np.load(os.path.join(feature_dir, labels_filename))
    # 'name_old' loads the reference's renamed legacy caches
    # (<name>_feature_old.npy, e.g. operaCT768_feature_old.npy) — the
    # reference itself has no naming rule for them (linear_eval.py:256 only
    # builds <name>_feature.npy), they are shipped artifacts.
    if use_feature.endswith("_old"):
        fname = use_feature[: -len("_old")] + "_feature_old.npy"
    else:
        fname = use_feature + "_feature.npy"
    x_data = np.load(os.path.join(feature_dir, fname)).squeeze()
    valid = ~np.isnan(np.asarray(y_label, dtype=np.float64))
    x_data = x_data[valid]
    y_label = y_label[valid].astype(np.int32)
    y_set = np.asarray(y_set)[valid]
    return x_data, y_label, y_set, valid


def linear_evaluation_heart(
    seed: int,
    use_feature: str = "operaCE1280",
    l2_strength: float = 1e-5,
    epochs: int = 64,
    batch_size: int = 32,
    lr: float = 1e-4,
    head: str = "linear",
    loss: str = "unweighted",
    dataset_name: str = "circor",
    task: str = "murmurs",
    feature_dir: str = "feature/circor_eval/",
    labels_filename: str = "murmurs.npy",
    save_ckpt_dir: Optional[str] = None,
) -> LPResult:
    x_data, y_label, y_set, valid = load_feature_split(
        feature_dir, use_feature, labels_filename
    )
    n_cls = len(set(y_label.tolist()))

    tr, va, te = y_set == "train", y_set == "val", y_set == "test"
    ann = None
    if dataset_name == "physionet16":
        ann_all = np.load(os.path.join(feature_dir, "annotations.npy")).astype(np.int32)
        ann = ann_all[valid][te]

    # wandb project Heart-Sound-Analysis (linear_eval.py:1491-1512); no-ops
    # unless WANDB_API_KEY / WANDB_MODE is configured
    from ..utils.logging import WandbLogger, get_run_name

    wandb = WandbLogger(
        "Heart-Sound-Analysis",
        get_run_name(f"{use_feature}-{dataset_name}-{task}-{head}"),
        config=dict(
            n_cls=n_cls, use_feature=use_feature, l2_strength=l2_strength,
            epochs=epochs, batch_size=batch_size, lr=lr, head=head,
            dataset=dataset_name, task=task, seed=seed,
            gradient_clip_val=1.0, loss=loss,
        ),
    )

    cw = get_class_weights(y_label[tr], n_cls) if loss == "weighted" else None
    res = train_linear_head(
        x_data[tr],
        y_label[tr],
        x_data[va],
        y_label[va],
        x_data[te],
        y_label[te],
        n_cls=n_cls,
        head=head,
        lr=lr,
        l2_strength=l2_strength,
        epochs=epochs,
        batch_size=batch_size,
        class_weights=cw,
        seed=seed,
        metrics=HEART_METRICS,
        dataset=dataset_name,
        task=task,
        annotations_test=ann,
    )
    if save_ckpt_dir:
        from .checkpoints import save_params

        name = "_".join(
            [head, use_feature, str(batch_size), str(lr), str(epochs), str(l2_strength), str(seed)]
        )
        if loss == "weighted":  # disambiguates ckpts (eval_ckpts.py:78)
            name += "_weighted"
        save_params(
            os.path.join(
                save_ckpt_dir,
                f"{name}-epoch={res.best_epoch:02d}-valid_auc={res.valid_auc:.2f}.msgpack",
            ),
            res.params,
        )
    from .metrics import expand_per_class

    wandb.log({
        "test_auc": res.test_auc,
        **expand_per_class(res.metrics, dataset_name, task),
    })
    wandb.finish()
    return res


def linear_evaluation_heart_cv(
    seed: int,
    use_feature: str,
    feature_dir: str,
    labels_filename: str,
    n_splits: int = 5,
    **kw,
) -> List[float]:
    """5-fold stratified CV over the train split (linear_eval.py:1543-1698)."""
    from sklearn.model_selection import StratifiedKFold

    x_data, y_label, y_set, _ = load_feature_split(
        feature_dir, use_feature, labels_filename
    )
    x_tr, y_tr = x_data[y_set == "train"], y_label[y_set == "train"]
    n_cls = len(set(y_tr.tolist()))
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    scores = []
    for tr_idx, va_idx in skf.split(x_tr, y_tr):
        cw = (
            get_class_weights(y_tr[tr_idx], n_cls)
            if kw.get("loss", "unweighted") == "weighted"
            else None
        )
        res = train_linear_head(
            x_tr[tr_idx],
            y_tr[tr_idx],
            x_tr[va_idx],
            y_tr[va_idx],
            x_tr[va_idx],
            y_tr[va_idx],
            n_cls=n_cls,
            head=kw.get("head", "linear"),
            lr=kw.get("lr", 1e-4),
            l2_strength=kw.get("l2_strength", 1e-5),
            epochs=kw.get("epochs", 64),
            batch_size=kw.get("batch_size", 32),
            class_weights=cw,
            seed=seed,
        )
        scores.append(res.test_auc)
    return scores


def train_regression_head(
    x_train,
    y_train,
    x_val,
    y_val,
    x_test,
    y_test,
    *,
    head: str = "mlp",
    lr: float = 1e-4,
    l2_strength: float = 1e-1,
    epochs: int = 64,
    batch_size: int = 64,
    lr_decay: float = 0.97,
    grad_clip: float = 1.0,
    seed: int = 0,
    patience: Optional[int] = None,
    min_delta: float = 1e-3,
):
    """Regression LP (LinearHeadR, models_eval.py:1691-1831): MSE on
    denormalized output (head(x)*std + mean), best/early-stop on valid MAE.
    Returns (test MAE, test MAPE)."""
    import flax.linen as nn

    feat_dim = x_train.shape[1]
    mean = float(np.mean(y_train))
    std = float(np.std(y_train))

    class RHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            init = nn.initializers.normal(0.01)
            if head == "linear":
                y = nn.Dense(1, kernel_init=init)(x)
            else:
                h = nn.relu(nn.Dense(feat_dim, kernel_init=init)(x))
                y = nn.Dense(1, kernel_init=init)(h)
            return y * std + mean

    model = RHead()
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, feat_dim)))["params"]
    nb = (len(x_train) + batch_size - 1) // batch_size
    sched = lambda step: lr * lr_decay ** (step // nb)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(sched),
    )
    opt_state = tx.init(params)
    X, Y = jnp.asarray(x_train), jnp.asarray(y_train.reshape(-1, 1))

    def loss_fn(p, xb, yb, valid):
        pred = model.apply({"params": p}, xb) + 1e-10
        se = ((pred - yb) ** 2).squeeze(-1)
        loss = (se * valid).sum() / jnp.maximum(valid.sum(), 1e-12)
        l2 = sum(jnp.sum(q**2) for q in jax.tree.leaves(p))
        return loss + l2_strength * l2

    @jax.jit
    def run_epoch(params, opt_state, perm_e):
        def step(carry, idx):
            params, opt_state = carry
            xb = X[jnp.maximum(idx, 0)]
            yb = Y[jnp.maximum(idx, 0)]
            valid = (idx >= 0).astype(jnp.float32)
            grads = jax.grad(loss_fn)(params, xb, yb, valid)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), 0.0

        (params, opt_state), _ = jax.lax.scan(step, (params, opt_state), perm_e)
        return params, opt_state

    @jax.jit
    def predict(p, x):
        return model.apply({"params": p}, x)

    rng = np.random.default_rng(seed)
    perms = _make_perms(rng, len(x_train), batch_size, epochs)
    from .checkpoints import EarlyStopping

    # PL EarlyStopping(valid_MAE, mode=min, min_delta=0.001, patience=5)
    # semantics (linear_eval.py:1151-1152)
    best_mae, best_params = np.inf, params
    es = EarlyStopping("min", min_delta, patience)
    for e in range(epochs):
        params, opt_state = run_epoch(params, opt_state, jnp.asarray(perms[e]))
        pv = np.asarray(predict(params, jnp.asarray(x_val))).ravel()
        mae = float(np.mean(np.abs(pv - np.asarray(y_val).ravel())))
        if mae < best_mae:
            best_mae, best_params = mae, params
        if es.step(mae):
            break
    pt = np.asarray(predict(best_params, jnp.asarray(x_test))).ravel()
    yt = np.asarray(y_test).ravel()
    test_mae = float(np.mean(np.abs(pt - yt)))
    test_mape = float(np.mean(np.abs((pt - yt) / yt)))
    return test_mae, test_mape


def run_seeds(fn, n_run: int = 5, **kw):
    """The 5-seed mean±std protocol (linear_eval.py:1790-1957)."""
    scores = []
    for seed in range(n_run):
        res = fn(seed=seed, **kw)
        scores.append(res.test_auc if hasattr(res, "test_auc") else res)
    arr = np.asarray(scores, dtype=np.float64)
    return arr, float(arr.mean()), float(arr.std())
