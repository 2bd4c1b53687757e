"""Checkpoint save/restore with reference-compatible naming.

The reference encodes the hyperparameter tuple + epoch + monitored metric in
every checkpoint filename and *globs by that pattern* downstream
(eval_ckpts.py:79-88). We keep the same convention with .msgpack payloads
(flax.serialization) instead of torch pickles.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, List, Optional, Tuple

import flax.serialization as ser
import jax
import numpy as np


def save_params(path: str, tree: Any) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(ser.msgpack_serialize(jax.device_get(tree)))
    return path


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return ser.msgpack_restore(f.read())


def find_best_ckpt(
    dirpath: str, pattern: str, metric: str = "valid_auc", mode: str = "max"
) -> Optional[str]:
    """Glob `pattern` under dirpath and pick the best by the metric encoded in
    the filename (eval_ckpts.py:79-88 behavior)."""
    cands = glob.glob(os.path.join(dirpath, pattern))
    best, best_v = None, None
    rx = re.compile(rf"{metric}=([-0-9.]+)")
    for c in cands:
        m = rx.search(os.path.basename(c))
        if not m:
            continue
        v = float(m.group(1).rstrip("."))
        if best_v is None or (v > best_v if mode == "max" else v < best_v):
            best, best_v = c, v
    return best


class EarlyStopping:
    """PL EarlyStopping semantics (reference finetuning.py:1316-1318,
    linear_eval.py:1151-1152): the tracked best moves — and the wait counter
    resets — only on an improvement strictly exceeding min_delta; step()
    returns True once `patience` consecutive non-improvements accumulate.
    patience=None disables stopping (step() always returns False)."""

    def __init__(self, mode: str = "max", min_delta: float = 1e-3,
                 patience: Optional[int] = 10):
        assert mode in ("max", "min")
        self.sign = 1.0 if mode == "max" else -1.0
        self.min_delta = float(min_delta)
        self.patience = patience
        self.best = -float("inf")
        self.wait = 0

    def step(self, value: float) -> bool:
        if self.patience is None:
            return False
        v = self.sign * float(value)
        if v - self.min_delta > self.best:
            self.best, self.wait = v, 0
            return False
        self.wait += 1
        return self.wait >= self.patience


class ResumeCheckpointer:
    """Full-train-state 'last' checkpoint for automatic resume — a capability
    the reference lacks (SURVEY §5.3: manual resume only). Saves
    {epoch, variables, opt_state, rng_state} every N epochs to <dir>/last.msgpack."""

    def __init__(self, dirpath: str, every_n_epochs: int = 5):
        self.path = os.path.join(dirpath, "last.msgpack")
        self.every = every_n_epochs

    def save(self, epoch: int, variables, opt_state, extra: Optional[dict] = None):
        if (epoch + 1) % self.every != 0:
            return
        payload = {
            "epoch": np.asarray(epoch),
            "variables": jax.device_get(variables),
            # optax states are namedtuple pytrees; flatten to a state dict
            "opt_state": ser.to_state_dict(jax.device_get(opt_state)),
            "extra": extra or {},
        }
        save_params(self.path, payload)

    def restore(self, opt_state_target=None):
        """Returns (epoch, variables, opt_state, extra) or None. Pass a freshly
        initialized opt_state as target to rebuild its namedtuple structure."""
        if not os.path.exists(self.path):
            return None
        p = load_params(self.path)
        opt = p["opt_state"]
        if opt_state_target is not None:
            opt = ser.from_state_dict(opt_state_target, opt)
        return int(p["epoch"]), p["variables"], opt, p.get("extra", {})


class TopKCheckpointer:
    """save_top_k behavior of pl.ModelCheckpoint (cola_training.py:266-273):
    keep the k best checkpoints by a monitored metric, save every N epochs.

    Note on cadence composition: step() applies its own every_n_epochs gate
    ON TOP of the caller's. The CP loops only call step() on eval epochs
    ((epoch+1) % eval_every == 0), so checkpoints land on epochs divisible by
    BOTH cadences — e.g. eval_every=3 with every_n_epochs=10 saves every 30
    epochs. Pass every_n_epochs=1 (or a multiple of eval_every) if the caller
    already controls the cadence."""

    def __init__(
        self,
        dirpath: str,
        filename_fmt: str,
        monitor: str = "valid_loss",
        mode: str = "min",
        save_top_k: int = 5,
        every_n_epochs: int = 1,
    ):
        self.dirpath = dirpath
        self.fmt = filename_fmt
        self.monitor = monitor
        self.mode = mode
        self.k = save_top_k
        self.every = every_n_epochs
        self.kept: List[Tuple[float, str]] = []

    def step(self, epoch: int, metric_value: float, tree: Any, **fmt_kw) -> Optional[str]:
        if self.every and (epoch + 1) % self.every != 0:
            return None
        sign = -1.0 if self.mode == "min" else 1.0
        score = sign * float(metric_value)
        if len(self.kept) >= self.k and score <= min(s for s, _ in self.kept):
            return None
        name = self.fmt.format(epoch=epoch, **{self.monitor: metric_value}, **fmt_kw)
        path = save_params(os.path.join(self.dirpath, name), tree)
        self.kept.append((score, path))
        self.kept.sort(key=lambda t: -t[0])
        while len(self.kept) > self.k:
            _, worst = self.kept.pop()
            try:
                os.remove(worst)
            except OSError:
                pass
        return path

    @property
    def best_path(self) -> Optional[str]:
        return self.kept[0][1] if self.kept else None


class OrbaxResumeCheckpointer:
    """Orbax-backed variant of ResumeCheckpointer: async-capable, versioned
    step directories with retention (max_to_keep), and atomic finalization —
    preferable for long CP runs on shared filesystems. Same save/restore
    surface as ResumeCheckpointer."""

    def __init__(self, dirpath: str, every_n_epochs: int = 5, max_to_keep: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = os.path.abspath(os.path.join(dirpath, "orbax"))
        self.every = every_n_epochs
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, variables, opt_state, extra: Optional[dict] = None):
        if (epoch + 1) % self.every != 0:
            return
        payload = {
            "variables": jax.device_get(variables),
            "opt_state": ser.to_state_dict(jax.device_get(opt_state)),
        }
        # arrays go through StandardSave; extra may hold strings -> JSON item
        self.mngr.save(
            epoch,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardSave(payload),
                extra=self._ocp.args.JsonSave(extra or {}),
            ),
        )
        self.mngr.wait_until_finished()

    def restore(self, opt_state_target=None):
        step = self.mngr.latest_step()
        if step is None:
            return None
        out = self.mngr.restore(step)
        p, extra = out["state"], out.get("extra") or {}
        opt = p["opt_state"]
        if opt_state_target is not None:
            opt = ser.from_state_dict(opt_state_target, opt)
        return int(step), p["variables"], opt, extra
