"""Fine-tuning harness (src/benchmark/other_eval/finetuning.py).

Protocol (finetune_heart :880-1360):
- inputs: cached first-window spectrograms per clip — mel (256,64)
  'spectrogram_pad8.npy' for OPERA encoders, kaldi fbank (998,128)
  'fbank_audiomae.npy' for Audio-MAE
- model: encoder + linear/mlp head; loss = CE(+class weights)
  + l2 * ||head||^2 + 0.2 * l2 * ||encoder||^2 (models_eval.py:437-451)
- Adam lr, x0.99/epoch decay, grad clip 1.0, EarlyStopping on valid_auc
  (patience 10, min_delta 0.001), best ckpt by valid_auc restored for test
- optional SpecAugment on train batches (drop widths 40/8 opera, 100/20
  audiomae; finetuning.py:964,1118)
- freeze_encoder in {none, all, early} via optimizer masking

TPU-first: spectrograms live on device; one jit'd scan per epoch; SpecAugment
and drop-path run on device with explicit PRNG keys.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence

import flax.linen as nn
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio import augment
from ..models.heads import Head, freeze_mask_fn
from ..models.htsat import HTSAT, HTSATConfig
from ..models.vit_mae import (
    AudioMAEClassifierBackbone,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
from ..models.efficientnet import ColaEfficientNetEncoder
from . import metrics as M
from .linear_eval import HEART_METRICS, _make_perms, get_class_weights


class GTBackbone(nn.Module):
    """OPERA-GT fine-tune backbone: MAE encoder forward_feature."""

    config: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config or mae_vit_small_config()
        return MaskedAutoencoderViT(cfg, name="mae").forward_feature(x)


class EncoderClassifier(nn.Module):
    """encoder + head (AudioClassifier, models_eval.py:320-411)."""

    encoder_kind: str  # htsat | efficientnet | audiomae | gt
    classes: int
    head: str = "linear"
    feat_dim: int = 768
    htsat_config: Optional[HTSATConfig] = None
    # mixed-precision fine-tuning: bf16 encoder compute with f32 norms /
    # softmax / residual carries (per-encoder wiring, same recipe as CP;
    # htsat additionally honours htsat_config.compute_dtype). None = f32.
    compute_dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cd = self.compute_dtype
        if self.encoder_kind == "htsat":
            hc = self.htsat_config or HTSATConfig()
            if cd is not None and hc.compute_dtype is None:
                import dataclasses as _dc

                hc = _dc.replace(hc, compute_dtype=cd)
            h = HTSAT(hc, name="encoder")(x, train=train)["latent_output"]
        elif self.encoder_kind == "efficientnet":
            h = ColaEfficientNetEncoder(dtype=cd, name="encoder")(x, train=train)
        elif self.encoder_kind == "audiomae":
            import dataclasses as _dc

            h = AudioMAEClassifierBackbone(
                _dc.replace(audiomae_base_config(), compute_dtype=cd),
                name="encoder",
            )(x, train=train)
        elif self.encoder_kind == "gt":
            import dataclasses as _dc

            h = GTBackbone(
                config=_dc.replace(mae_vit_small_config(), compute_dtype=cd),
                name="encoder",
            )(x, train=train)
        elif self.encoder_kind in ("clap", "clap2023"):
            # raw 44.1kHz clips (B, N); AudioClassifierCLAP (models_eval.py:851)
            from ..models.clap import CLAPAudioEncoder, CLAPConfig

            version = "2023" if self.encoder_kind == "clap2023" else "2022"
            lens = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            h = CLAPAudioEncoder(CLAPConfig(version=version), name="encoder")(
                x, lens, train=train
            )
        elif self.encoder_kind == "hear":
            # raw 2s 16kHz clips; AudioClassifierHeAR (models_eval.py:1211)
            from ..models.hear import HeAREncoder

            h = HeAREncoder(name="encoder")(x, train=train)["cls"]
        else:
            raise ValueError(self.encoder_kind)
        return Head(self.classes, self.head, self.feat_dim, name="head")(h)


@dataclasses.dataclass
class FTResult:
    test_auc: float
    valid_auc: float
    best_epoch: int
    stopped_epoch: int
    metrics: Dict[str, object]
    variables: dict


def _tree_l2(tree) -> jnp.ndarray:
    return sum(jnp.sum(p**2) for p in jax.tree.leaves(tree))


def finetune_classifier(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: np.ndarray,
    y_val: np.ndarray,
    x_test: Optional[np.ndarray] = None,
    y_test: Optional[np.ndarray] = None,
    *,
    encoder_kind: str = "htsat",
    pretrained_encoder_params: Optional[dict] = None,
    pretrained_batch_stats: Optional[dict] = None,
    n_cls: int = 2,
    head: str = "linear",
    feat_dim: int = 768,
    lr: float = 1e-4,
    l2_strength: float = 1e-4,
    epochs: int = 64,
    batch_size: int = 64,
    class_weights: Optional[np.ndarray] = None,
    freeze_encoder: str = "none",
    spec_augment: bool = False,
    time_drop_width: int = 40,
    freq_drop_width: int = 8,
    patience: int = 10,
    min_delta: float = 1e-3,
    lr_decay: float = 0.99,
    grad_clip: float = 1.0,
    seed: int = 0,
    metrics: Sequence[str] = HEART_METRICS,
    dataset: Optional[str] = None,
    task: Optional[str] = None,
    annotations_test: Optional[np.ndarray] = None,
    htsat_config: Optional[HTSATConfig] = None,
    compute_dtype=None,
    mesh=None,
    param_sharding: Optional[str] = None,
    fused_train=None,
) -> FTResult:
    # mesh: data-parallel fine-tuning over a jax.sharding.Mesh with a 'data'
    # axis. The cached spectrograms are replicated (they are small — the
    # largest shipped cache is ~200 MB) and each scan step's gathered batch
    # is resharded onto the data axis with a sharding constraint, so the
    # encoder fwd+bwd runs data-parallel and GSPMD inserts the grad psum.
    # batch_size must divide the data axis (perms pad tails to full size).
    # param_sharding ('megatron'|'fsdp') additionally tensor-shards the
    # params + optimizer state (see parallel/mesh.py).
    if mesh is not None and batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis {mesh.shape['data']}"
        )
    model = EncoderClassifier(
        encoder_kind=encoder_kind,
        classes=n_cls,
        head=head,
        feat_dim=feat_dim,
        htsat_config=htsat_config,
        compute_dtype=compute_dtype,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + x_train.shape[1:]),
        )
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    if pretrained_encoder_params is not None:
        from ..extract.registry import _merge_trees

        params["encoder"] = _merge_trees(
            params.get("encoder", {}), jax.device_get(pretrained_encoder_params)
        )
        if pretrained_batch_stats:
            batch_stats["encoder"] = _merge_trees(
                batch_stats.get("encoder", {}), jax.device_get(pretrained_batch_stats)
            )

    nb = (len(x_train) + batch_size - 1) // batch_size
    sched = lambda step: lr * lr_decay ** (step // nb)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(sched),
    )
    if freeze_encoder != "none":
        pred = freeze_mask_fn(freeze_encoder)

        def labels(params):
            flat, treedef = jax.tree_util.tree_flatten_with_path(params)
            vals = [
                "train"
                if pred(tuple(str(getattr(k, "key", k)) for k in path))
                else "freeze"
                for path, _ in flat
            ]
            return jax.tree_util.tree_unflatten(treedef, vals)

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    cw = (
        jnp.asarray(class_weights)
        if class_weights is not None
        else jnp.ones((n_cls,), jnp.float32)
    )
    X = jnp.asarray(x_train)
    Y = jnp.asarray(y_train.astype(np.int32))
    if mesh is not None:
        from ..parallel.mesh import put_replicated

        batch_stats, X, Y, cw = put_replicated((batch_stats, X, Y, cw), mesh)
        if param_sharding is not None:
            # tensor-sharded fine-tuning: megatron needs a 'model' axis
            # (dp x tp mesh); fsdp on the 1-D mesh = ZeRO-3 over data —
            # params/optimizer sharded, all-gathered at use (the memory
            # knob for full-encoder FT of the ViT-L-class backbones). The
            # optimizer state is born sharded — no transient full-size
            # allocation on one chip.
            from ..parallel.mesh import shard_params_and_opt

            params, opt_state = shard_params_and_opt(params, tx, mesh, param_sharding)
        else:
            from ..parallel.mesh import replicate_sharding

            params = put_replicated(params, mesh)
            opt_state = jax.jit(tx.init, out_shardings=replicate_sharding(mesh))(params)
    else:
        opt_state = tx.init(params)

    has_bn = bool(jax.tree.leaves(batch_stats))

    # fused_train: htsat encoder fwd+bwd through the custom-VJP Pallas train
    # kernels (models/htsat_train_fused) — the FT graph is the CP encoder
    # graph plus a head, so the ~1.85x bf16 step win carries over
    # (RESULTS.md "CP training-path kernels"). Auto: single-chip htsat TPU
    # at bf16 only — at f32 the step win is ~4% while the kernel compile
    # adds minutes, a net loss for short fine-tunes.
    _bf16_path = compute_dtype == jnp.bfloat16 or (
        htsat_config is not None and htsat_config.compute_dtype == jnp.bfloat16
    )
    _fusable = encoder_kind in ("htsat", "audiomae", "gt")
    if fused_train is None:
        fused_train = (
            _fusable
            and mesh is None
            and _bf16_path
            and jax.default_backend() == "tpu"
        )
    else:
        fused_train = fused_train and _fusable and mesh is None
    if fused_train and encoder_kind in ("audiomae", "gt"):
        # MAE-family FT: the 12 ViT blocks run through the custom-VJP fused
        # train kernels (models/mae_train_fused) — same kernels as the MAE
        # CP step; these backbones have no bn/dropout state.
        from ..models.mae_train_fused import (
            audiomae_backbone_train_fused,
            gt_backbone_train_fused,
        )
        from ..models.vit_mae import audiomae_base_config, mae_vit_small_config

        _mm = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
        _interp = jax.default_backend() != "tpu"

        def _head_apply_am(hp, h):
            if head == "linear":
                return h @ hp["fc"]["kernel"] + hp["fc"]["bias"]
            h = jax.nn.relu(h @ hp["fc1"]["kernel"] + hp["fc1"]["bias"])
            return h @ hp["fc2"]["kernel"] + hp["fc2"]["bias"]

        if encoder_kind == "audiomae":
            _acfg = audiomae_base_config()

            def _encode_fused(enc_params, xb):
                return audiomae_backbone_train_fused(
                    enc_params, xb, _acfg, mm_dtype=_mm, interpret=_interp
                )
        else:  # gt: params nest under encoder/mae (GTBackbone)
            _gcfg = mae_vit_small_config()

            def _encode_fused(enc_params, xb):
                return gt_backbone_train_fused(
                    enc_params["mae"], xb, _gcfg, mm_dtype=_mm, interpret=_interp
                )

        def apply_train(params, batch_stats, xb, rng):
            return _head_apply_am(
                params["head"], _encode_fused(params["encoder"], xb)
            ), {}

    elif fused_train:
        import dataclasses as _dc

        from ..models.htsat_train_fused import htsat_encode_train

        _hc = htsat_config or HTSATConfig()
        if compute_dtype is not None and _hc.compute_dtype is None:
            _hc = _dc.replace(_hc, compute_dtype=compute_dtype)
        _mm = jnp.bfloat16 if _hc.compute_dtype == jnp.bfloat16 else jnp.float32
        # explicit fused_train=True off-TPU runs the kernels in interpret
        # mode (CPU test coverage; Pallas needs a TPU backend otherwise)
        _interp = jax.default_backend() != "tpu"

        def _head_apply(hp, h):
            if head == "linear":
                return h @ hp["fc"]["kernel"] + hp["fc"]["bias"]
            h = jax.nn.relu(h @ hp["fc1"]["kernel"] + hp["fc1"]["bias"])
            return h @ hp["fc2"]["kernel"] + hp["fc2"]["bias"]

        def apply_train(params, batch_stats, xb, rng):
            latent, new_bn = htsat_encode_train(
                {
                    "params": params["encoder"],
                    "batch_stats": batch_stats["encoder"],
                },
                xb, rng, cfg=_hc, mm_dtype=_mm, interpret=_interp,
            )
            return _head_apply(params["head"], latent), {"encoder": new_bn}

    else:

        def apply_train(params, batch_stats, xb, rng):
            vars_in = {"params": params}
            if has_bn:
                vars_in["batch_stats"] = batch_stats
            out = model.apply(
                vars_in,
                xb,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if has_bn else False,
            )
            logits, new_state = out if has_bn else (out, {})
            return logits, new_state.get("batch_stats", batch_stats) if has_bn else {}

    # ZeRO-3 gathers weights at USE: replicated constraint inside the step
    # -> one all-gather per weight on entry, reduce-scatter on its gradient
    # (instead of GSPMD propagating at-rest shardings into attention compute,
    # which forces involuntary full rematerializations). Megatron keeps
    # params sharded through compute, so no constraint there.
    _gather_at_use = None
    if mesh is not None and param_sharding == "fsdp":
        from jax.sharding import NamedSharding as _NS, PartitionSpec as _PS

        _gather_at_use = _NS(mesh, _PS())

    def loss_fn(params, batch_stats, xb, yb, valid, rng):
        if _gather_at_use is not None:
            params = jax.lax.with_sharding_constraint(params, _gather_at_use)
        logits, new_bs = apply_train(params, batch_stats, xb, rng)
        logits = logits + 1e-10
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
        w = cw[yb] * valid
        loss = (ce * w).sum() / jnp.maximum(w.sum(), 1e-12)
        loss = loss + l2_strength * _tree_l2(params["head"])
        loss = loss + 0.2 * l2_strength * _tree_l2(params["encoder"])
        return loss, new_bs

    # NOTE: no buffer donation here — the early-stopping logic snapshots
    # `best = (params, batch_stats)` across epochs, which would alias
    # donated inputs
    @jax.jit
    def run_epoch(params, batch_stats, opt_state, perm_e, rng):
        def step(carry, inp):
            params, batch_stats, opt_state, rng = carry
            idx = inp
            rng, kd, ka = jax.random.split(rng, 3)
            xb = X[jnp.maximum(idx, 0)]
            yb = Y[jnp.maximum(idx, 0)]
            valid = (idx >= 0).astype(jnp.float32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                batch_sh = NamedSharding(mesh, PartitionSpec("data"))
                xb = jax.lax.with_sharding_constraint(xb, batch_sh)
                yb = jax.lax.with_sharding_constraint(yb, batch_sh)
                valid = jax.lax.with_sharding_constraint(valid, batch_sh)
            if spec_augment:
                keys = jax.random.split(ka, xb.shape[0])
                xb = jax.vmap(
                    lambda k, x: augment.spec_augment(
                        k, x, time_drop_width, 2, freq_drop_width, 2
                    )
                )(keys, xb)
            grads, new_bs = jax.grad(loss_fn, has_aux=True)(
                params, batch_stats, xb, yb, valid, kd
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, rng), 0.0

        (params, batch_stats, opt_state, rng), _ = jax.lax.scan(
            step, (params, batch_stats, opt_state, rng), perm_e
        )
        return params, batch_stats, opt_state

    @jax.jit
    def predict(params, batch_stats, x):
        vars_in = {"params": params}
        if has_bn:
            vars_in["batch_stats"] = batch_stats
        return jax.nn.softmax(model.apply(vars_in, x, train=False), axis=-1)

    def predict_batched(params, batch_stats, x, bs=64):
        outs = []
        for i in range(0, len(x), bs):
            chunk = np.asarray(x[i : i + bs])
            if len(chunk) < bs:
                pad = np.repeat(chunk[:1], bs - len(chunk), axis=0)
                full = np.concatenate([chunk, pad], axis=0)
                outs.append(np.asarray(predict(params, batch_stats, jnp.asarray(full)))[: len(chunk)])
            else:
                outs.append(np.asarray(predict(params, batch_stats, jnp.asarray(chunk))))
        return np.concatenate(outs, axis=0)

    rng_np = np.random.default_rng(seed)
    perms = _make_perms(rng_np, len(x_train), batch_size, epochs)
    rng = jax.random.PRNGKey(seed + 7)

    from .checkpoints import EarlyStopping

    best_auc, best_epoch = -1.0, -1
    best = (params, batch_stats)
    stopped = epochs - 1
    # PL EarlyStopping(valid_auc, mode=max, min_delta=0.001, patience=10)
    # (finetuning.py:1316-1318); tracked separately from best_auc
    # (ModelCheckpoint best).
    es = EarlyStopping("max", min_delta, patience)
    for e in range(epochs):
        rng, k = jax.random.split(rng)
        params, batch_stats, opt_state = run_epoch(
            params, batch_stats, opt_state, jnp.asarray(perms[e]), k
        )
        probs_v = predict_batched(params, batch_stats, x_val)
        vauc = M.auroc(y_val, probs_v, n_cls, "macro")
        if vauc > best_auc:
            best_auc, best_epoch, best = vauc, e, (params, batch_stats)
        if es.step(vauc):
            stopped = e
            break

    params, batch_stats = best
    result_metrics: Dict[str, object] = {}
    test_auc = float("nan")
    if x_test is not None and len(x_test):
        probs_t = predict_batched(params, batch_stats, x_test)
        y_pred = probs_t.argmax(axis=1)
        test_auc = M.auroc(y_test, probs_t, n_cls, "macro")
        result_metrics = M.compute_metrics(
            metrics, y_test, y_pred, probs_t, n_cls, dataset, task, annotations_test
        )
        result_metrics["test_auc"] = test_auc
    return FTResult(
        test_auc=test_auc,
        valid_auc=best_auc,
        best_epoch=best_epoch,
        stopped_epoch=stopped,
        metrics=result_metrics,
        variables={"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)},
    )


# ---------------------------------------------------------------------------
# feature-dir driver (finetune_heart :880-1360)
# ---------------------------------------------------------------------------


def build_ft_spectrogram_cache(feature_dir: str, pretrain: str) -> np.ndarray:
    """Create/load the cached first-window inputs (finetuning.py:967-980,
    1120-1138)."""
    from ..audio import pipelines

    if "audiomae" in pretrain:
        cache = os.path.join(feature_dir, "fbank_audiomae.npy")
        if not os.path.exists(cache):
            files = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
            x = [
                pipelines.get_split_signal_fbank_pad(str(f), input_sec=10)[0]
                for f in files
            ]
            np.save(cache, np.asarray(x))
        return np.load(cache)
    if "clap" in pretrain:
        # 5s/7s raw 44.1kHz clips (AudioClassifierCLAP loads audio in forward,
        # models_eval.py:957-1029; here pre-cropped once)
        from ..models.clap import CLAPConfig, load_clap_clip

        cfg = CLAPConfig(version="2023" if "2023" in pretrain else "2022")
        cache = os.path.join(feature_dir, f"clap_audio_{cfg.version}.npy")
        if not os.path.exists(cache):
            files = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
            rng = np.random.default_rng(0)
            n = int(cfg.duration * cfg.sample_rate) // cfg.hop * cfg.hop
            x = [load_clap_clip(str(f), cfg.duration, cfg.sample_rate, rng)[:n] for f in files]
            np.save(cache, np.asarray(x))
        return np.load(cache)
    if pretrain == "hear":
        # first 2s waveform chunk (finetuning.py:1064-1078 stores waveforms)
        cache = os.path.join(feature_dir, "fbank_hear.npy")
        if not os.path.exists(cache):
            files = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
            x = [
                pipelines.get_split_signal_fbank_pad(
                    str(f), input_sec=2, spectrogram=False
                )[0]
                for f in files
            ]
            np.save(cache, np.asarray(x))
        return np.load(cache)
    cache = os.path.join(feature_dir, "spectrogram_pad8.npy")
    if not os.path.exists(cache):
        files = np.load(os.path.join(feature_dir, "sound_dir_loc.npy"))
        x = [
            pipelines.get_split_signal(str(f), input_sec=8.18, spectrogram=True)[0]
            for f in files
        ]
        np.save(cache, np.asarray(x))
    return np.load(cache)


def finetune_heart(
    seed: int,
    pretrain: str = "operaCT",
    l2_strength: float = 1e-4,
    epochs: int = 64,
    batch_size: int = 64,
    lr: float = 1e-4,
    head: str = "linear",
    loss: str = "unweighted",
    feat_dim: int = 768,
    dataset_name: str = "circor",
    task: str = "murmurs",
    feature_dir: str = "feature/circor_eval/",
    labels_filename: str = "murmurs.npy",
    freeze_encoder: str = "none",
    spec_augment: bool = False,
    random_init: bool = False,
    ckpt_path: Optional[str] = None,
    compute_dtype=None,
    mesh=None,
    param_sharding: Optional[str] = None,
    fused_train=None,
) -> FTResult:
    y_label = np.load(os.path.join(feature_dir, labels_filename))
    y_set = np.load(os.path.join(feature_dir, "train_test_split.npy"))
    valid = ~np.isnan(np.asarray(y_label, np.float64))
    y_label = y_label[valid].astype(np.int32)
    y_set = np.asarray(y_set)[valid]
    n_cls = len(set(y_label.tolist()))

    x_data = build_ft_spectrogram_cache(feature_dir, pretrain)[valid]

    if "audiomae" in pretrain:
        encoder_kind, feat_dim = "audiomae", 768
        batch_size = 32
        tdw, fdw = 100, 20
    elif "clap" in pretrain:
        encoder_kind = "clap2023" if "2023" in pretrain else "clap"
        feat_dim = 1024
        tdw, fdw = 64, 8
    elif pretrain == "hear":
        encoder_kind, feat_dim = "hear", 1024
        batch_size = 16
        tdw, fdw = 0, 0
    elif "GT" in pretrain or pretrain == "operaGT":
        encoder_kind, feat_dim = "gt", 384
        tdw, fdw = 40, 8
    elif "operaCE" in pretrain or pretrain == "null":
        encoder_kind, feat_dim = "efficientnet", 1280
        tdw, fdw = 40, 8
    else:
        encoder_kind, feat_dim = "htsat", 768
        tdw, fdw = 40, 8

    enc_params = enc_stats = None
    if not random_init and encoder_kind in ("clap", "clap2023", "hear"):
        if ckpt_path is None:
            raise FileNotFoundError(
                f"{pretrain} fine-tuning needs converted weights; pass "
                "ckpt_path= (extract.convert kinds clap2022/clap2023/hear) or "
                "random_init=True"
            )
        from ..extract import convert

        kind = "hear" if encoder_kind == "hear" else (
            "clap2023" if encoder_kind == "clap2023" else "clap2022"
        )
        loaded = convert.load_converted(ckpt_path, kind)
        enc_params = loaded["params"]
        enc_stats = loaded.get("batch_stats")
    elif not random_init and pretrain not in ("null",):
        from ..extract import registry

        _, loaded = registry.initialize_pretrained_model(pretrain, ckpt_path=ckpt_path)
        if encoder_kind in ("htsat", "efficientnet"):
            enc_params = loaded["params"]["encoder"]
            enc_stats = loaded.get("batch_stats", {}).get("encoder")
        elif encoder_kind == "gt":
            enc_params = {"mae": loaded["params"]}
        else:
            enc_params = loaded["params"]

    tr, va, te = y_set == "train", y_set == "val", y_set == "test"
    cw = get_class_weights(y_label[tr], n_cls) if loss == "weighted" else None
    ann = None
    if dataset_name == "physionet16":
        ann_all = np.load(os.path.join(feature_dir, "annotations.npy")).astype(np.int32)
        ann = ann_all[valid][te]

    # wandb project Heart-Sound-Analysis-FT (finetuning.py:897-902); gated
    from ..utils.logging import WandbLogger, get_run_name

    wandb = WandbLogger(
        "Heart-Sound-Analysis-FT",
        get_run_name(f"{pretrain}-{dataset_name}-{task}-{head}"),
        config=dict(
            n_cls=n_cls, pretrain=pretrain, l2_strength=l2_strength,
            epochs=epochs, batch_size=batch_size, lr=lr, head=head, seed=seed,
            dataset=dataset_name, task=task, freeze_encoder=freeze_encoder,
            loss=loss, spec_augment=spec_augment,
        ),
    )

    res = finetune_classifier(
        x_data[tr],
        y_label[tr],
        x_data[va],
        y_label[va],
        x_data[te],
        y_label[te],
        encoder_kind=encoder_kind,
        pretrained_encoder_params=enc_params,
        pretrained_batch_stats=enc_stats,
        n_cls=n_cls,
        head=head,
        feat_dim=feat_dim,
        lr=lr,
        l2_strength=l2_strength,
        epochs=epochs,
        batch_size=batch_size,
        class_weights=cw,
        freeze_encoder=freeze_encoder,
        spec_augment=spec_augment,
        time_drop_width=tdw,
        freq_drop_width=fdw,
        seed=seed,
        dataset=dataset_name,
        task=task,
        annotations_test=ann,
        compute_dtype=compute_dtype,
        mesh=mesh,
        param_sharding=param_sharding,
        fused_train=fused_train,
    )
    # save the best checkpoint with the reference filename convention and log
    ck_dir = (
        f"cks/finetune/{dataset_name}_{task}/" if task else f"cks/finetune/{dataset_name}"
    )
    name = "_".join(
        ["finetuning", head, pretrain, str(batch_size), str(lr), str(epochs),
         str(l2_strength), str(seed)]
    )
    if freeze_encoder == "early":
        name += "_early"
    if loss == "weighted":
        name += "_weighted"
    from .checkpoints import save_params

    try:
        save_params(
            os.path.join(
                ck_dir,
                f"{name}-epoch={res.best_epoch:02d}-valid_auc={res.valid_auc:.2f}.msgpack",
            ),
            res.variables,
        )
    except OSError:
        pass
    wandb.log({"test_auc": res.test_auc})
    wandb.finish()
    return res
