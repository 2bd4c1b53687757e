"""COLA continued-pretraining loop (src/pretrain/cola_training.py).

Protocol: batch 64, Adam 1e-4 with x0.99/epoch decay, up to 512 epochs,
multi-corpus weighted sampling (one corpus per step), checkpoint top-5 by
valid_loss every 10 epochs, optional warm-start from a base OPERA encoder and
optional freeze_encoder='early' (spectrogram/bn + swin stage 0,
models_cola.py:249-261 — our DSP is outside the model, so 'early' freezes bn0
+ patch_embed + stage 0).

TPU-native: the step is one jit (per corpus crop length); with a mesh the
batch shards over the 'data' axis and XLA inserts the grad psum over ICI.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cola import Cola, ColaConfig
from ..parallel.mesh import put_replicated, shard_batch
from ..train.checkpoints import TopKCheckpointer
from ..utils.logging import CSVLogger
from . import steps
from .data import Corpus, MultiCorpusSampler, load_corpus


def _cola_early_freeze(path: tuple) -> bool:
    p = "/".join(path)
    frozen = ("encoder/bn0", "encoder/layers_0_blocks",)
    return not any(k in p for k in frozen)


def train_multiple_data(
    title: str,
    data_source: Dict[str, int],
    dim_fea: int = 1280,
    dim_hidden: int = 1280,
    dim_out: int = 512,
    encoder: str = "efficientnet",
    n_epoches: int = 512,
    pretrain: Optional[str] = None,
    freeze_encoder: str = "none",
    batch_size: int = 64,
    lr: float = 1e-4,
    seed: int = 42,
    ckpt_root: str = "cks/model/combined",
    log_dir: str = "cks/logs",
    mesh=None,
    param_sharding: Optional[str] = None,
    corpora: Optional[list] = None,
    manifest_fn=None,
    eval_every: int = 1,
    verbose: bool = True,
    htsat_config=None,
    resume: bool = False,
    compute_dtype=None,
    fused_train=None,
    dropout_p: float = 0.1,
):
    # compute_dtype=jnp.bfloat16 -> mixed-precision encoder compute (bf16
    # matmuls/convs, f32 norms/softmax/residual carries; f32 params +
    # optimizer). Wired per-encoder: HTSATConfig.compute_dtype for htsat,
    # ColaConfig.compute_dtype (ColaEfficientNetEncoder) for efficientnet.
    if compute_dtype is not None and encoder == "htsat" and htsat_config is None:
        from ..models.htsat import HTSATConfig

        htsat_config = HTSATConfig(compute_dtype=compute_dtype)
    kw = {} if htsat_config is None else {"htsat": htsat_config}
    model = Cola(
        ColaConfig(
            encoder=encoder, dim_fea=dim_fea, dim_hidden=dim_hidden,
            dim_out=dim_out, p=dropout_p,
            compute_dtype=compute_dtype if encoder == "efficientnet" else None,
        ),
        **kw,
    )
    rng = jax.random.PRNGKey(seed)
    bins = htsat_config.mel_bins if htsat_config is not None else 64
    dummy = jnp.zeros((1, 64, bins))
    variables = model.init(rng, (dummy, dummy))
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    if pretrain and pretrain != "None":
        from ..extract import registry

        _, loaded = registry.initialize_pretrained_model(pretrain)
        # warm-start encoder weights (strict=False overlap, models_cola.py:230-234)
        params = registry._merge_trees(jax.device_get(params), jax.device_get(loaded["params"]))
        if "batch_stats" in loaded and "batch_stats" in extra:
            extra["batch_stats"] = registry._merge_trees(
                jax.device_get(extra["batch_stats"]), loaded["batch_stats"]
            )

    if corpora is None:
        corpora = [
            load_corpus(name, max_len, "cola", manifest=manifest_fn(name) if manifest_fn else None)
            for name, max_len in data_source.items()
        ]
    # with a device mesh, batches must divide evenly across the data axis, so
    # force drop_last; otherwise keep the method default (cola: keep tails)
    sampler = MultiCorpusSampler(
        corpora, batch_size, "cola", seed=seed, drop_last=True if mesh is not None else None
    )

    tx = steps.adam_with_epoch_decay(sampler.steps_per_epoch, lr=lr, decay=0.99)
    if freeze_encoder == "early":
        tx = steps.make_frozen(tx, _cola_early_freeze)

    from ..models.cola import cola_loss

    # fused_train: run the encoder fwd+bwd through the custom-VJP Pallas
    # train kernels (models/htsat_train_fused, ops/pallas_swin_train) —
    # 1.85x the bf16 XLA step at B=64 (RESULTS.md "CP training-path
    # kernels"). Auto (None): on for the bf16 htsat TPU path — single-chip,
    # or a pure data-parallel mesh: the pair forward is shard_map'd over
    # the data axis (params replicated, batch sharded; bn0 moments sync'd
    # with pmean, per-shard dropout rngs), the contrastive loss — which
    # couples the FULL batch through in-batch negatives — stays outside in
    # GSPMD-land, and shard_map's transpose inserts the grad psum. Tensor-
    # sharded meshes keep the XLA step (at f32 the step win is ~4% against
    # minutes of extra kernel compile).
    _bf16_path = compute_dtype == jnp.bfloat16 or (
        htsat_config is not None
        and getattr(htsat_config, "compute_dtype", None) == jnp.bfloat16
    )
    from ..parallel.mesh import dp_axis

    _dpax = dp_axis(mesh)
    if fused_train is None:
        fused_train = (
            encoder == "htsat"
            and (mesh is None or (_dpax is not None and param_sharding is None))
            and _bf16_path
            and jax.default_backend() == "tpu"
        )
    if fused_train:
        from ..models.htsat import HTSATConfig
        from ..models.htsat_train_fused import cola_train_apply

        hcfg = htsat_config if htsat_config is not None else HTSATConfig()
        mm = jnp.bfloat16 if _bf16_path else jnp.float32
        # explicit fused_train=True off-TPU -> interpret mode (CPU tests)
        interp = jax.default_backend() != "tpu"

        if mesh is not None:
            if _dpax is None or param_sharding is not None:
                raise ValueError(
                    "fused_train under a mesh needs pure data parallelism "
                    "(1-D data mesh, no param_sharding); Pallas kernels "
                    "cannot run under tensor-sharded GSPMD"
                )
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def _local_pair(p, bstats, x1, x2, rng):
                return cola_train_apply(
                    {"params": p, "batch_stats": bstats}, (x1, x2), rng,
                    p_drop=model.config.p, cfg=hcfg, mm_dtype=mm,
                    interpret=interp, axis_name=_dpax,
                )

            _sm_pair = shard_map(
                _local_pair, mesh=mesh,
                in_specs=(P(), P(), P(_dpax), P(_dpax), P()),
                out_specs=((P(_dpax), P(_dpax)), P()),
                check_vma=False,  # pallas_call emits no vma metadata
            )

            def apply_pair(p, bstats, pair, rng):
                return _sm_pair(p, bstats, pair[0], pair[1], rng)

        else:

            def apply_pair(p, bstats, pair, rng):
                return cola_train_apply(
                    {"params": p, "batch_stats": bstats}, pair, rng,
                    p_drop=model.config.p, cfg=hcfg, mm_dtype=mm,
                    interpret=interp,
                )

    else:

        def apply_pair(p, bstats, pair, rng):
            (z1, z2), new_state = model.apply(
                {"params": p, "batch_stats": bstats},
                pair,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return (z1, z2), new_state["batch_stats"]

    # ZeRO-3 gathers weights at USE: constrain the param tree to replicated
    # inside the step, so GSPMD emits one all-gather per weight on entry
    # (and, via the transpose, a reduce-scatter on its gradient) instead of
    # propagating the at-rest shardings into the attention compute — the
    # latter produced "Involuntary full rematerialization" SPMD warnings
    # (sharded softmax stats resharded mid-chain). Megatron keeps params
    # sharded through compute, so no constraint there.
    _gather_at_use = None
    if mesh is not None and param_sharding == "fsdp":
        from jax.sharding import NamedSharding, PartitionSpec

        _gather_at_use = NamedSharding(mesh, PartitionSpec())

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x1, x2, rng):
        def loss_fn(p):
            if _gather_at_use is not None:
                p = jax.lax.with_sharding_constraint(p, _gather_at_use)
            (z1, z2), new_bs = apply_pair(p, batch_stats, (x1, x2), rng)
            loss, acc = cola_loss(z1, z2)
            return loss, (acc, new_bs)

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            jax.tree.map(lambda p, u: p + u, params, updates),
            new_bs,
            opt_state,
            loss,
            acc,
        )

    @jax.jit
    def eval_step(params, batch_stats, x1, x2):
        z1, z2 = model.apply(
            {"params": params, "batch_stats": batch_stats}, (x1, x2), train=False
        )
        return cola_loss(z1, z2)

    batch_stats = extra.get("batch_stats", {})
    if mesh is not None:
        if param_sharding is not None:
            # tensor axis: Megatron/FSDP param placement; GSPMD propagates
            # activation shardings and inserts the collectives. The optimizer
            # state is born sharded via explicit out_shardings — jit(tx.init)
            # alone would NOT inherit the param placement (zeros depend only
            # on shapes, so XLA may put the whole state on one device).
            from ..parallel.mesh import shard_params_and_opt

            params, opt_state = shard_params_and_opt(params, tx, mesh, param_sharding)
            batch_stats = put_replicated(batch_stats, mesh)
        else:
            from ..parallel.mesh import replicate_sharding

            params = put_replicated(params, mesh)
            batch_stats = put_replicated(batch_stats, mesh)
            opt_state = jax.jit(tx.init, out_shardings=replicate_sharding(mesh))(params)
    else:
        opt_state = tx.init(params)

    from ..train.checkpoints import ResumeCheckpointer

    resume_ckpt = ResumeCheckpointer(
        os.path.join(ckpt_root, "_".join(data_source.keys()), title), every_n_epochs=5
    )
    start_epoch = 0
    if resume:
        restored = resume_ckpt.restore(opt_state_target=opt_state)
        if restored is not None:
            start_epoch, variables_r, opt_restored, _ = restored
            if mesh is not None:
                # re-apply the init-time placement: the restored host arrays
                # must land with the same (replicated or tensor-sharded)
                # layout the compiled train step expects
                from ..parallel.mesh import place_like

                params = place_like(params, variables_r["params"])
                if "batch_stats" in variables_r:
                    batch_stats = place_like(batch_stats, variables_r["batch_stats"])
                opt_state = place_like(opt_state, opt_restored)
            else:
                params = variables_r["params"]
                batch_stats = variables_r.get("batch_stats", batch_stats)
                opt_state = opt_restored
            start_epoch += 1
            if verbose:
                print(f"[cola-cp {title}] resumed at epoch {start_epoch}")

    ckpt = TopKCheckpointer(
        dirpath=os.path.join(ckpt_root, "_".join(data_source.keys())),
        filename_fmt="encoder-" + title + "-epoch={epoch:02d}--valid_acc={valid_acc:.2f}-valid_loss={valid_loss:.4f}.msgpack",
        monitor="valid_loss",
        mode="min",
        save_top_k=5,
        every_n_epochs=10,
    )
    logger = CSVLogger(os.path.join(log_dir, "combined"), title)

    step_rng = jax.random.PRNGKey(seed + 1 + start_epoch)
    history = []
    for epoch in range(start_epoch, n_epoches):
        t0 = time.time()
        tr_losses = []
        for _ in range(sampler.steps_per_epoch):
            s, (x1, x2) = sampler.next_batch()
            b = (jnp.asarray(x1), jnp.asarray(x2))
            if mesh is not None:
                b = shard_batch(b, mesh)
            step_rng, k = jax.random.split(step_rng)
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, b[0], b[1], k
            )
            tr_losses.append((s, loss))
        if (epoch + 1) % eval_every == 0:
            vl, va = [], []
            for s, (x1, x2) in sampler.val_batches():
                b = (jnp.asarray(x1), jnp.asarray(x2))
                if mesh is not None:
                    b = shard_batch(b, mesh)
                loss, acc = eval_step(params, batch_stats, b[0], b[1])
                vl.append(float(loss))
                va.append(float(acc))
            valid_loss = float(np.mean(vl)) if vl else float("nan")
            valid_acc = float(np.mean(va)) if va else float("nan")
            train_loss = float(np.mean([float(l) for _, l in tr_losses]))
            # per-corpus means, keyed train{s}_loss by corpus index like the
            # reference's weighted-draw logging (models_cola.py:327-329)
            per_corpus = {s: [] for s in range(len(sampler.corpora))}
            for s, l in tr_losses:
                per_corpus[s].append(float(l))
            corpus_losses = {  # stable CSV header: every corpus, every epoch
                f"train{s}_loss": (float(np.mean(v)) if v else float("nan"))
                for s, v in sorted(per_corpus.items())
            }
            logger.log(
                epoch=epoch,
                train_loss=train_loss,
                valid_loss=valid_loss,
                valid_acc=valid_acc,
                **corpus_losses,
            )
            history.append(dict(epoch=epoch, train_loss=train_loss, valid_loss=valid_loss, valid_acc=valid_acc))
            if verbose:
                print(
                    f"[cola-cp {title}] epoch {epoch} train {train_loss:.4f} "
                    f"valid {valid_loss:.4f} acc {valid_acc:.3f} ({time.time()-t0:.1f}s)"
                )
            ckpt.step(
                epoch,
                valid_loss,
                {"params": params, "batch_stats": batch_stats},
                valid_acc=valid_acc,
            )
        resume_ckpt.save(
            epoch, {"params": params, "batch_stats": batch_stats}, opt_state
        )
    return {"params": params, "batch_stats": batch_stats}, history, ckpt.best_path
