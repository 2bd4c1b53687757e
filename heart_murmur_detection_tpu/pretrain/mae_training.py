"""MAE / Audio-MAE continued-pretraining loop (src/pretrain/mae_training.py).

method='mae'      : OPERA-GT dims, img (256,64), patch 4, mask_ratio 0.7
method='audiomae' : ViT-B dims, img (1024,128), patch 16, mask_ratio 0.7,
                    decoder_depth 6 blocks config yet decoder_mode=1 builds 16
                    swin blocks (mae_training.py:252-309); warm-start from
                    pretrained.pth with strict load (:311-313).
Checkpoints top-5 by valid_loss every 5 epochs.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit_mae import MaskedAutoencoderViT, audiomae_base_config, mae_vit_small_config
from ..parallel.mesh import put_replicated, shard_batch
from ..train.checkpoints import TopKCheckpointer
from ..utils.logging import CSVLogger
from . import steps
from .data import MultiCorpusSampler, load_corpus


def mae_train_multiple_data(
    title: str,
    data_source: Dict[str, int],
    n_epoches: int = 150,
    training_method: str = "mae",
    pretrain: Optional[str] = None,
    batch_size: int = 64,
    lr: float = 1e-4,
    seed: int = 42,
    ckpt_root: str = "cks/model/combined",
    log_dir: str = "cks/logs",
    mesh=None,
    param_sharding: Optional[str] = None,
    corpora: Optional[list] = None,
    manifest_fn=None,
    verbose: bool = True,
    config_override=None,
    resume: bool = False,
    compute_dtype=None,
    fused_train=None,
):
    if config_override is not None:
        cfg = config_override
    elif pretrain == "audiomae" or training_method == "audiomae":
        cfg = audiomae_base_config(mask_ratio=0.7)
    else:
        cfg = mae_vit_small_config(mask_ratio=0.7)
    if compute_dtype is not None:
        # mixed-precision MAE CP: bf16 encoder ViT blocks (f32 softmax /
        # residuals / LayerNorms, see models.vit_mae.ViTBlock); the swin
        # decoder stays f32. Params/grads/optimizer stay f32.
        import dataclasses

        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng, "masking": rng}, jnp.zeros((1,) + cfg.img_size)
    )
    params = variables["params"]

    if pretrain == "audiomae":
        from ..extract import convert, registry

        path = registry.get_audiomae_encoder_path("audiomae")
        loaded = convert.load_converted(path, "mae")
        params = registry._merge_trees(jax.device_get(params), loaded["params"])

    if corpora is None:
        corpora = [
            load_corpus(
                name,
                max_len,
                training_method,
                manifest=manifest_fn(name) if manifest_fn else None,
            )
            for name, max_len in data_source.items()
        ]
    sampler = MultiCorpusSampler(corpora, batch_size, "mae", seed=seed)

    tx = steps.adam_with_epoch_decay(sampler.steps_per_epoch, lr=lr, decay=0.99)
    # fused_train: run the encoder fwd+bwd through the custom-VJP Pallas ViT
    # train kernels (models/mae_train_fused, ops/pallas_vit_train). Auto
    # (None): on for the bf16 TPU path — single-chip, or a pure
    # data-parallel mesh (the loss is shard_map'd over the data axis with
    # the masking noise hoisted outside the shard, so each shard computes
    # the exact rows the single-device run would and the grad psum comes
    # from shard_map's transpose). Tensor-sharded meshes (param_sharding)
    # keep the XLA step; at f32 the win loses to the extra kernel compile
    # through the remote-compile link.
    from ..parallel.mesh import dp_axis

    _dpax = dp_axis(mesh)
    if fused_train is None:
        fused_train = (
            compute_dtype == jnp.bfloat16
            and (mesh is None or (_dpax is not None and param_sharding is None))
            and jax.default_backend() == "tpu"
        )
    if fused_train:
        from ..models.mae_train_fused import mae_train_loss_fused

        mm = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
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

            L = cfg.patch_hw[0] * cfg.patch_hw[1]

            def _local_loss(p, x, noise):
                loss = mae_train_loss_fused(
                    model, p, x, None, mm_dtype=mm, interpret=interp,
                    noise=noise, decoder_opt=True,
                )
                # equal shard sizes and a deterministic per-row mask count
                # (len_keep is static) make the pmean of per-shard means
                # exactly the global masked mean
                return jax.lax.pmean(loss, _dpax)

            _sharded = shard_map(
                _local_loss, mesh=mesh,
                in_specs=(P(), P(_dpax), P(_dpax)), out_specs=P(),
                check_vma=False,  # pallas_call emits no vma metadata
            )

            def loss_fn(p, x, rng):
                noise = jax.random.uniform(rng, (x.shape[0], L))
                return _sharded(p, x, noise)

        else:
            loss_fn = lambda p, x, rng: mae_train_loss_fused(
                model, p, x, rng, mm_dtype=mm, interpret=interp,
                decoder_opt=True,
            )
        train_step = steps.make_mae_train_step(model, tx, loss_fn=loss_fn)
    else:
        # ZeRO-3 gathers weights at use (see steps.make_mae_train_step)
        _gather = None
        if mesh is not None and param_sharding == "fsdp":
            from jax.sharding import NamedSharding, PartitionSpec

            _gather = NamedSharding(mesh, PartitionSpec())
        train_step = steps.make_mae_train_step(
            model, tx, params_at_use_sharding=_gather
        )
    eval_step = steps.make_mae_eval_step(model)

    if mesh is not None:
        if param_sharding is not None:
            # born-sharded optimizer state (jit(tx.init) alone would not
            # inherit the param placement — zeros depend only on shapes)
            from ..parallel.mesh import shard_params_and_opt

            params, opt_state = shard_params_and_opt(params, tx, mesh, param_sharding)
        else:
            from ..parallel.mesh import replicate_sharding

            params = put_replicated(params, mesh)
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
                # restored host arrays must reproduce the init-time
                # (replicated or tensor-sharded) placement
                from ..parallel.mesh import place_like

                params = place_like(params, variables_r["params"])
                opt_state = place_like(opt_state, opt_restored)
            else:
                params = variables_r["params"]
                opt_state = opt_restored
            start_epoch += 1
            if verbose:
                print(f"[mae-cp {title}] resumed at epoch {start_epoch}")

    ckpt = TopKCheckpointer(
        dirpath=os.path.join(ckpt_root, "_".join(data_source.keys())),
        filename_fmt="encoder-" + title + "-epoch={epoch:02d}--valid_acc={valid_acc:.2f}-valid_loss={valid_loss:.4f}.msgpack",
        monitor="valid_loss",
        mode="min",
        save_top_k=5,
        every_n_epochs=5,
    )
    logger = CSVLogger(os.path.join(log_dir, "combined"), title)

    step_rng = jax.random.PRNGKey(seed + 1 + start_epoch)
    history = []
    for epoch in range(start_epoch, n_epoches):
        t0 = time.time()
        tr = []
        per_corpus = {s: [] for s in range(len(sampler.corpora))}
        for _ in range(sampler.steps_per_epoch):
            s, x = sampler.next_batch()
            xb = jnp.asarray(x)
            if mesh is not None:
                xb = shard_batch(xb, mesh)
            step_rng, k = jax.random.split(step_rng)
            params, opt_state, loss = train_step(params, opt_state, xb, k)
            tr.append(float(loss))
            per_corpus[s].append(float(loss))
        vl = []
        for s, x in sampler.val_batches():
            xb = jnp.asarray(x)
            if mesh is not None:
                xb = shard_batch(xb, mesh)
            step_rng, k = jax.random.split(step_rng)
            vl.append(float(eval_step(params, xb, k)))
        valid_loss = float(np.mean(vl)) if vl else float("nan")
        train_loss = float(np.mean(tr))
        logger.log(
            epoch=epoch,
            train_loss=train_loss,
            valid_loss=valid_loss,
            # per-drawn-corpus columns, same naming as the COLA CP logger
            **{
                f"train{s}_loss": (float(np.mean(v)) if v else float("nan"))
                for s, v in sorted(per_corpus.items())
            },
        )
        history.append(dict(epoch=epoch, train_loss=train_loss,
                            valid_loss=valid_loss, secs=time.time() - t0))
        if verbose:
            print(
                f"[mae-cp {title}] epoch {epoch} train {train_loss:.4f} "
                f"valid {valid_loss:.4f} ({time.time()-t0:.1f}s)"
            )
        ckpt.step(epoch, valid_loss, {"params": params}, valid_acc=0.0)
        resume_ckpt.save(epoch, {"params": params}, opt_state)
    return {"params": params}, history, ckpt.best_path
