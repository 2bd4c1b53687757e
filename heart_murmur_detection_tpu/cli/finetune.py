"""Fine-tuning CLI (src/benchmark/other_eval/finetuning.py main, :1363-1499)."""

from __future__ import annotations

import sys

import numpy as np

from ..train.finetune import finetune_heart
from .config import parse_compute_dtype, resolve
from .linear_eval import route_heart_task


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("finetune_config", argv):
        ds, task, fdir, labels = route_heart_task(cfg["task"])
        # pretrain=null (random-init efficientnet) is string-compared
        # downstream (finetuning.py:183 `if pretrain == "null"`); the
        # yaml/hydra coercion turns the CLI token into None — map it back.
        pretrain = "null" if cfg["pretrain"] is None else cfg["pretrain"]
        # dp=N: data-parallel fine-tuning over N devices (grad psum via
        # GSPMD); tp=M adds a tensor axis (Megatron param sharding), and
        # param_sharding=fsdp gives ZeRO-3 (over the tensor axis if tp>1,
        # else over the data axis) — the memory knob for full-encoder FT
        from ..parallel.mesh import mesh_from_cli

        mesh, param_sharding = mesh_from_cli(cfg)
        scores = []
        for seed in range(cfg["n_run"]):
            res = finetune_heart(
                seed=seed,
                pretrain=pretrain,
                epochs=int(cfg.get("epochs", 64)),
                l2_strength=cfg["l2_strength"],
                feat_dim=cfg["dim"],
                dataset_name=ds,
                task=task,
                feature_dir=fdir,
                labels_filename=labels,
                freeze_encoder=cfg["freeze_encoder"],
                loss=cfg["loss"],
                spec_augment=cfg["spec_augment"],
                random_init=cfg.get("random_init", False),
                # compute_dtype=bfloat16: mixed-precision encoder fine-tune
                # (bf16 matmuls/convs, f32 norms/softmax/residual carries)
                compute_dtype=parse_compute_dtype(cfg),
                mesh=mesh,
                param_sharding=param_sharding,
            )
            print(f"seed {seed}: test_auc {res.test_auc:.4f} (best epoch {res.best_epoch})")
            scores.append(res.test_auc)
        print("=" * 48)
        print(scores)
        print(
            f"Five times mean task {cfg['task']} finetuning from {pretrain} "
            f"results: auc mean {np.mean(scores):.3f} ± {np.std(scores):.3f}"
        )
        print("=" * 48)


if __name__ == "__main__":
    main()
