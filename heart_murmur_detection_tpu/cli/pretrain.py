"""Continued-pretraining CLI (src/pretrain/{cola,mae}_training.py mains).

Usage:
  python -m heart_murmur_detection_tpu.cli.pretrain circor=True physionet16=True \\
      encoder=htsat pretrain=operaCT title=operaCT-heart-all epoches=250 method=cola
  python -m heart_murmur_detection_tpu.cli.pretrain method=audiomae pretrain=audiomae ...
"""

from __future__ import annotations

import sys

from ..pretrain.cola_training import train_multiple_data
from ..pretrain.data import OPTIMAL_MAX_LEN_COLA, OPTIMAL_MAX_LEN_MAE
from ..pretrain.mae_training import mae_train_multiple_data
from .config import parse_compute_dtype, resolve


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("pretrain_config", argv):
        method = cfg.get("method", "cola")
        if method == "cola":
            max_lens = OPTIMAL_MAX_LEN_COLA
        elif method == "mae":
            max_lens = OPTIMAL_MAX_LEN_MAE
        else:  # audiomae
            max_lens = {k: 1024 for k in (
                "circor", "pascal_A", "pascal_B", "physionet16",
                "zchsound_clean", "zchsound_noisy",
            )}
        data_source = {dt: ml for dt, ml in max_lens.items() if cfg.get(dt) is True}
        if not data_source:
            raise SystemExit("no corpora enabled (set e.g. circor=True)")
        # mixed-precision CP (compute_dtype=bfloat16): bf16 encoder compute
        # with f32 norms/softmax/residual carries and f32 params/optimizer
        compute_dtype = parse_compute_dtype(cfg)
        # multi-chip: dp=N data-parallel devices; tp=M adds a tensor axis
        # (Megatron param sharding by default, param_sharding=fsdp for
        # ZeRO-3-style placement). dp=N param_sharding=fsdp WITHOUT tp is
        # classic ZeRO-3 over the data axis. dp*tp devices must exist.
        from ..parallel.mesh import mesh_from_cli

        mesh, param_sharding = mesh_from_cli(cfg)
        if method == "cola":
            train_multiple_data(
                cfg["title"],
                data_source=data_source,
                dim_hidden=cfg.get("dim_hidden", 1280),
                dim_out=cfg.get("dim_out", 512),
                encoder=cfg.get("encoder", "efficientnet"),
                n_epoches=cfg.get("epoches", 512),
                pretrain=cfg.get("pretrain"),
                freeze_encoder=cfg.get("freeze_encoder", "none"),
                batch_size=int(cfg.get("batch_size", 64)),
                lr=float(cfg.get("lr", 1e-4)),
                seed=cfg.get("seed", 42),
                compute_dtype=compute_dtype,
                mesh=mesh,
                param_sharding=param_sharding,
                resume=bool(cfg.get("resume", False)),
                fused_train=cfg.get("fused_train"),
            )
        else:
            mae_train_multiple_data(
                cfg["title"],
                data_source=data_source,
                n_epoches=cfg.get("epoches", 512),
                training_method=method,
                pretrain=cfg.get("pretrain"),
                batch_size=int(cfg.get("batch_size", 64)),
                lr=float(cfg.get("lr", 1e-4)),
                seed=cfg.get("seed", 42),
                compute_dtype=compute_dtype,
                mesh=mesh,
                param_sharding=param_sharding,
                resume=bool(cfg.get("resume", False)),
                fused_train=cfg.get("fused_train"),
            )


if __name__ == "__main__":
    main()
