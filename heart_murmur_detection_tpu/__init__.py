"""heart_murmur_detection_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of carla-biermann/heart-murmur-detection (OPERA heart-sound benchmark).

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  audio/     JAX DSP kernel library (replaces librosa/torchaudio/torchlibrosa)
  ops/       Pallas TPU kernels for the hot paths (fused mel frontend, ...)
  models/    Flax model zoo: HTS-AT (OPERA-CT), EfficientNet-B0 (OPERA-CE),
             MAE ViT-small (OPERA-GT), AudioMAE ViT-B, COLA wrappers, heads
  parallel/  jax.sharding Mesh / pjit data-parallel utilities (ICI collectives)
  extract/   batched jit feature-extraction service + checkpoint registry/converters
  train/     linear-probe + fine-tune harness, metric suite (incl. clinical scores)
  pretrain/  COLA contrastive and MAE continued-pretraining loops (multi-corpus)
  data/      dataset processors writing the same feature/<task>_eval/ cache layout
  cli/       hydra-compatible key=value config system + entry points
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: every CLI entry point is its own process,
# and first-compiles through a remote-compile TPU link cost 30-120 s; caching
# makes repeat invocations (sweeps, 5-seed protocols, shell pipelines) cheap.
import os as _os

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/hmdt/xla_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
