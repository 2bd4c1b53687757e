"""One MAE CP epoch through the PRODUCTION training loop
(pretrain.mae_training.mae_train_multiple_data), fused on vs off — the
epoch-level wall-clock complement to bench/mae_fused_enc_check.py's
step-level A/B. Synthetic corpus at production dims (GT: (256,64) mel
clips), bf16, B=64.

Usage: [METHOD=mae|audiomae] [N=512] python -u bench/cp_epoch_ab.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, tempfile, time
import numpy as np
import jax.numpy as jnp

from heart_murmur_detection_tpu.pretrain.data import Corpus
from heart_murmur_detection_tpu.pretrain.mae_training import mae_train_multiple_data

METHOD = os.environ.get("METHOD", "mae")
N = int(os.environ.get("N", 512))
B = int(os.environ.get("B", 64))

r = np.random.default_rng(0)
T, F = (256, 64) if METHOD == "mae" else (1024, 128)
train = [r.standard_normal((T, F)).astype(np.float32) for _ in range(N)]
val = [r.standard_normal((T, F)).astype(np.float32) for _ in range(B)]


def run(fused, epochs=2):
    c = Corpus("synth", list(train), list(val), max_len=T)
    d = tempfile.mkdtemp()
    t0 = time.time()
    _, hist, _ = mae_train_multiple_data(
        f"epoch-ab-{fused}",
        data_source={"synth": T},
        training_method=METHOD,
        n_epoches=epochs,
        batch_size=B,
        corpora=[c],
        compute_dtype=jnp.bfloat16,
        fused_train=fused,
        ckpt_root=d + "/cks",
        log_dir=d + "/logs",
        verbose=False,
    )
    wall = time.time() - t0
    # epoch 2 wall-clock ~= steady state (epoch 1 pays the compiles)
    return wall, hist


for fused in (True, False):
    wall, hist = run(fused)
    e2 = hist[-1]
    print(
        f"fused={fused}: total {wall:.1f}s for 2 epochs ({N} clips, B={B}); "
        f"epoch2 {e2.get('secs', float('nan')):.1f}s; "
        f"final train_loss={e2['train_loss']:.4f} "
        f"valid_loss={e2['valid_loss']:.4f}",
        flush=True,
    )
