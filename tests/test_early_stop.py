"""Early-stopping semantics (PL EarlyStopping parity) + MAE sampler item
pipeline. Regression tests for round-1 advisor findings: the wait counter
must reset on improvement (reference finetuning.py:1316-1318,
linear_eval.py:1151-1152) and mae/audiomae items are crop-or-zero-pad only
(reference mae_training.py:86-107)."""

import numpy as np

from heart_murmur_detection_tpu.pretrain.data import (
    Corpus,
    MultiCorpusSampler,
    mae_item_np,
)
from heart_murmur_detection_tpu.train.linear_eval import train_regression_head


def test_regression_early_stop_wait_resets():
    # steadily-improving fit: with the old (broken) wait counter every run
    # halted at epoch patience+1 and the test MAE stayed >> 1; with PL
    # semantics the run continues while improvements exceed min_delta.
    r = np.random.default_rng(0)
    n, d = 200, 16
    X = r.standard_normal((n, d)).astype(np.float32)
    w = r.standard_normal(d).astype(np.float32)
    y = X @ w + 0.01 * r.standard_normal(n).astype(np.float32)
    mae, _ = train_regression_head(
        X[:120], y[:120], X[120:160], y[120:160], X[160:], y[160:],
        lr=1e-2, l2_strength=0.0, epochs=150, batch_size=32, seed=0,
        patience=5,
    )
    assert mae < 0.8, f"early stop fired while still improving (mae={mae})"


def test_mae_sampler_is_crop_or_pad_only():
    # batch must bitwise-equal the manual crop-or-zero-pad pipeline under the
    # same rng stream: any masking augmentation would consume rng draws and
    # alter values.
    r = np.random.default_rng(3)
    clips = [r.random((40 + i, 64)).astype(np.float32) for i in range(8)]
    corp = Corpus("c", clips, clips[:2], max_len=48)
    s = MultiCorpusSampler([corp], 4, "mae", seed=9)
    _, b = s.next_batch()
    rng = np.random.default_rng(9)
    _ = int(rng.choice(1, p=[1.0]))
    order = rng.permutation(8)
    manual = np.stack([mae_item_np(rng, clips[j], 48) for j in order[:4]])
    assert b.shape == (4, 48, 64)
    assert np.array_equal(b, manual)
    # val batches likewise unmasked: first val batch == plain crop-or-pad
    sv = MultiCorpusSampler([corp], 2, "mae", seed=9)
    _, vb = next(iter(sv.val_batches()))
    rv = np.random.default_rng(0)
    expect = np.stack([mae_item_np(rv, x, 48) for x in clips[:2]])
    assert np.array_equal(vb, expect)
