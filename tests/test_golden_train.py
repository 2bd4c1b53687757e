"""Golden training trajectories: the production CP loops (COLA + MAE) and
the FT driver on fixed synthetic corpora with pinned seeds must keep
reproducing recorded per-epoch losses — the training-side analog of
tests/test_golden_extract.py. A silent regression anywhere in the step
construction (pretrain/steps.py, cola_training's inline step, optimizer
wiring, sampler order, bn threading) fails here; the fused train kernels are
tied to these trajectories by their parity suites
(tests/test_htsat_train_fused.py, tests/test_mae_train_fused.py).

Pinned values recorded 2026-08-20 on the CPU backend (the suite's backend;
deterministic up to float accumulation — tolerance 1e-3 relative).
Matches the reference's golden-log QC (cks/logs/Test_Task10_results.log,
SURVEY §4).
"""

import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.pretrain.data import Corpus

TINY_HTSAT = dict(
    spec_size=64, patch_size=4, embed_dim=16, depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2), window_size=2, mel_bins=16, enable_tscam=False,
)


def _corpus(rng, name="golden"):
    clips = [rng.random((40, 16)).astype(np.float32) for _ in range(24)]
    return Corpus(name, clips[8:], clips[:8], max_len=32)


def test_golden_cola_cp_trajectory(tmp_path):
    from heart_murmur_detection_tpu.pretrain.cola_training import train_multiple_data

    r = np.random.default_rng(0)
    _, hist, _ = train_multiple_data(
        "golden",
        data_source={"golden": 32},
        encoder="htsat",
        htsat_config=HTSATConfig(**TINY_HTSAT),
        n_epoches=3,
        batch_size=8,
        corpora=[_corpus(r)],
        ckpt_root=str(tmp_path / "cks"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    got = [float(h["train_loss"]) for h in hist]
    got_v = [float(h["valid_loss"]) for h in hist]
    np.testing.assert_allclose(got, [13.65158, 11.143868, 18.065007], rtol=1e-3)
    np.testing.assert_allclose(got_v, [3.366959, 3.93592, 5.318229], rtol=1e-3)


def test_golden_mae_cp_trajectory(tmp_path):
    from heart_murmur_detection_tpu.models.vit_mae import MAEConfig
    from heart_murmur_detection_tpu.pretrain.mae_training import (
        mae_train_multiple_data,
    )

    mcfg = MAEConfig(
        img_size=(32, 16), patch_size=4, embed_dim=32, depth=2, num_heads=2,
        decoder_embed_dim=16, decoder_depth=2, decoder_num_heads=2,
        mask_ratio=0.5, decoder_window=(2, 2), decoder_shift=(1, 0),
    )
    # same rng stream position as the recording script: COLA corpus drawn first
    r = np.random.default_rng(0)
    _ = _corpus(r)
    _, hist, _ = mae_train_multiple_data(
        "golden",
        data_source={"golden": 32},
        n_epoches=3,
        batch_size=8,
        corpora=[_corpus(r)],
        config_override=mcfg,
        ckpt_root=str(tmp_path / "cks"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    got = [float(h["train_loss"]) for h in hist]
    got_v = [float(h["valid_loss"]) for h in hist]
    np.testing.assert_allclose(got, [1.412518, 1.363379, 1.232708], rtol=1e-3)
    np.testing.assert_allclose(got_v, [1.330275, 1.273515, 1.243924], rtol=1e-3)


def test_golden_ft_epoch(tmp_path):
    from heart_murmur_detection_tpu.train.finetune import finetune_classifier

    rng = np.random.default_rng(1)
    n, T, F = 32, 64, 16
    X = rng.standard_normal((n, T, F)).astype(np.float32)
    y = (np.arange(n) % 2).astype(np.int64)
    X[y == 1] += 0.15  # weak shift: non-saturated AUCs pin the trajectory
    res = finetune_classifier(
        X[:20], y[:20], X[20:26], y[20:26], X[26:], y[26:],
        encoder_kind="htsat",
        htsat_config=HTSATConfig(**TINY_HTSAT),
        feat_dim=128,
        epochs=3,
        batch_size=8,
        seed=0,
        patience=10,
    )
    assert res.best_epoch == GOLDEN_FT[2]
    np.testing.assert_allclose(
        [res.valid_auc, res.test_auc], GOLDEN_FT[:2], atol=1e-6
    )


# (valid_auc, test_auc, best_epoch) — filled from the recording run
GOLDEN_FT = (0.777778, 0.888889, 2)
