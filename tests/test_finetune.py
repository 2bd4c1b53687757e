"""Fine-tuning harness on tiny synthetic data (full feature-dir driver)."""

import json
import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.train.finetune import finetune_classifier

TINY_HTSAT = HTSATConfig(
    spec_size=64,
    patch_size=4,
    embed_dim=16,
    depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2),
    window_size=2,
    mel_bins=16,
    enable_tscam=False,
    drop_path_rate=0.1,
)


def synth_clf_data(n, t, f, seed=0):
    r = np.random.default_rng(seed)
    y = r.integers(0, 2, n).astype(np.int32)
    x = r.random((n, t, f)).astype(np.float32)
    x += 0.8 * y[:, None, None]  # separable
    return x, y


class TestFinetuneClassifier:
    def test_htsat_ft_learns(self):
        x, y = synth_clf_data(48, 32, 16)
        res = finetune_classifier(
            x[:32], y[:32], x[32:40], y[32:40], x[40:], y[40:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            lr=1e-3,
            epochs=4,
            batch_size=8,
            seed=0,
        )
        assert np.isfinite(res.test_auc)
        assert res.test_auc > 0.7
        assert res.best_epoch >= 0

    def test_htsat_ft_mixed_precision_learns(self):
        """compute_dtype=bf16 fine-tune trains end-to-end (bf16 encoder
        matmuls, f32 norms/softmax/residuals) and still separates the
        synthetic classes."""
        import jax.numpy as jnp

        x, y = synth_clf_data(48, 32, 16)
        res = finetune_classifier(
            x[:32], y[:32], x[32:40], y[32:40], x[40:], y[40:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            lr=1e-3,
            epochs=4,
            batch_size=8,
            seed=0,
            compute_dtype=jnp.bfloat16,
        )
        assert np.isfinite(res.test_auc)
        assert res.test_auc > 0.7

    def test_freeze_all_keeps_encoder(self):
        x, y = synth_clf_data(24, 32, 16, seed=1)
        res = finetune_classifier(
            x[:16], y[:16], x[16:20], y[16:20], x[20:], y[20:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            epochs=2,
            batch_size=8,
            freeze_encoder="all",
            seed=0,
        )
        # encoder unchanged vs a fresh init with same seed
        import jax
        from heart_murmur_detection_tpu.train.finetune import EncoderClassifier
        import jax.numpy as jnp

        model = EncoderClassifier(
            encoder_kind="htsat", classes=2, feat_dim=128, htsat_config=TINY_HTSAT
        )
        v0 = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 16)),
        )
        a = jax.tree.leaves(jax.device_get(v0["params"]["encoder"]))
        b = jax.tree.leaves(res.variables["params"]["encoder"])
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_spec_augment_path(self):
        x, y = synth_clf_data(24, 32, 16, seed=2)
        res = finetune_classifier(
            x[:16], y[:16], x[16:20], y[16:20], x[20:], y[20:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            epochs=2,
            batch_size=8,
            spec_augment=True,
            time_drop_width=4,
            freq_drop_width=2,
            seed=0,
        )
        assert np.isfinite(res.valid_auc)

    def test_early_stopping_stops(self):
        x, y = synth_clf_data(24, 32, 16, seed=3)
        res = finetune_classifier(
            x[:16], y[:16], x[16:20], y[16:20], x[20:], y[20:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            epochs=64,
            batch_size=8,
            patience=3,
            seed=0,
        )
        assert res.stopped_epoch < 63


class TestFusedTrainPath:
    def test_htsat_ft_fused_train_learns(self):
        """fused_train=True routes the encoder fwd+bwd through the custom-VJP
        Pallas train kernels (interpret mode off-TPU) and still learns."""
        x, y = synth_clf_data(48, 32, 16)
        res = finetune_classifier(
            x[:32], y[:32], x[32:40], y[32:40], x[40:], y[40:],
            encoder_kind="htsat",
            htsat_config=TINY_HTSAT,
            n_cls=2,
            feat_dim=128,
            lr=1e-3,
            epochs=3,
            batch_size=8,
            seed=0,
            fused_train=True,
        )
        assert np.isfinite(res.test_auc)
        assert res.test_auc > 0.7

    def test_cola_cp_fused_train_runs(self):
        from heart_murmur_detection_tpu.pretrain.cola_training import (
            train_multiple_data,
        )
        from heart_murmur_detection_tpu.pretrain.data import Corpus

        r = np.random.default_rng(0)
        clips = [r.random((40, 16)).astype(np.float32) for _ in range(12)]
        corpus = Corpus("t", clips[4:], clips[:4], max_len=32)
        _, hist, _ = train_multiple_data(
            "fused-cp",
            data_source={"t": 32},
            encoder="htsat",
            htsat_config=TINY_HTSAT,
            n_epoches=1,
            batch_size=4,
            corpora=[corpus],
            ckpt_root="/tmp/hmdt_fused_cp/cks",
            log_dir="/tmp/hmdt_fused_cp/logs",
            verbose=False,
            fused_train=True,
        )
        assert np.isfinite(hist[-1]["train_loss"])
        assert np.isfinite(hist[-1]["valid_loss"])
