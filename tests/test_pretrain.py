"""Continued-pretraining loops on synthetic in-memory corpora (tiny models)."""

import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.vit_mae import MAEConfig
from heart_murmur_detection_tpu.pretrain.cola_training import train_multiple_data
from heart_murmur_detection_tpu.pretrain.data import Corpus, MultiCorpusSampler
from heart_murmur_detection_tpu.pretrain.mae_training import mae_train_multiple_data

TINY_HTSAT = HTSATConfig(
    spec_size=64,
    patch_size=4,
    embed_dim=16,
    depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2),
    window_size=2,
    mel_bins=16,
    num_classes=8,
    enable_tscam=False,
)

TINY_MAE = MAEConfig(
    img_size=(32, 16),
    patch_size=4,
    embed_dim=32,
    depth=2,
    num_heads=2,
    decoder_embed_dim=16,
    decoder_depth=2,
    decoder_num_heads=2,
    decoder_window=(2, 2),
    decoder_shift=(1, 0),
)


def synth_corpus(name, n, tmin, tmax, n_mels, max_len, seed=0):
    r = np.random.default_rng(seed)
    clips = [
        r.random((int(t), n_mels)).astype(np.float32)
        for t in r.integers(tmin, tmax, n)
    ]
    k = max(1, n // 10)
    return Corpus(name, clips[k:], clips[:k], max_len)


class TestSampler:
    def test_weights_and_epoch_length(self):
        c1 = synth_corpus("a", 40, 60, 100, 16, 32)
        c2 = synth_corpus("b", 12, 60, 100, 16, 32, seed=1)
        s = MultiCorpusSampler([c1, c2], batch_size=4, method="cola", seed=0)
        assert s.steps_per_epoch == max(s.n_batches)
        assert abs(sum(s.weights) - 1.0) < 1e-9
        assert s.weights[0] > s.weights[1]
        idx, (x1, x2) = s.next_batch()
        assert x1.shape == (4, 32, 16) and x2.shape == (4, 32, 16)

    def test_mae_items_padded(self):
        c = synth_corpus("a", 10, 10, 20, 16, 32)
        s = MultiCorpusSampler([c], batch_size=2, method="mae", seed=0)
        _, x = s.next_batch()
        assert x.shape == (2, 32, 16)


class TestColaCP:
    def test_two_epochs_train_and_ckpt(self, tmp_path):
        c1 = synth_corpus("a", 24, 40, 90, 16, 32)
        c2 = synth_corpus("b", 10, 40, 90, 16, 32, seed=1)
        variables, history, best = train_multiple_data(
            "tiny-test",
            data_source={"a": 32, "b": 32},
            encoder="htsat",
            htsat_config=TINY_HTSAT,
            n_epoches=2,
            batch_size=4,
            corpora=[c1, c2],
            ckpt_root=str(tmp_path / "cks"),
            log_dir=str(tmp_path / "logs"),
            verbose=False,
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["valid_loss"])
        # top-k ckpt saved only every 10 epochs -> none yet
        assert best is None
        # per-corpus train{s}_loss columns (models_cola.py:327-329 naming)
        import csv
        import os

        csv_path = os.path.join(
            str(tmp_path / "logs"), "combined", "tiny-test", "metrics.csv"
        )
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert "train0_loss" in rows[0] and "train1_loss" in rows[0]
        vals = [float(r["train0_loss"]) for r in rows] + [
            float(r["train1_loss"]) for r in rows
        ]
        assert any(np.isfinite(v) for v in vals)

    def test_ckpt_written_every_10(self, tmp_path):
        c1 = synth_corpus("a", 12, 40, 90, 16, 32)
        _, history, best = train_multiple_data(
            "tiny-test2",
            data_source={"a": 32},
            encoder="htsat",
            htsat_config=TINY_HTSAT,
            n_epoches=10,
            batch_size=4,
            corpora=[c1],
            ckpt_root=str(tmp_path / "cks"),
            log_dir=str(tmp_path / "logs"),
            verbose=False,
        )
        assert best is not None and best.endswith(".msgpack")
        import os

        assert os.path.exists(best)
        assert "valid_loss=" in best and "epoch=09" in best


class TestMaeCP:
    def test_one_epoch(self, tmp_path):
        c = synth_corpus("a", 60, 20, 40, 16, 32)
        variables, history, _ = mae_train_multiple_data(
            "tiny-mae",
            data_source={"a": 32},
            n_epoches=2,
            batch_size=4,
            corpora=[c],
            config_override=TINY_MAE,
            ckpt_root=str(tmp_path / "cks"),
            log_dir=str(tmp_path / "logs"),
            verbose=False,
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["valid_loss"])
        assert history[-1]["train_loss"] > 0.0
        # per-corpus columns mirror the COLA CP logger
        import csv
        import os

        csv_path = os.path.join(
            str(tmp_path / "logs"), "combined", "tiny-mae", "metrics.csv"
        )
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert "train0_loss" in rows[0]
        assert np.isfinite(float(rows[-1]["train0_loss"]))

    def test_one_epoch_mixed_precision(self, tmp_path):
        """compute_dtype=bf16 composes with config_override: bf16 encoder
        ViT blocks, finite losses."""
        import jax.numpy as jnp

        c = synth_corpus("a", 60, 20, 40, 16, 32)
        _, history, _ = mae_train_multiple_data(
            "tiny-mae16",
            data_source={"a": 32},
            n_epoches=1,
            batch_size=4,
            corpora=[c],
            config_override=TINY_MAE,
            compute_dtype=jnp.bfloat16,
            ckpt_root=str(tmp_path / "cks16"),
            log_dir=str(tmp_path / "logs16"),
            verbose=False,
        )
        assert np.isfinite(history[-1]["valid_loss"])
        assert history[-1]["train_loss"] > 0.0


def test_sampler_small_corpus_drop_last_does_not_hang():
    """mae method uses drop_last=True; a corpus smaller than the batch size
    must still yield full batches (regression: _cycle spun forever)."""
    c = synth_corpus("tiny", 3, 20, 40, 16, 32)
    s = MultiCorpusSampler([c], batch_size=8, method="mae", seed=0)
    idx, x = s.next_batch()
    assert x.shape == (8, 32, 16)
