"""Analysis tools + checkpoint re-evaluation (incl. cross-task routing)."""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.analysis import rank, significance
from heart_murmur_detection_tpu.analysis.masked_spec import reconstruct
from heart_murmur_detection_tpu.analysis.saliency import compute_saliency_map
from heart_murmur_detection_tpu.train import eval_ckpts
from heart_murmur_detection_tpu.train.checkpoints import (
    TopKCheckpointer,
    find_best_ckpt,
    save_params,
)


class TestRank:
    def test_mrr_matches_published_ordering(self):
        mrr = rank.print_mrr()
        # OPERA-CT has the best MRR in the published matrix
        assert max(mrr, key=mrr.get) == "OPERA-CT"
        assert abs(sum(1 for v in mrr.values()) - 7) == 0


class TestSignificance:
    def test_clearly_different(self):
        t, p, reject = significance.test_2models(
            [0.9, 0.91, 0.89, 0.9, 0.92], [0.5, 0.52, 0.51, 0.49, 0.5], alpha=0.01
        )
        assert reject and p < 1e-6

    def test_same_distribution(self):
        r = np.random.default_rng(0)
        a = 0.7 + 0.01 * r.standard_normal(5)
        b = 0.7 + 0.01 * r.standard_normal(5)
        _, p, reject = significance.test_2models(a, b, alpha=0.01)
        assert not reject


class TestSaliency:
    def test_gradient_saliency_shape(self):
        import jax.numpy as jnp

        W = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)

        def apply_fn(x):  # mean-pool "encoder" + linear head
            return x.mean(axis=1) @ jnp.asarray(W)

        mel = np.random.default_rng(1).random((2, 32, 64)).astype(np.float32)
        sal, cls = compute_saliency_map(apply_fn, mel)
        assert sal.shape == mel.shape
        assert (sal >= 0).all()
        assert cls.shape == (2,)


class TestMaskedSpecViz:
    def test_reconstruct_shapes(self):
        import jax
        import jax.numpy as jnp

        from heart_murmur_detection_tpu.models.vit_mae import (
            MaskedAutoencoderViT,
        )
        from tests.test_pretrain import TINY_MAE

        model = MaskedAutoencoderViT(TINY_MAE)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + TINY_MAE.img_size),
        )
        mel = np.random.default_rng(0).random(TINY_MAE.img_size).astype(np.float32)
        orig, masked, recon, loss = reconstruct(model, v, mel)
        assert orig.shape == masked.shape == recon.shape == TINY_MAE.img_size
        assert np.isfinite(loss)


class TestEvalCkpts:
    def test_linear_head_reeval(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        # synth feature dir + train one LP run with ckpt saving
        from heart_murmur_detection_tpu.train.linear_eval import linear_evaluation_heart

        os.makedirs("feature/pascal_A_eval")
        r = np.random.default_rng(0)
        n = 60
        y = r.integers(0, 2, n)
        x = (r.standard_normal((n, 8)) + y[:, None]).astype(np.float32)
        splits = np.array(["train"] * 40 + ["val"] * 10 + ["test"] * 10)
        np.save("feature/pascal_A_eval/labels.npy", y)
        np.save("feature/pascal_A_eval/train_test_split.npy", splits)
        np.save("feature/pascal_A_eval/operaCT768_feature.npy", x)

        res = linear_evaluation_heart(
            seed=0,
            use_feature="operaCT768",
            dataset_name="pascal",
            task="A",
            feature_dir="feature/pascal_A_eval/",
            labels_filename="labels.npy",
            epochs=4,
            save_ckpt_dir="cks/linear/pascal_A/",
        )
        out = eval_ckpts.evaluate_linear_head(
            seed=0,
            use_feature="operaCT768",
            dataset_name="pascal",
            task="A",
            feature_dir="feature/pascal_A_eval/",
            labels_filename="labels.npy",
            epochs=4,
        )
        assert out["test_auc"] == pytest.approx(res.test_auc, abs=1e-6)


class TestEvalCkptsCLI:
    def test_head_only_cli(self, tmp_path, monkeypatch, capsys):
        """cli.eval_ckpts end-to-end: config resolve -> task routing ->
        saved-head re-eval (eval_ckpts.py main:499-516)."""
        monkeypatch.chdir(tmp_path)
        from heart_murmur_detection_tpu.cli import eval_ckpts as cli
        from heart_murmur_detection_tpu.train.linear_eval import linear_evaluation_heart

        os.makedirs("feature/pascal_A_eval")
        r = np.random.default_rng(0)
        n = 60
        y = r.integers(0, 2, n)
        x = (r.standard_normal((n, 8)) + y[:, None]).astype(np.float32)
        splits = np.array(["train"] * 40 + ["val"] * 10 + ["test"] * 10)
        np.save("feature/pascal_A_eval/labels.npy", y)
        np.save("feature/pascal_A_eval/train_test_split.npy", splits)
        np.save("feature/pascal_A_eval/operaCT768_feature.npy", x)
        linear_evaluation_heart(
            seed=0,
            use_feature="operaCT768",
            dataset_name="pascal",
            task="A",
            feature_dir="feature/pascal_A_eval/",
            labels_filename="labels.npy",
            save_ckpt_dir="cks/linear/pascal_A/",
        )
        cli.main(
            [
                "task=pascal_A",
                "pretrain=operaCT768",
                "head_only=True",
                "n_run=1",
            ]
        )
        out = capsys.readouterr().out
        assert "auc mean" in out and "test_auc" in out

    def test_cross_task_split(self):
        from heart_murmur_detection_tpu.cli.eval_ckpts import _split_finetuned

        assert _split_finetuned("pascal_A") == ("pascal", "A")
        assert _split_finetuned("physionet16") == ("physionet16", "")
        assert _split_finetuned("zchsound_clean_murmurs") == (
            "zchsound_clean",
            "murmurs",
        )


class TestTopKCheckpointer:
    def test_keeps_best_k(self, tmp_path):
        ck = TopKCheckpointer(
            str(tmp_path), "m-epoch={epoch:02d}--{valid_loss:.4f}.msgpack",
            monitor="valid_loss", mode="min", save_top_k=2, every_n_epochs=1,
        )
        for e, v in enumerate([5.0, 3.0, 4.0, 1.0]):
            ck.step(e, v, {"w": np.zeros(2)})
        kept = sorted(os.listdir(tmp_path))
        assert len(kept) == 2
        assert ck.best_path.endswith("1.0000.msgpack")

    def test_find_best_ckpt(self, tmp_path):
        for v in (0.5, 0.9, 0.7):
            save_params(str(tmp_path / f"a-valid_auc={v:.2f}.msgpack"), {"x": np.zeros(1)})
        best = find_best_ckpt(str(tmp_path), "a-*", metric="valid_auc", mode="max")
        assert best.endswith("0.90.msgpack")


class TestBalanceAndPlots:
    def test_downsample_balanced(self):
        from heart_murmur_detection_tpu.utils.balance import (
            downsample_balanced_dataset,
        )

        x = np.arange(40).reshape(20, 2)
        y = np.array([0] * 12 + [1] * 5 + [2] * 3)
        xd, yd = downsample_balanced_dataset(x, y, seed=0)
        assert (np.bincount(yd) == [3, 3, 3]).all()
        # rows stay aligned with their labels
        for xi, yi in zip(xd, yd):
            assert y[xi[0] // 2] == yi

    def test_plot_melspectrogram(self, tmp_path):
        from heart_murmur_detection_tpu.analysis.embeddings import (
            plot_melspectrogram,
        )

        wav = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
        p = plot_melspectrogram(wav, title="sine", out_dir=str(tmp_path))
        assert os.path.exists(p)


class TestPerClassLabels:
    def test_expand_with_mapping(self, tmp_path, monkeypatch):
        import json

        from heart_murmur_detection_tpu.train.metrics import expand_per_class

        monkeypatch.chdir(tmp_path)
        os.makedirs("feature/pascal_A_eval")
        with open("feature/pascal_A_eval/int_to_label.json", "w") as f:
            json.dump({"0": "normal", "1": "murmur"}, f)
        out = expand_per_class(
            {"unweighted_recall": np.array([0.9, 0.4]), "macro_F1": 0.6},
            "pascal",
            "A",
        )
        assert out == {
            "unweighted_recall_normal": pytest.approx(0.9),
            "unweighted_recall_murmur": pytest.approx(0.4),
            "macro_F1": pytest.approx(0.6),
        }

    def test_expand_without_mapping_falls_back_to_index(self):
        from heart_murmur_detection_tpu.train.metrics import expand_per_class

        out = expand_per_class({"r": np.array([0.1, 0.2])}, "nosuchds", "x")
        assert set(out) == {"r_0", "r_1"}
