"""Cross-task flow: fine-tuned checkpoint -> feature extraction -> LP
(the cross_ft_lp_eval.sh pipeline) with our msgpack checkpoints."""

import os

import numpy as np
import pytest

from heart_murmur_detection_tpu.extract.extract import FeatureExtractor
from heart_murmur_detection_tpu.extract.registry import _adapt_msgpack_ckpt
from heart_murmur_detection_tpu.train.checkpoints import save_params
from heart_murmur_detection_tpu.utils.audio_io import write_wav


class TestMsgpackCkptAdapter:
    def test_ft_tree_maps_to_encoder(self, tmp_path):
        tree = {
            "params": {"encoder": {"w": np.ones(3)}, "head": {"fc": {"b": np.zeros(2)}}},
            "batch_stats": {"encoder": {"m": np.zeros(1)}},
        }
        p = save_params(str(tmp_path / "ft.msgpack"), tree)
        out = _adapt_msgpack_ckpt(p)
        assert "head" not in out["params"]
        assert (out["params"]["encoder"]["w"] == 1).all()
        assert "m" in out["batch_stats"]["encoder"]

    def test_cp_tree_passthrough(self, tmp_path):
        tree = {"params": {"encoder": {"w": np.ones(3)}, "g": {"k": np.zeros(2)}}}
        p = save_params(str(tmp_path / "cp.msgpack"), tree)
        out = _adapt_msgpack_ckpt(p)
        assert "g" in out["params"]


class TestCrossFTExtraction:
    def test_extract_with_own_cp_ckpt(self, tmp_path):
        """A CP-style msgpack checkpoint loads into the extractor and changes
        features vs random init."""
        import jax

        from heart_murmur_detection_tpu.extract import registry

        # random-init cola variables, then perturb and save as a 'CP ckpt'
        model, v0 = registry.initialize_pretrained_model("operaCT", random_init=True)
        v1 = jax.tree.map(lambda x: x * 1.05 if x.dtype == np.float32 else x, v0)
        ck = save_params(str(tmp_path / "cp.msgpack"), v1)

        wavs = []
        r = np.random.default_rng(0)
        for i in range(2):
            p = str(tmp_path / f"c{i}.wav")
            write_wav(p, 0.2 * r.standard_normal(4 * 16000).astype(np.float32), 16000)
            wavs.append(p)

        ex0 = FeatureExtractor("operaCT", dim=768, random_init=True, batch_size=2, pad0=True)
        ex1 = FeatureExtractor("operaCT", dim=768, ckpt_path=ck, batch_size=2, pad0=True)
        f0 = ex0.extract_files(wavs)
        f1 = ex1.extract_files(wavs)
        assert f0.shape == f1.shape == (2, 768)
        assert not np.allclose(f0, f1)
