"""CP auto-resume: kill-and-restart continues from the last checkpoint."""

import numpy as np

from heart_murmur_detection_tpu.pretrain.cola_training import train_multiple_data
from tests.test_pretrain import TINY_HTSAT, synth_corpus


class TestResume:
    def test_resume_continues_epochs(self, tmp_path):
        c = synth_corpus("a", 16, 40, 90, 16, 32)
        common = dict(
            data_source={"a": 32},
            encoder="htsat",
            htsat_config=TINY_HTSAT,
            batch_size=4,
            corpora=[c],
            ckpt_root=str(tmp_path / "cks"),
            log_dir=str(tmp_path / "logs"),
            verbose=False,
        )
        # run 6 epochs (resume ckpt saved at epoch 4)
        _, h1, _ = train_multiple_data("rz", n_epoches=6, **common)
        assert len(h1) == 6
        # "crash" and resume to 8: only epochs 5..7 run
        _, h2, _ = train_multiple_data("rz", n_epoches=8, resume=True, **common)
        assert [h["epoch"] for h in h2] == [5, 6, 7]

    def test_resume_noop_without_ckpt(self, tmp_path):
        c = synth_corpus("a", 12, 40, 90, 16, 32)
        _, h, _ = train_multiple_data(
            "rz2",
            data_source={"a": 32},
            encoder="htsat",
            htsat_config=TINY_HTSAT,
            n_epoches=2,
            batch_size=4,
            corpora=[c],
            ckpt_root=str(tmp_path / "cks"),
            log_dir=str(tmp_path / "logs"),
            verbose=False,
            resume=True,
        )
        assert [x["epoch"] for x in h] == [0, 1]
