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


class TestOrbaxResume:
    def test_save_restore_latest(self, tmp_path):
        import numpy as np
        import optax

        from heart_murmur_detection_tpu.train.checkpoints import (
            OrbaxResumeCheckpointer,
        )

        params = {"w": np.ones((3, 2), np.float32) * 7}
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        ck = OrbaxResumeCheckpointer(str(tmp_path), every_n_epochs=1, max_to_keep=2)
        ck.save(4, {"params": params}, opt, extra={"note": "x"})
        ck.save(9, {"params": {"w": params["w"] * 2}}, opt, extra={"note": "y"})
        ep, variables, opt2, extra = ck.restore(opt_state_target=tx.init(params))
        assert ep == 9
        assert float(np.asarray(variables["params"]["w"])[0, 0]) == 14.0
        assert extra == {"note": "y"}
        assert type(opt2) is type(opt)

    def test_restore_empty_returns_none(self, tmp_path):
        from heart_murmur_detection_tpu.train.checkpoints import (
            OrbaxResumeCheckpointer,
        )

        ck = OrbaxResumeCheckpointer(str(tmp_path))
        assert ck.restore() is None


class TestTopKCadence:
    def test_every_n_epochs_composes_with_caller_gate(self, tmp_path):
        """step() gates on its own cadence: a caller that itself only calls on
        eval epochs gets saves on epochs divisible by BOTH (docstring)."""
        from heart_murmur_detection_tpu.train.checkpoints import TopKCheckpointer

        ck = TopKCheckpointer(
            dirpath=str(tmp_path),
            filename_fmt="e{epoch:02d}-{valid_loss:.2f}.msgpack",
            every_n_epochs=4,
            save_top_k=10,
        )
        eval_every = 2
        saved = []
        for epoch in range(12):
            if (epoch + 1) % eval_every == 0:  # caller-side eval gate
                p = ck.step(epoch, 1.0 - epoch * 0.01, {"w": [float(epoch)]})
                if p:
                    saved.append(epoch)
        assert saved == [3, 7, 11]  # (epoch+1) % lcm(2,4) == 0
