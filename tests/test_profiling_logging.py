"""Aux subsystems: profiling hooks, CSV logger, run names."""

import os

import numpy as np

from heart_murmur_detection_tpu.analysis.logs import plot_log, read_csv_log
from heart_murmur_detection_tpu.utils.logging import CSVLogger, WandbLogger, get_run_name
from heart_murmur_detection_tpu.utils.profiling import annotate, step_timer, trace


class TestProfiling:
    def test_trace_disabled_noop(self):
        with trace("x", enabled=False):
            pass

    def test_trace_writes(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with trace("unit", out_dir=str(tmp_path), enabled=True):
            np.asarray(jax.jit(lambda x: x * 2)(jnp.ones(4)))
        assert os.path.isdir(tmp_path / "unit")

    def test_step_timer(self):
        t = step_timer()
        for _ in range(3):
            with t:
                pass
        assert t.count == 3 and t.total >= 0

    def test_annotate(self):
        with annotate("section"):
            pass


class TestLogging:
    def test_csv_logger_roundtrip(self, tmp_path):
        lg = CSVLogger(str(tmp_path), "run")
        lg.log(epoch=0, loss=1.5)
        lg.log(epoch=1, loss=1.2)
        cols = read_csv_log(lg.path)
        assert cols["loss"] == [1.5, 1.2]
        fig = plot_log(lg.path, metrics=("loss",), out_path=str(tmp_path / "p.png"))
        assert os.path.exists(tmp_path / "p.png")

    def test_wandb_gated_noop(self, monkeypatch):
        monkeypatch.delenv("WANDB_API_KEY", raising=False)
        monkeypatch.delenv("WANDB_MODE", raising=False)
        w = WandbLogger("proj", "run")
        w.log({"a": 1})
        w.finish()

    def test_run_name(self):
        assert "title" in get_run_name("title")
