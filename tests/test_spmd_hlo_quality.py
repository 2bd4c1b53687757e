"""SPMD partition quality of the sharded train steps.

The ZeRO-3 (param_sharding='fsdp') COLA CP step used to compile with 24
"Involuntary full rematerialization" SPMD-partitioner warnings — GSPMD
propagated the at-rest param shardings into the swin attention softmax and
fell back to replicate-then-reshard on its stats. The fix is the
gather-at-use constraint in the train steps (params constrained to
replicated inside loss_fn: one all-gather per weight on entry, a
reduce-scatter on its gradient). This test runs the production ZeRO-3 path
on the 8-device virtual CPU mesh with the XLA compilation cache disabled and
asserts the partitioner emits no involuntary-remat warnings (captured at the
fd level — the warnings come from C++ logging, not Python).

Matches the efficient-GSPMD promise of SURVEY §2.10.
"""

import os
import tempfile

import jax
import numpy as np
import pytest


@pytest.fixture
def fd2_capture():
    """Capture OS-level stderr (fd 2) — XLA C++ warnings bypass sys.stderr."""
    captured = {}

    class _Cap:
        def __enter__(self):
            self.saved = os.dup(2)
            self.tmp = tempfile.TemporaryFile(mode="w+b")
            os.dup2(self.tmp.fileno(), 2)
            return self

        def __exit__(self, *exc):
            os.dup2(self.saved, 2)
            os.close(self.saved)
            self.tmp.seek(0)
            captured["text"] = self.tmp.read().decode(errors="replace")
            self.tmp.close()
            return False

    return _Cap, captured


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_zero3_cola_step_has_no_involuntary_remat(tmp_path, fd2_capture):
    from heart_murmur_detection_tpu.models.htsat import HTSATConfig
    from heart_murmur_detection_tpu.parallel.mesh import data_parallel_mesh
    from heart_murmur_detection_tpu.pretrain.cola_training import train_multiple_data
    from heart_murmur_detection_tpu.pretrain.data import Corpus

    Cap, captured = fd2_capture
    mesh = data_parallel_mesh(8)
    tiny = HTSATConfig(
        spec_size=64, patch_size=4, embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=2, mel_bins=16, enable_tscam=False,
    )
    r = np.random.default_rng(0)
    clips = [r.random((40, 16)).astype(np.float32) for _ in range(24)]
    corpus = Corpus("hloq", clips[8:], clips[:8], max_len=32)

    # a cache hit would skip the partitioner (and its warnings) entirely
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        with Cap():
            _, history, _ = train_multiple_data(
                "hloq",
                data_source={"hloq": 32},
                encoder="htsat",
                htsat_config=tiny,
                n_epoches=1,
                batch_size=8,
                corpora=[corpus],
                mesh=mesh,
                param_sharding="fsdp",
                ckpt_root=str(tmp_path / "cks"),
                log_dir=str(tmp_path / "logs"),
                verbose=False,
            )
    finally:
        jax.config.update("jax_enable_compilation_cache", True)

    assert np.isfinite(history[-1]["train_loss"])
    text = captured["text"]
    assert "Involuntary full rematerialization" not in text, text[-2000:]
