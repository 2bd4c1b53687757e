"""Multi-device numerics on the conftest 8-device virtual CPU mesh.

The reference is strictly single-GPU (SURVEY §2.10); data parallelism over an
ICI mesh is this framework's new capability, so every assertion here is
sharded-vs-unsharded EQUIVALENCE, not liveness: the GSPMD-partitioned graph
must produce the same numbers as the single-device graph.
"""

import jax
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.parallel.mesh import (
    data_parallel_mesh,
    put_replicated,
    replicate_sharding,
    shard_batch,
)
from heart_murmur_detection_tpu.pretrain.cola_training import train_multiple_data
from heart_murmur_detection_tpu.pretrain.data import Corpus, MultiCorpusSampler

TINY = HTSATConfig(
    spec_size=64,
    patch_size=4,
    embed_dim=16,
    depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2),
    window_size=2,
    mel_bins=16,
    enable_tscam=False,
)


def _tiny_corpus(n_train=16, n_val=8, seed=0):
    r = np.random.default_rng(seed)
    return Corpus(
        "t",
        [r.random((40, 16)).astype(np.float32) for _ in range(n_train)],
        [r.random((40, 16)).astype(np.float32) for _ in range(n_val)],
        max_len=32,
    )


def _run_cp(mesh, tmp_path, tag):
    variables, history, _ = train_multiple_data(
        f"dp-{tag}",
        data_source={"t": 32},
        encoder="htsat",
        htsat_config=TINY,
        n_epoches=2,
        batch_size=8,
        corpora=[_tiny_corpus()],
        mesh=mesh,
        ckpt_root=str(tmp_path / f"cks-{tag}"),
        log_dir=str(tmp_path / f"logs-{tag}"),
        verbose=False,
    )
    return variables, history


def test_dp_cola_step_matches_single_device(tmp_path):
    """2 epochs of COLA CP, 8-way data parallel vs single device: identical
    host-side sampling (same seed) -> params and losses must agree to float
    tolerance (the grad psum is a deterministic sum re-association)."""
    mesh = data_parallel_mesh(8)
    v_dp, h_dp = _run_cp(mesh, tmp_path, "mesh")
    # single-device run must see the SAME batches: force drop_last semantics
    # by using batch-divisible corpus sizes (16 % 8 == 0), same seeds
    v_sd, h_sd = _run_cp(None, tmp_path, "single")

    assert np.isfinite(h_dp[-1]["train_loss"])
    np.testing.assert_allclose(
        h_dp[-1]["train_loss"], h_sd[-1]["train_loss"], rtol=2e-4
    )
    np.testing.assert_allclose(
        h_dp[-1]["valid_loss"], h_sd[-1]["valid_loss"], rtol=2e-4
    )
    # Param tolerance is looser than the loss tolerance on purpose: Adam
    # rescales gradients by 1/sqrt(v), so for leaves whose gradients are
    # float-noise-scale the psum re-association flips update signs and the
    # trajectories drift by O(lr) per step. Structural sharding errors
    # (missing reduction / partial batch) are caught by the valid_loss
    # assertions above, which compare final params on identical val batches.
    flat_dp = jax.tree.leaves(jax.device_get(v_dp["params"]))
    flat_sd = jax.tree.leaves(jax.device_get(v_sd["params"]))
    for a, b in zip(flat_dp, flat_sd):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


def test_dp_mixed_precision_cp_step(tmp_path):
    """bf16 mixed-precision CP composes with the 8-way data-parallel mesh:
    the GSPMD-sharded bf16 step runs and its losses track the single-device
    bf16 run (same seeds/batches)."""
    import dataclasses

    import jax.numpy as jnp

    tiny16 = dataclasses.replace(TINY, compute_dtype=jnp.bfloat16)

    def run(mesh, tag):
        variables, history, _ = train_multiple_data(
            f"dp16-{tag}",
            data_source={"t": 32},
            encoder="htsat",
            htsat_config=tiny16,
            n_epoches=1,
            batch_size=8,
            corpora=[_tiny_corpus()],
            mesh=mesh,
            ckpt_root=str(tmp_path / f"cks16-{tag}"),
            log_dir=str(tmp_path / f"logs16-{tag}"),
            verbose=False,
        )
        return history

    h_dp = run(data_parallel_mesh(8), "mesh")
    h_sd = run(None, "single")
    assert np.isfinite(h_dp[-1]["train_loss"])
    # bf16 forward: psum re-association noise is amplified by the coarser
    # mantissa, so the tolerance is looser than the f32 DP test's
    np.testing.assert_allclose(
        h_dp[-1]["train_loss"], h_sd[-1]["train_loss"], rtol=3e-2
    )


def test_sharded_extraction_matches_unsharded():
    """operaCT extraction with a mesh == without, bit-tolerant."""
    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    mesh = data_parallel_mesh(8)
    r = np.random.default_rng(1)
    clips = [
        (r.standard_normal(int(s * 16000)) * 0.1).astype(np.float32)
        for s in (8, 9, 8.5, 10, 8, 12, 8.2, 9.1, 8, 8)
    ]
    kw = dict(dim=768, input_sec=8, random_init=True, batch_size=8)
    ex0 = FeatureExtractor("operaCT", **kw)
    ex8 = FeatureExtractor("operaCT", **kw, mesh=mesh)
    # share weights so outputs are comparable
    ex8.variables = put_replicated(jax.device_get(ex0.variables), mesh)
    ex8._fn = ex8._build()
    f0 = ex0.extract_waveforms(list(clips), max_len=32 * 16000)
    f8 = ex8.extract_waveforms(list(clips), max_len=32 * 16000)
    assert f0.shape == f8.shape == (10, 768)
    np.testing.assert_allclose(f0, f8, rtol=1e-4, atol=1e-5)


def test_extractor_rejects_indivisible_batch():
    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    mesh = data_parallel_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        FeatureExtractor(
            "operaCE", dim=1280, random_init=True, batch_size=12, mesh=mesh
        )


def test_sampler_drop_last_non_divisible():
    """drop_last with a non-batch-divisible corpus: every batch is full-size
    (required for static sharded shapes) and short tails are dropped."""
    r = np.random.default_rng(2)
    c = Corpus(
        "c",
        [r.random((40, 16)).astype(np.float32) for _ in range(10)],
        [r.random((40, 16)).astype(np.float32) for _ in range(5)],
        max_len=32,
    )
    s = MultiCorpusSampler([c], 4, "cola", seed=0, drop_last=True)
    assert s.n_batches == [2] and s.steps_per_epoch == 2
    for _ in range(5):  # crosses an epoch boundary: reshuffle path covered
        _, (x1, x2) = s.next_batch()
        assert x1.shape == (4, 32, 16) and x2.shape == (4, 32, 16)
    for _, vb in s.val_batches():
        assert vb[0].shape[0] == 4  # 5 % 4 == 1 tail dropped


def test_shard_batch_layout():
    """shard_batch places shards round-robin over the data axis; values and
    per-device shapes are exact."""
    mesh = data_parallel_mesh(8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    (xs,) = shard_batch((x,), mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    for i, shard in enumerate(xs.addressable_shards):
        np.testing.assert_array_equal(np.asarray(shard.data), x[2 * i : 2 * i + 2])
    rep = jax.device_put(np.ones(4), replicate_sharding(mesh))
    assert rep.sharding.is_fully_replicated
