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
    mesh_2d,
    put_replicated,
    replicate_sharding,
    shard_batch,
    shard_params,
    transformer_param_specs,
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


def test_sharded_fused_extraction_matches_unsharded():
    """The fused Pallas extraction path under a pure-DP mesh (shard_map over
    the data axis, kernels in interpret mode on the virtual devices) must
    match the single-device unfused f32 graph — the batch-grid kernels shard
    trivially; this pins the shard_map wrapper's in/out specs and the lifted
    `mesh is None` gate (round-4 weak #4)."""
    import jax.numpy as jnp

    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    mesh = data_parallel_mesh(8)
    r = np.random.default_rng(3)
    clips = [
        (r.standard_normal(int(8 * 16000)) * 0.1).astype(np.float32)
        for _ in range(8)
    ]
    kw = dict(dim=768, input_sec=8, random_init=True, batch_size=8,
              compute_dtype=jnp.float32)
    ex0 = FeatureExtractor("operaCT", **kw)  # CPU auto: unfused XLA
    assert not ex0.use_fused_htsat
    exf = FeatureExtractor(
        "operaCT", **kw, mesh=mesh, use_fused_htsat=True, pallas_interpret=True
    )
    assert exf.use_fused_htsat and exf._dp_axis == "data"
    exf.variables = put_replicated(jax.device_get(ex0.variables), mesh)
    exf._fn = exf._build()
    f0 = ex0.extract_waveforms(list(clips), max_len=8 * 16000)
    ff = exf.extract_waveforms(list(clips), max_len=8 * 16000)
    assert f0.shape == ff.shape == (8, 768)
    # fused-kernel numerics class vs the flax graph (~1e-4, PARITY.md)
    np.testing.assert_allclose(f0, ff, rtol=2e-3, atol=2e-4)


def test_dp_fused_cola_cp_matches_single_device(tmp_path):
    """fused_train over the pure-DP mesh (shard_map pair forward, sync-BN
    moments, loss outside) == the single-device fused run, with dropout and
    droppath rates zeroed so the per-shard rng fold-in is inert."""
    import dataclasses

    tiny0 = dataclasses.replace(TINY, drop_path_rate=0.0)

    def run(mesh_, tag):
        _, history, _ = train_multiple_data(
            f"dpf-{tag}",
            data_source={"t": 32},
            encoder="htsat",
            htsat_config=tiny0,
            n_epoches=2,
            batch_size=8,
            corpora=[_tiny_corpus()],
            mesh=mesh_,
            fused_train=True,
            dropout_p=0.0,
            ckpt_root=str(tmp_path / f"cks-{tag}"),
            log_dir=str(tmp_path / f"logs-{tag}"),
            verbose=False,
        )
        return history

    h_dp = run(data_parallel_mesh(8), "mesh")
    h_sd = run(None, "single")
    assert np.isfinite(h_dp[-1]["train_loss"])
    np.testing.assert_allclose(
        h_dp[-1]["train_loss"], h_sd[-1]["train_loss"], rtol=2e-4
    )
    np.testing.assert_allclose(
        h_dp[-1]["valid_loss"], h_sd[-1]["valid_loss"], rtol=2e-4
    )

    # fused_train with tensor-sharded params is a config error, not a
    # silent fallback
    with pytest.raises(ValueError, match="pure data parallelism"):
        run_kw = dict(
            data_source={"t": 32}, encoder="htsat", htsat_config=tiny0,
            n_epoches=1, batch_size=8, corpora=[_tiny_corpus()],
            mesh=mesh_2d(2, 2), param_sharding="megatron", fused_train=True,
            ckpt_root=str(tmp_path / "cks-err"),
            log_dir=str(tmp_path / "logs-err"), verbose=False,
        )
        train_multiple_data("dpf-err", **run_kw)


def test_dp_fused_mae_cp_matches_single_device(tmp_path):
    """fused_train MAE CP over the pure-DP mesh (shard_map'd loss with the
    masking noise hoisted outside the shard) == the single-device fused run
    — each shard sees exactly the noise rows the global draw produced."""
    from heart_murmur_detection_tpu.pretrain.mae_training import (
        mae_train_multiple_data,
    )
    from tests.test_pretrain import TINY_MAE, synth_corpus

    def run(mesh_, tag):
        c = synth_corpus("a", 48, 20, 40, 16, 32, seed=5)
        _, history, _ = mae_train_multiple_data(
            f"dpfm-{tag}",
            data_source={"a": 32},
            n_epoches=1,
            batch_size=4,
            corpora=[c],
            config_override=TINY_MAE,
            mesh=mesh_,
            fused_train=True,
            ckpt_root=str(tmp_path / f"cks-{tag}"),
            log_dir=str(tmp_path / f"logs-{tag}"),
            verbose=False,
        )
        return history

    h_dp = run(data_parallel_mesh(4), "mesh")
    h_sd = run(None, "single")
    assert np.isfinite(h_dp[-1]["train_loss"])
    np.testing.assert_allclose(
        h_dp[-1]["train_loss"], h_sd[-1]["train_loss"], rtol=2e-4
    )
    np.testing.assert_allclose(
        h_dp[-1]["valid_loss"], h_sd[-1]["valid_loss"], rtol=2e-4
    )


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


P = jax.sharding.PartitionSpec


def test_megatron_specs():
    """Column-parallel qkv/fc1, row-parallel attn-proj/fc2, everything else
    (convs, biases, norms, indivisible dims) replicated — for both the
    nested HTS-AT naming and the flat MAE-ViT naming."""
    z = np.zeros
    params = {
        "encoder": {
            "layers_0_blocks_0": {
                "attn": {
                    "qkv": {"kernel": z((16, 48)), "bias": z(48)},
                    "proj": {"kernel": z((16, 16)), "bias": z(16)},
                    "relative_position_bias_table": z((9, 2)),
                },
                "mlp": {"fc1": {"kernel": z((16, 64))}, "fc2": {"kernel": z((64, 16))}},
            },
            "patch_embed": {"proj": {"kernel": z((4, 4, 1, 16))}},
        },
        "blocks_0": {
            "attn_qkv": {"kernel": z((32, 96))},
            "attn_proj": {"kernel": z((32, 32))},
            "mlp_fc1": {"kernel": z((32, 128))},
            "mlp_fc2": {"kernel": z((128, 32))},
        },
        "odd": {"fc1": {"kernel": z((16, 65))}},  # 65 % 4 != 0 -> replicated
    }
    mesh = mesh_2d(2, 4)
    s = transformer_param_specs(params, mesh, rule="megatron")
    blk = s["encoder"]["layers_0_blocks_0"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, "model")
    assert blk["attn"]["qkv"]["bias"] == P()
    assert blk["attn"]["proj"]["kernel"] == P("model", None)
    assert blk["attn"]["relative_position_bias_table"] == P()
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P("model", None)
    # a conv 'proj' with no attn ancestor stays replicated
    assert s["encoder"]["patch_embed"]["proj"]["kernel"] == P()
    assert s["blocks_0"]["attn_qkv"]["kernel"] == P(None, "model")
    assert s["blocks_0"]["attn_proj"]["kernel"] == P("model", None)
    assert s["blocks_0"]["mlp_fc1"]["kernel"] == P(None, "model")
    assert s["blocks_0"]["mlp_fc2"]["kernel"] == P("model", None)
    assert s["odd"]["fc1"]["kernel"] == P()

    placed = shard_params(params, mesh, s)
    qkv = placed["encoder"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")

    # optimizer state must be BORN sharded: jit(tx.init) alone places the
    # zeros on one device (no data dependence on the params), which the
    # first train step then silently reshards — init_optimizer_sharded
    # pins mu/nu to the param specs and scalars to replicated
    import optax

    from heart_murmur_detection_tpu.parallel.mesh import init_optimizer_sharded

    opt = init_optimizer_sharded(optax.adam(1e-3), placed, mesh, s)
    mu_qkv = opt[0].mu["encoder"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
    assert mu_qkv.sharding.spec == P(None, "model")
    assert opt[0].count.sharding.spec == P()


def test_fsdp_specs():
    mesh = mesh_2d(2, 4)
    params = {
        "big": np.zeros((48, 64)),  # largest axis 64 % 4 == 0 -> sharded
        "tiny": np.zeros((8,)),  # below min_size -> replicated
        "odd": np.zeros((130, 7)),  # no axis divisible by 4 -> replicated
    }
    s = transformer_param_specs(params, mesh, rule="fsdp", fsdp_min_size=64)
    assert s["big"] == P(None, "model")
    assert s["tiny"] == P()
    assert s["odd"] == P()
    with pytest.raises(ValueError, match="no 'model' axis"):
        transformer_param_specs(params, data_parallel_mesh(8))


@pytest.mark.parametrize("rule", ["megatron", "fsdp"])
def test_tp_cola_step_matches_single_device(tmp_path, rule):
    """COLA CP over a 2-D (data=2, model=2) mesh with tensor-sharded params
    == the single-device run: GSPMD's partitioned matmuls + collectives must
    reproduce the unsharded numerics (same host-side sampling seeds)."""
    mesh = mesh_2d(2, 2)

    def run(mesh_, ps, tag):
        variables, history, _ = train_multiple_data(
            f"tp-{tag}",
            data_source={"t": 32},
            encoder="htsat",
            htsat_config=TINY,
            n_epoches=1,
            batch_size=8,
            corpora=[_tiny_corpus()],
            mesh=mesh_,
            param_sharding=ps,
            ckpt_root=str(tmp_path / f"cks-{tag}"),
            log_dir=str(tmp_path / f"logs-{tag}"),
            verbose=False,
        )
        return variables, history

    v_tp, h_tp = run(mesh, rule, f"{rule}")
    v_sd, h_sd = run(None, None, "single")
    assert np.isfinite(h_tp[-1]["train_loss"])
    np.testing.assert_allclose(
        h_tp[-1]["train_loss"], h_sd[-1]["train_loss"], rtol=2e-4
    )
    np.testing.assert_allclose(
        h_tp[-1]["valid_loss"], h_sd[-1]["valid_loss"], rtol=2e-4
    )
    # with megatron sharding the qkv kernels must actually live sharded
    if rule == "megatron":
        qkv = v_tp["params"]["encoder"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
        assert qkv.sharding.spec == P(None, "model")
    flat_tp = jax.tree.leaves(jax.device_get(v_tp["params"]))
    flat_sd = jax.tree.leaves(jax.device_get(v_sd["params"]))
    for a, b in zip(flat_tp, flat_sd):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


def test_zero3_over_data_axis_matches_single_device(tmp_path):
    """param_sharding=fsdp on a 1-D ('data',) mesh = classic ZeRO-3: params
    sharded over the data axis (all-gathered at use, grads reduce-scattered)
    while the batch stays data-sharded. Numerics must equal the
    single-device run."""
    mesh = data_parallel_mesh(4)

    def run(mesh_, ps, tag):
        variables, history, _ = train_multiple_data(
            f"z3-{tag}",
            data_source={"t": 32},
            encoder="htsat",
            htsat_config=TINY,
            n_epoches=1,
            batch_size=8,
            corpora=[_tiny_corpus()],
            mesh=mesh_,
            param_sharding=ps,
            ckpt_root=str(tmp_path / f"cks-{tag}"),
            log_dir=str(tmp_path / f"logs-{tag}"),
            verbose=False,
        )
        return variables, history

    v_z, h_z = run(mesh, "fsdp", "fsdp")
    v_s, h_s = run(None, None, "single")
    np.testing.assert_allclose(
        h_z[-1]["train_loss"], h_s[-1]["train_loss"], rtol=2e-4
    )
    flat_z = jax.tree.leaves(jax.device_get(v_z["params"]))
    flat_s = jax.tree.leaves(jax.device_get(v_s["params"]))
    for a, b in zip(flat_z, flat_s):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)

    # megatron on a 1-D mesh is a config error, not silent misplacement
    from heart_murmur_detection_tpu.parallel.mesh import param_sharding_axis

    with pytest.raises(ValueError, match="model"):
        param_sharding_axis(mesh, "megatron")
    assert param_sharding_axis(mesh, "fsdp") == "data"
    assert param_sharding_axis(mesh_2d(2, 2), "fsdp") == "model"


def test_tp_resume_preserves_sharding(tmp_path):
    """Auto-resume into a tensor-sharded run must re-apply the init-time
    placement (ResumeCheckpointer returns host numpy; parallel.mesh.place_like
    restores the megatron layout instead of letting the train step recompile
    for host-replicated arguments)."""
    mesh = mesh_2d(2, 2)
    common = dict(
        data_source={"t": 32},
        encoder="htsat",
        htsat_config=TINY,
        batch_size=8,
        corpora=[_tiny_corpus()],
        mesh=mesh,
        param_sharding="megatron",
        ckpt_root=str(tmp_path / "cks"),
        log_dir=str(tmp_path / "logs"),
        verbose=False,
    )
    _, h1, _ = train_multiple_data("tpr", n_epoches=6, **common)
    assert len(h1) == 6
    v2, h2, _ = train_multiple_data("tpr", n_epoches=8, resume=True, **common)
    assert [h["epoch"] for h in h2] == [5, 6, 7]
    assert np.isfinite(h2[-1]["train_loss"])
    qkv = v2["params"]["encoder"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")


def test_tp_mae_cp_runs():
    """MAE CP composes with the tensor axis: one epoch on a (2,2) mesh with
    megatron-sharded ViT blocks trains to a finite loss."""
    import tempfile

    from heart_murmur_detection_tpu.pretrain.mae_training import (
        mae_train_multiple_data,
    )
    from tests.test_pretrain import TINY_MAE, synth_corpus

    d = tempfile.mkdtemp()
    c = synth_corpus("a", 48, 20, 40, 16, 32)  # 4 val clips = 1 full val batch
    _, history, _ = mae_train_multiple_data(
        "tp-mae",
        data_source={"a": 32},
        n_epoches=1,
        batch_size=4,
        corpora=[c],
        config_override=TINY_MAE,
        mesh=mesh_2d(2, 2),
        param_sharding="megatron",
        ckpt_root=d + "/cks",
        log_dir=d + "/logs",
        verbose=False,
    )
    assert np.isfinite(history[-1]["valid_loss"])


def test_dp_finetune_matches_single_device():
    """Data-parallel fine-tuning (batch resharded inside the epoch scan,
    GSPMD grad psum) == the single-device run: same seeds, same batches,
    losses/params agree to float tolerance."""
    from heart_murmur_detection_tpu.train.finetune import finetune_classifier
    from tests.test_finetune import TINY_HTSAT, synth_clf_data

    x, y = synth_clf_data(48, 32, 16)
    kw = dict(
        encoder_kind="htsat",
        htsat_config=TINY_HTSAT,
        n_cls=2,
        feat_dim=128,
        lr=1e-3,
        epochs=2,
        batch_size=8,
        seed=0,
    )
    args = (x[:32], y[:32], x[32:40], y[32:40], x[40:], y[40:])
    r_dp = finetune_classifier(*args, mesh=data_parallel_mesh(8), **kw)
    r_sd = finetune_classifier(*args, **kw)
    assert np.isfinite(r_dp.test_auc)
    np.testing.assert_allclose(r_dp.valid_auc, r_sd.valid_auc, rtol=1e-3)
    flat_dp = jax.tree.leaves(r_dp.variables["params"])
    flat_sd = jax.tree.leaves(r_sd.variables["params"])
    for a, b in zip(flat_dp, flat_sd):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)

    with pytest.raises(ValueError, match="not divisible"):
        finetune_classifier(
            *args, mesh=data_parallel_mesh(8), **{**kw, "batch_size": 12}
        )


@pytest.mark.parametrize(
    "mk_mesh,rule",
    [(lambda: data_parallel_mesh(4), "fsdp"), (lambda: mesh_2d(2, 2), "megatron")],
)
def test_sharded_finetune_matches_single_device(mk_mesh, rule):
    """Fine-tuning with tensor-sharded params (ZeRO-3 over data, or megatron
    on a dp x tp mesh) == the single-device run."""
    from heart_murmur_detection_tpu.train.finetune import finetune_classifier
    from tests.test_finetune import TINY_HTSAT, synth_clf_data

    x, y = synth_clf_data(48, 32, 16)
    kw = dict(
        encoder_kind="htsat",
        htsat_config=TINY_HTSAT,
        n_cls=2,
        feat_dim=128,
        lr=1e-3,
        epochs=2,
        batch_size=8,
        seed=0,
    )
    args = (x[:32], y[:32], x[32:40], y[32:40], x[40:], y[40:])
    r_sh = finetune_classifier(*args, mesh=mk_mesh(), param_sharding=rule, **kw)
    r_sd = finetune_classifier(*args, **kw)
    np.testing.assert_allclose(r_sh.valid_auc, r_sd.valid_auc, rtol=1e-3)
    flat_sh = jax.tree.leaves(jax.device_get(r_sh.variables["params"]))
    flat_sd = jax.tree.leaves(jax.device_get(r_sd.variables["params"]))
    for a, b in zip(flat_sh, flat_sd):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


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


def test_zero3_mae_cp_matches_single_device(tmp_path):
    """ZeRO-3 MAE CP (param_sharding=fsdp on the 1-D mesh, exercising the
    gather-at-use constraint in steps.make_mae_train_step) must equal the
    single-device run."""
    from heart_murmur_detection_tpu.pretrain.mae_training import (
        mae_train_multiple_data,
    )
    from tests.test_pretrain import TINY_MAE, synth_corpus

    def run(mesh_, ps, tag):
        c = synth_corpus("a", 48, 20, 40, 16, 32, seed=3)
        return mae_train_multiple_data(
            f"z3mae-{tag}",
            data_source={"a": 32},
            n_epoches=1,
            batch_size=4,
            corpora=[c],
            config_override=TINY_MAE,
            mesh=mesh_,
            param_sharding=ps,
            ckpt_root=str(tmp_path / f"cks-{tag}"),
            log_dir=str(tmp_path / f"logs-{tag}"),
            verbose=False,
        )

    _, h_z, _ = run(data_parallel_mesh(4), "fsdp", "fsdp")
    _, h_s, _ = run(None, None, "single")
    np.testing.assert_allclose(
        h_z[-1]["train_loss"], h_s[-1]["train_loss"], rtol=2e-4
    )
