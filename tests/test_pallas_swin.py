"""Fused pallas swin block vs the flax SwinBlock (interpret mode, both
shifted and unshifted, stage-1 and stage-3 geometries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heart_murmur_detection_tpu.models.htsat import (
    SwinBlock,
    _relative_position_index,
    _shift_attn_mask,
)
from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_block


@pytest.mark.parametrize(
    "C,res,heads,shift",
    [
        (96, (16, 16), 4, 0),
        (96, (16, 16), 4, 4),
        (384, (16, 16), 16, 0),
        (384, (16, 16), 16, 4),
    ],
)
def test_fused_matches_flax(C, res, heads, shift):
    H, W = res
    blk = SwinBlock(
        dim=C, input_resolution=res, num_heads=heads, window=8, shift=shift,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, H * W, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))

    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    mask = (
        jnp.asarray(_shift_attn_mask(H, W, 8, shift)) if shift else None
    )

    xs = x.reshape(2, H, W, C)
    if shift:
        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
    out = fused_swin_block(
        xs, p, bias, mask, num_heads=heads, tw=2, interpret=True
    )
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    got = np.asarray(out).reshape(2, H * W, C)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("C,heads", [(96, 4), (384, 16)])
def test_in_kernel_w_roll_matches_explicit(C, heads):
    """roll_w (W-axis cyclic shift inside the kernel) == explicit 2-axis roll."""
    H = W = 16
    shift = 4
    blk = SwinBlock(
        dim=C, input_resolution=(H, W), num_heads=heads, window=8, shift=shift,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((2, H * W, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))
    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    mask = jnp.asarray(_shift_attn_mask(H, W, 8, shift))
    xs = jnp.roll(x.reshape(2, H, W, C), -shift, axis=1)  # H only
    out = fused_swin_block(
        xs, p, bias, mask, num_heads=heads, interpret=True, roll_w=shift
    )
    got = np.asarray(jnp.roll(out, shift, axis=1)).reshape(2, H * W, C)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_bf16_kernel_close_and_autobb_feasible():
    """bf16 matmul mode stays within ~1e-2 of f32 (f32 accumulation), and the
    auto block-size picker yields a legal configuration for the widest fused
    stage's geometry (C=384 previously tripped the 16MB scoped-VMEM limit)."""
    C, heads, H = 384, 16, 16
    blk = SwinBlock(
        dim=C, input_resolution=(H, H), num_heads=heads, window=8, shift=0,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((4, H * H, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))
    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    xs = x.reshape(4, H, H, C)
    # auto tw/bb (no overrides): exercises the calibrated VMEM model
    got = np.asarray(
        fused_swin_block(
            xs, p, bias, None, num_heads=heads, interpret=True,
            mm_dtype=jnp.bfloat16,
        )
    ).reshape(4, H * H, C)
    # bf16 inputs, f32 accumulation: block-level agreement ~1e-2 absolute
    assert np.abs(got - want).max() < 5e-2
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999


def _two_blocks(C, res, heads, shift, seed=0):
    """(regular, shifted) flax SwinBlock pair + params/bias/mask fixtures."""
    from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_pair

    H, W = res
    mk = lambda s: SwinBlock(
        dim=C, input_resolution=res, num_heads=heads, window=8, shift=s,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    blkA, blkB = mk(0), mk(shift)
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((2, H * W, C)) * 0.5, jnp.float32)
    vA = blkA.init(jax.random.PRNGKey(0), x)
    vB = blkB.init(jax.random.PRNGKey(1), x)
    want = np.asarray(blkB.apply(vB, blkA.apply(vA, x)))

    def bias_of(v):
        p = v["params"]
        t = np.asarray(p["attn"]["relative_position_bias_table"])
        ri = _relative_position_index(8, 8).reshape(-1)
        return jnp.asarray(t[ri].reshape(64, 64, heads).transpose(2, 0, 1))

    mask = jnp.asarray(_shift_attn_mask(H, W, 8, shift))
    run = lambda **kw: np.asarray(
        fused_swin_pair(
            x.reshape(2, H, W, C), vA["params"], vB["params"],
            bias_of(vA), bias_of(vB), mask,
            num_heads=heads, shift=shift, interpret=True, **kw,
        )
    ).reshape(2, H * W, C)
    return run, want


def test_fused_pair_matches_two_flax_blocks():
    """Pair kernel == two sequential flax blocks (incl. both cyclic rolls).

    16x16 geometry already exercises every wraparound case: with cw=W the
    shifted block's last tile needs 2x2 corner reads/writes (rows AND cols
    wrap)."""
    run, want = _two_blocks(96, (16, 16), 4, 4)
    got = run()
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_pair_bf16_stage3_feasible_and_close():
    """C=384 pair fits VMEM only with bf16 weights (pair_plan: f32 -> None);
    bf16 matmuls with f32 accumulation stay ~1e-2 of f32."""
    from heart_murmur_detection_tpu.ops.pallas_swin import pair_plan

    assert pair_plan(2, 16, 16, 384, 16, 1536, jnp.float32) is None
    assert pair_plan(2, 16, 16, 384, 16, 1536, jnp.bfloat16) is not None
    run, want = _two_blocks(384, (16, 16), 16, 4)
    got = run(mm_dtype=jnp.bfloat16)
    assert np.abs(got - want).max() < 1e-1
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999


def test_bf16_activation_flow_close():
    """bf16 activation storage (x passed as bf16, bf16 maps) stays within
    quantization distance of the all-f32 path: the kernel returns a bf16
    output whose cosine vs f32 flax is >= 0.999 (extra rounding beyond
    mm_dtype=bf16 comes only from the bf16 residual carries)."""
    from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_pair

    # single block, unshifted, stage-1 geometry
    C, heads, H = 96, 4, 16
    blk = SwinBlock(
        dim=C, input_resolution=(H, H), num_heads=heads, window=8, shift=0,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal((2, H * H, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))
    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    out = fused_swin_block(
        x.reshape(2, H, H, C).astype(jnp.bfloat16), p, bias, None,
        num_heads=heads, interpret=True, mm_dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.bfloat16
    got = np.asarray(out, np.float32).reshape(2, H * H, C)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999


def test_pack2_override_matches_default():
    """pack2 window-pair packing is numerically exact: forcing it ON at a
    geometry where the auto policy leaves it off (C=384) matches flax, and
    forcing it OFF at C=96 (auto-on) also matches — the -1e9 cross-window
    logits underflow to exact zeros through softmax."""
    for C, heads, pack2 in ((384, 16, True), (96, 4, False)):
        H = 16
        blk = SwinBlock(
            dim=C, input_resolution=(H, H), num_heads=heads, window=8, shift=0,
            mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
        )
        r = np.random.default_rng(11)
        x = jnp.asarray(r.standard_normal((2, H * H, C)) * 0.5, jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        want = np.asarray(blk.apply(v, x))
        p = v["params"]
        table = np.asarray(p["attn"]["relative_position_bias_table"])
        rel_idx = _relative_position_index(8, 8).reshape(-1)
        bias = jnp.asarray(
            table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1)
        )
        got = np.asarray(
            fused_swin_block(
                x.reshape(2, H, H, C), p, bias, None, num_heads=heads,
                interpret=True, pack2=pack2,
            )
        ).reshape(2, H * H, C)
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_pack2_with_shifted_mask_and_fast_softmax():
    """pack2 + shifted-window mask + fast_softmax compose: the block-diag
    mask pairing matches flax for a shifted block (mask varies per window)."""
    C, heads, H, shift = 96, 4, 16, 4
    blk = SwinBlock(
        dim=C, input_resolution=(H, H), num_heads=heads, window=8, shift=shift,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(12)
    x = jnp.asarray(r.standard_normal((2, H * H, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))
    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    mask = jnp.asarray(_shift_attn_mask(H, H, 8, shift))
    xs = jnp.roll(x.reshape(2, H, H, C), (-shift, -shift), axis=(1, 2))
    out = fused_swin_block(
        xs, p, bias, mask, num_heads=heads, interpret=True,
        pack2=True, fast_softmax=True,
    )
    got = np.asarray(jnp.roll(out, (shift, shift), axis=(1, 2))).reshape(
        2, H * H, C
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_pair_bf16_activation_maps():
    """Pair kernel accepts bf16 x (bf16 in/out/scratch maps) and matches the
    f32 two-block reference to cosine >= 0.999."""
    from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_pair
    from heart_murmur_detection_tpu.models.htsat import _shift_attn_mask

    C, heads, shift = 96, 4, 4
    H = W = 16
    mk = lambda s: SwinBlock(
        dim=C, input_resolution=(H, W), num_heads=heads, window=8, shift=s,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    blkA, blkB = mk(0), mk(shift)
    r = np.random.default_rng(7)
    x = jnp.asarray(r.standard_normal((2, H * W, C)) * 0.5, jnp.float32)
    vA = blkA.init(jax.random.PRNGKey(0), x)
    vB = blkB.init(jax.random.PRNGKey(1), x)
    want = np.asarray(blkB.apply(vB, blkA.apply(vA, x)))

    def bias_of(v):
        p = v["params"]
        t = np.asarray(p["attn"]["relative_position_bias_table"])
        ri = _relative_position_index(8, 8).reshape(-1)
        return jnp.asarray(t[ri].reshape(64, 64, heads).transpose(2, 0, 1))

    mask = jnp.asarray(_shift_attn_mask(H, W, 8, shift))
    out = fused_swin_pair(
        x.reshape(2, H, W, C).astype(jnp.bfloat16),
        vA["params"], vB["params"], bias_of(vA), bias_of(vB), mask,
        num_heads=heads, shift=shift, interpret=True, mm_dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.bfloat16
    got = np.asarray(out, np.float32).reshape(2, H * W, C)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999


def test_extractor_fused_default_off_on_cpu():
    """use_fused_htsat=None resolves to False on CPU (pallas interpret would
    be slow) — the exact XLA path stays the test/CPU default."""
    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    fe = FeatureExtractor(
        "operaCT", dim=768, input_sec=8, batch_size=2, random_init=True
    )
    assert fe.use_fused_htsat is False


class TestFusedHTSAT:
    def test_full_forward_matches_flax(self):
        """htsat_apply_fused == HTSAT.apply latent to ~1e-4 (interpret kernels)."""
        from unittest import mock

        import heart_murmur_detection_tpu.models.htsat_fused as hf
        from heart_murmur_detection_tpu.models.htsat import HTSAT, HTSATConfig

        cfg = HTSATConfig()
        model = HTSAT(cfg)
        r = np.random.default_rng(0)
        mel = jnp.asarray(r.random((1, 251, 64)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), mel)
        want = np.asarray(model.apply(v, mel)["latent_output"])

        orig = hf.fused_swin_block
        orig_pair = hf.fused_swin_pair

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        def interp_pair(*a, **k):
            k["interpret"] = True
            return orig_pair(*a, **k)

        with mock.patch.object(hf, "fused_swin_block", interp), mock.patch.object(
            hf, "fused_swin_pair", interp_pair
        ):
            got = np.asarray(hf.htsat_apply_fused(v, mel, cfg=cfg))
            got_nopair = np.asarray(
                hf.htsat_apply_fused(v, mel, cfg=cfg, use_pair=False)
            )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(got_nopair, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("C,res,heads,shift", [(768, (8, 8), 32, 0), (96, (16, 16), 4, 4)])
def test_split_block_matches_flax(C, res, heads, shift):
    """fused_swin_block_split (attn, MLP kernel pair for VMEM-oversized
    stages) == flax SwinBlock, incl. the stage-4 geometry it exists for
    (C=768, one 8x8 window) and a shifted strip with the in-kernel W roll."""
    from heart_murmur_detection_tpu.ops.pallas_swin import fused_swin_block_split

    H, W = res
    blk = SwinBlock(
        dim=C, input_resolution=res, num_heads=heads, window=8, shift=shift,
        mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((2, H * W, C)) * 0.5, jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk.apply(v, x))

    p = v["params"]
    table = np.asarray(p["attn"]["relative_position_bias_table"])
    rel_idx = _relative_position_index(8, 8).reshape(-1)
    bias = jnp.asarray(table[rel_idx].reshape(64, 64, heads).transpose(2, 0, 1))
    mask = jnp.asarray(_shift_attn_mask(H, W, 8, shift)) if shift else None

    xs = x.reshape(2, H, W, C)
    if shift:
        xs = jnp.roll(xs, -shift, axis=1)  # H roll outside, W roll in-kernel
    out = fused_swin_block_split(
        xs, p, bias, mask, num_heads=heads, interpret=True, roll_w=shift
    )
    if shift:
        out = jnp.roll(out, shift, axis=1)
    got = np.asarray(out).reshape(2, H * W, C)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


class TestBDHeadPacking:
    def test_bd_heads_matches_batched(self):
        """The block-diag head-packed attention core (_strip_attn_bd — kept
        selectable; measured ~10% slower than the head-batched default at
        production geometry, RESULTS.md round-5 negative result) must equal
        the default path: zero blocks contribute exact zeros, so only sum
        reassociation differs."""
        import numpy as np

        from heart_murmur_detection_tpu.models.htsat import (
            HTSATConfig, _shift_attn_mask, _relative_position_index,
        )
        from heart_murmur_detection_tpu.ops import pallas_swin as ps

        cfg = HTSATConfig(
            spec_size=64, embed_dim=32, depths=(2,), num_heads=(4,),
            window_size=4, mel_bins=16,
        )
        H = W = 8
        window, heads, dim = 4, 4, 32
        N = window * window
        r = np.random.default_rng(0)
        rel_idx = _relative_position_index(window, window).reshape(-1)
        p = {
            "attn": {
                "qkv": {"kernel": r.standard_normal((dim, 3 * dim)).astype(np.float32) * 0.05,
                        "bias": r.standard_normal(3 * dim).astype(np.float32) * 0.05},
                "proj": {"kernel": r.standard_normal((dim, dim)).astype(np.float32) * 0.05,
                         "bias": r.standard_normal(dim).astype(np.float32) * 0.05},
                "relative_position_bias_table": r.standard_normal(
                    ((2 * window - 1) ** 2, heads)).astype(np.float32) * 0.05,
            },
            "norm1": {"scale": np.ones(dim, np.float32), "bias": np.zeros(dim, np.float32)},
            "norm2": {"scale": np.ones(dim, np.float32), "bias": np.zeros(dim, np.float32)},
            "mlp": {"fc1": {"kernel": r.standard_normal((dim, 4 * dim)).astype(np.float32) * 0.05,
                            "bias": np.zeros(4 * dim, np.float32)},
                    "fc2": {"kernel": r.standard_normal((4 * dim, dim)).astype(np.float32) * 0.05,
                            "bias": np.zeros(dim, np.float32)}},
        }
        import jax.numpy as jnp

        bias = jnp.asarray(
            p["attn"]["relative_position_bias_table"][np.asarray(rel_idx)]
            .reshape(N, N, heads).transpose(2, 0, 1)
        )
        mask = jnp.asarray(_shift_attn_mask(H, W, window, 2))
        x = jnp.asarray(r.standard_normal((2, H, W, dim)).astype(np.float32) * 0.1)
        outs = {}
        for bd in (False, True):
            old = ps.BD_HEADS_DEFAULT
            ps.BD_HEADS_DEFAULT = bd
            try:
                for fast in (False, True):
                    outs[(bd, fast)] = np.asarray(
                        ps.fused_swin_block(
                            x, p, bias, mask, window=window, num_heads=heads,
                            roll_w=2, interpret=True, fast_softmax=fast,
                        )
                    )
            finally:
                ps.BD_HEADS_DEFAULT = old
        for fast in (False, True):
            np.testing.assert_allclose(
                outs[(True, fast)], outs[(False, fast)], rtol=2e-5, atol=2e-6
            )
