"""Fused Pallas swin-block kernel for HTS-AT.

Why: the encoder is HBM-bandwidth-bound, not FLOP-bound (stage-1 alone —
4096 tokens at C=96 — costs 26 ms of the 61 ms batch-64 extraction graph at
~2.5 TF/s effective). Each XLA block round-trips x through HBM ~10x (norms,
qkv, attention, proj, MLP, window partition/reverse transposes). This kernel
computes LN1 -> windowed attention (+relative-position bias, +shift mask) ->
proj -> residual -> LN2 -> MLP -> residual for a tile of windows entirely in
VMEM: HBM traffic becomes one read + one write of x per block.

Layout: x stays spatial (B, H, W, C); the window partition happens via VMEM
reshapes inside the kernel (no HBM transpose). The cyclic shift (shifted
blocks) is a jnp.roll outside — one unavoidable data movement.

Numerics: f32 matmuls run at Precision.HIGHEST with f32 accumulation;
bfloat16 mode (mm_dtype) halves MXU passes and keeps f32 accumulation via
preferred_element_type. Interpret-mode output matches models.htsat.SwinBlock
(eval) to ~1e-5 (tests/test_pallas_swin.py); on real TPU hardware Mosaic's
transcendental approximations (exp/rsqrt in softmax+LN) give ~2e-2 absolute
block-output deltas that wash out to feature cosine >= 0.99999 end-to-end
(RESULTS.md round-2 table) — an inference-path tolerance, documented in
PARITY.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST

# default for _strip_attn's block-diag head packing when the call site passes
# bd_heads=None: None = auto policy, True/False = forced (bench A/Bs flip
# this module-level switch to compare layouts in one process)
BD_HEADS_DEFAULT = None


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max err 1.5e-7) — Mosaic lowers
    neither erf nor erfc, so implement it (pallas guide: 'implement it')."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # jax.nn.gelu(approximate=False) == 0.5 x (1 + erf(x/sqrt2))
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ln(x, scale, bias, eps=1e-5):
    x = x.astype(jnp.float32)  # stats in f32 even for bf16 activation flow
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _strip_block(
    x, mask, bias,
    w_qkv, b_qkv, w_proj, b_proj,
    ln1_s, ln1_b, ln2_s, ln2_b,
    w_fc1, b_fc1, w_fc2, b_fc2,
    *, win: int, heads: int, hdp: int, mm_dtype, fast_softmax: bool = False,
    pack2=None,
):
    """One swin block on a spatial tile x (bb, win, cw, C) of whole windows.

    All arguments are VALUES (already loaded from refs). mask is (bb*twc, N,
    N) additive or None; bias (heads, N, N); biases/LN params 1-D vectors.
    Window partition/reverse happen as VMEM reshapes. Returns (bb, win, cw, C)
    in x.dtype: when the caller flows bf16 activations, intermediates that
    only feed matmuls (qkv, attention output, residual carries) are stored
    bf16 — halving VMEM liveness and VPU copy bytes — while LN stats,
    softmax and gelu still compute in f32.
    """
    h1 = _strip_attn(
        x, mask, bias, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
        win=win, heads=heads, hdp=hdp, mm_dtype=mm_dtype,
        fast_softmax=fast_softmax, pack2=pack2,
    )
    return _strip_mlp(
        h1, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, mm_dtype=mm_dtype
    )


def _strip_attn(
    x, mask, bias, w_qkv, b_qkv, w_proj, b_proj, ln1_s, ln1_b,
    *, win: int, heads: int, hdp: int, mm_dtype, fast_softmax: bool = False,
    pack2=None, bd_heads=None,
):
    """Attention half of _strip_block: window partition -> LN1 -> qkv ->
    head-batched windowed attention (+bias/mask) -> proj -> +x -> window
    reverse. Returns (bb, win, cw, C) in x.dtype."""
    bb, _, cw, C = x.shape
    act_dtype = x.dtype
    hd = C // heads
    N = win * win
    tw = cw // win
    nw = bb * tw  # windows processed in this tile
    Cp = heads * hdp  # lane-padded q/k/v width (hdp=32-aligned head dim)
    mm = lambda a: a.astype(mm_dtype)
    # Mosaic rejects fp32 contract_precision on bf16 operands ("Bad lhs
    # type"); bf16 matmuls use default precision + f32 accumulation instead
    prec = HI if mm_dtype == jnp.float32 else None
    xw = x.reshape(bb, win, tw, win, C).transpose(0, 2, 1, 3, 4).reshape(nw, N, C)

    h = _ln(xw, ln1_s, ln1_b)
    qkv = (
        (
            jnp.dot(mm(h.reshape(nw * N, C)), mm(w_qkv), precision=prec,
                    preferred_element_type=jnp.float32)
            + b_qkv
        )
        .astype(act_dtype)
        .reshape(nw, N, 3 * Cp)
    )  # sublane split only; Mosaic can't split lanes

    gp = 128 // hdp  # heads per block-diag group (4 at the hd=24/hdp=32 zoo)
    if bd_heads is None:
        bd_heads = BD_HEADS_DEFAULT
    if bd_heads is None:
        # auto: the BD packing folds gp heads into one K=128 matmul via
        # lane-masked copies (zero blocks contribute exact zeros). Measured
        # same-process at production stage geometry: the masked-copy
        # construction costs more than the fuller MXU fill saves, so the
        # head-BATCHED form stays the default (RESULTS.md round-5 negative
        # result). The path is kept selectable for other geometries.
        bd_heads = False
    if bd_heads and gp > 1 and heads % gp == 0:
        return _strip_attn_bd(
            xw, mask, bias, w_proj, b_proj, qkv,
            bb=bb, cw=cw, C=C, hd=hd, N=N, nw=nw, win=win, tw=tw,
            heads=heads, hdp=hdp, gp=gp, mm=mm, prec=prec,
            act_dtype=act_dtype, fast_softmax=fast_softmax, pack2=pack2,
        )
    # Head-BATCHED attention: stack the per-head lane slices (32-aligned via
    # hdp padding) along the batch (sublane) axis and run ONE qk dot, ONE
    # softmax and ONE av dot over a heads*nw batch — measured 0.25 ms/block
    # faster than a per-head loop at stage-1 geometry (bench/kernel_ablate:
    # 'batched_heads'), numerically identical (same ops, bigger batch).
    hcat = lambda off: jnp.concatenate(
        [qkv[:, :, off + hh * hdp : off + hh * hdp + hdp] for hh in range(heads)], 0
    )  # (heads*nw, N, hdp), head-major
    qs, ks, vs = hcat(0), hcat(Cp), hcat(2 * Cp)
    # Window-pair lane packing: with N = 64 the score matrices fill only half
    # of the 128-wide lanes. Packing two consecutive windows per attention
    # instance makes scores (heads*nw/2, 128, 128) — full lanes for the
    # bias/mask adds and softmax, half the op count — at 2x the (tiny) qk/av
    # matmul flops. Cross-window logits get -1e9, so exp underflows to exact
    # zero and the numerics are bit-identical in spirit (same softmax sums).
    # Auto policy (measured, bench note in RESULTS.md): a 1.53x win at the
    # many-window lane-starved stage-0 geometry (C=96), a ~3-6% LOSS at
    # C>=192 where the instance batch is already small — so None enables it
    # only for C < 128.
    if pack2 is None:
        pack2 = C < 128
    pack2 = pack2 and N == 64 and nw % 2 == 0
    if pack2:
        neg = jnp.full((heads, N, N), -1e9, jnp.float32)
        bd = jnp.concatenate(
            [
                jnp.concatenate([bias, neg], axis=2),
                jnp.concatenate([neg, bias], axis=2),
            ],
            axis=1,
        )  # (heads, 2N, 2N) bias + cross-window kill in one add
        qs = qs.reshape(heads * nw // 2, 2 * N, hdp)
        ks = ks.reshape(heads * nw // 2, 2 * N, hdp)
        vs = vs.reshape(heads * nw // 2, 2 * N, hdp)
        bias_add = jnp.repeat(bd, nw // 2, axis=0)
        if mask is not None:
            # (nw, N, N) -> per-pair block-diagonal (nw/2, 2N, 2N). Strided
            # batch slicing (mask[0::2]) lowers as an unsupported gather in
            # Mosaic; reshape + plain slices instead.
            mp = mask.reshape(nw // 2, 2, N, N)
            m0, m1 = mp[:, 0], mp[:, 1]
            z = jnp.zeros_like(m0)
            mask = jnp.concatenate(
                [
                    jnp.concatenate([m0, z], axis=2),
                    jnp.concatenate([z, m1], axis=2),
                ],
                axis=1,
            )  # pair order matches the qs reshape
    else:
        bias_add = jnp.repeat(bias, nw, axis=0)
    a = jax.lax.dot_general(
        mm(qs * (hd ** -0.5)), mm(ks),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32,
    )  # (heads*nw[/2], N[*2], N[*2]); padded tail dims are exact zeros
    a = a + bias_add
    if mask is not None:
        a = a + jnp.tile(mask, (heads, 1, 1))
    if fast_softmax:
        # unstabilized: skips the rowwise max pass (-0.19 ms/block), and
        # normalizes AFTER the av matmul — the divide touches (N, hdp)
        # outputs instead of rewriting the (N, N) score map
        # (bench/gt_attn_opt.py v3). Safe while logits < ~80 (f32 overflow
        # of the unnormalized e@v sums vs exp(88)); LN-bounded activations
        # keep swin logits far below that, but this is opt-in policy.
        e = jnp.exp(a)
        recip = 1.0 / jnp.sum(e, -1, keepdims=True)
        ost = (
            jax.lax.dot_general(
                mm(e), mm(vs),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32,
            )
            * recip
        ).astype(act_dtype)
    else:
        a = jax.nn.softmax(a, axis=-1)
        ost = jax.lax.dot_general(
            mm(a), mm(vs),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        ).astype(act_dtype)
    if pack2:
        ost = ost.reshape(heads * nw, N, hdp)
    o = jnp.concatenate(
        [ost[hh * nw : (hh + 1) * nw] for hh in range(heads)], axis=-1
    ).reshape(nw * N, Cp)
    o = (
        jnp.dot(mm(o), mm(w_proj), precision=prec,
                preferred_element_type=jnp.float32)
        + b_proj
    ).reshape(nw, N, C)

    h1 = (xw.astype(jnp.float32) + o).astype(act_dtype)
    return h1.reshape(bb, tw, win, win, C).transpose(0, 2, 1, 3, 4).reshape(
        bb, win, cw, C
    )


def _strip_attn_bd(
    xw, mask, bias, w_proj, b_proj, qkv,
    *, bb, cw, C, hd, N, nw, win, tw, heads, hdp, gp, mm, prec,
    act_dtype, fast_softmax, pack2,
):
    """Block-diagonal head-packed attention core (round 5).

    The head-batched form runs one (Nt, hdp) x (hdp, Nt) matmul per head per
    window tile: a 32-deep contraction fills <=25% of the MXU and Mosaic
    loops the batch. Here gp = 128/hdp heads are folded into ONE K=128
    matmul per group via lane-masked copies of k (and v):

      K_bd[:, h*Nt+u, c] = k[:, u, c] * [c in head h's lanes]
      s = q_group @ K_bd^T          (nwt, Nt, gp*Nt) — all gp heads at once
      out = softmax_seg(s) @ V_bd   (nwt, Nt, 128) — head-lane-major, the
                                     proj input layout, no unpack concat

    The zero blocks contribute EXACT zeros to the f32 accumulation, so
    numerics match the batched form bit-for-bit up to sum reassociation.
    The segmented softmax normalizer is a (gp*Nt, gp) indicator matmul;
    normalization happens after av on (Nt, hdp)-sized outputs (the
    fast_softmax ordering), or after a per-segment max subtraction on the
    exact path. Window-pair packing (pack2) composes: the pairing happens
    on the qkv tensor before grouping.
    """
    scale = hd ** -0.5
    if pack2 is None:
        pack2 = C < 128
    pack2 = pack2 and N == 64 and nw % 2 == 0
    Cp = heads * hdp
    if pack2:
        Nt, nwt = 2 * N, nw // 2
        qkvt = qkv.reshape(nwt, Nt, 3 * Cp)
        neg = jnp.full((heads, N, N), -1e9, jnp.float32)
        bias_t = jnp.concatenate(
            [
                jnp.concatenate([bias, neg], axis=2),
                jnp.concatenate([neg, bias], axis=2),
            ],
            axis=1,
        )  # (heads, 2N, 2N)
        if mask is not None:
            mp = mask.reshape(nwt, 2, N, N)
            m0, m1 = mp[:, 0], mp[:, 1]
            z = jnp.zeros_like(m0)
            mask = jnp.concatenate(
                [
                    jnp.concatenate([m0, z], axis=2),
                    jnp.concatenate([z, m1], axis=2),
                ],
                axis=1,
            )  # (nwt, 2N, 2N)
    else:
        Nt, nwt = N, nw
        qkvt = qkv
        bias_t = bias

    li = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gp * hdp), 2)
    seg_rows = jax.lax.broadcasted_iota(jnp.int32, (gp * Nt, gp), 0)
    seg_cols = jax.lax.broadcasted_iota(jnp.int32, (gp * Nt, gp), 1)
    seg = (seg_rows // Nt == seg_cols).astype(jnp.float32)  # (gp*Nt, gp)
    # lane-expansion indicators as matmul rhs: Mosaic cannot lower the
    # minor-dim reshape a jnp.repeat would emit, an indicator matmul rides
    # the MXU instead
    er = jax.lax.broadcasted_iota(jnp.int32, (gp, gp * hdp), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (gp, gp * hdp), 1)
    expand_hdp = (ec // hdp == er).astype(jnp.float32)  # (gp, 128)
    xr = jax.lax.broadcasted_iota(jnp.int32, (gp, gp * Nt), 0)
    xc = jax.lax.broadcasted_iota(jnp.int32, (gp, gp * Nt), 1)
    expand_nt = (xc // Nt == xr).astype(jnp.float32)  # (gp, gp*Nt)

    def _expand(t, ind):
        return jax.lax.dot_general(
            t, ind, dimension_numbers=(((2,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )

    outs = []
    for g in range(heads // gp):
        lo = g * gp * hdp
        qg = qkvt[:, :, lo : lo + gp * hdp]
        kg = qkvt[:, :, Cp + lo : Cp + lo + gp * hdp]
        vg = qkvt[:, :, 2 * Cp + lo : 2 * Cp + lo + gp * hdp]
        # lane-masked copies stacked on the sublane axis: K_bd/V_bd
        # (nwt, gp*Nt, 128); head h's block keeps only its hdp lanes
        kbd = jnp.concatenate(
            [kg * (li // hdp == hh).astype(kg.dtype) for hh in range(gp)],
            axis=1,
        )
        vbd = jnp.concatenate(
            [vg * (li // hdp == hh).astype(vg.dtype) for hh in range(gp)],
            axis=1,
        )
        s = jax.lax.dot_general(
            mm(qg * scale), mm(kbd),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (nwt, Nt, gp*Nt)
        gb = jnp.concatenate(
            [bias_t[g * gp + hh] for hh in range(gp)], axis=-1
        )  # (Nt, gp*Nt)
        s = s + gb[None]
        if mask is not None:
            s = s + jnp.tile(mask, (1, 1, gp))
        if not fast_softmax:
            # per-segment rowwise max (gp slices -> (nwt, Nt, gp))
            mx = jnp.concatenate(
                [
                    jnp.max(s[:, :, hh * Nt : (hh + 1) * Nt], -1, keepdims=True)
                    for hh in range(gp)
                ],
                axis=-1,
            )
            s = s - _expand(mx, expand_nt)
        e = jnp.exp(s)
        sums = jax.lax.dot_general(
            e, seg,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )  # (nwt, Nt, gp) — exact segment sums (indicator matmul)
        recip = _expand(1.0 / sums, expand_hdp)  # (nwt, Nt, 128)
        av = jax.lax.dot_general(
            mm(e), mm(vbd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (nwt, Nt, 128), head-lane-major
        outs.append((av * recip).astype(act_dtype))
    ost = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    if pack2:
        ost = ost.reshape(nw, N, Cp)
    o = (
        jnp.dot(mm(ost.reshape(nw * N, Cp)), mm(w_proj), precision=prec,
                preferred_element_type=jnp.float32)
        + b_proj
    ).reshape(nw, N, C)
    h1 = (xw.astype(jnp.float32) + o).astype(act_dtype)
    return h1.reshape(bb, tw, win, win, C).transpose(0, 2, 1, 3, 4).reshape(
        bb, win, cw, C
    )


def _strip_mlp(x, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, *, mm_dtype):
    """MLP half of _strip_block (per-token, so no window partition):
    LN2 -> fc1 -> gelu -> fc2 -> +x on (bb, win, cw, C) values."""
    bb, win_, cw, C = x.shape
    act_dtype = x.dtype
    n = bb * win_ * cw
    mm = lambda a: a.astype(mm_dtype)
    prec = HI if mm_dtype == jnp.float32 else None
    m = _ln(x, ln2_s, ln2_b).reshape(n, C)
    m = (
        jnp.dot(mm(m), mm(w_fc1), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc1
    )
    m = _gelu_exact(m).astype(act_dtype)
    m = (
        jnp.dot(mm(m), mm(w_fc2), precision=prec,
                preferred_element_type=jnp.float32)
        + b_fc2
    ).reshape(bb, win_, cw, C)
    return (x.astype(jnp.float32) + m).astype(act_dtype)


def _kernel(
    x_ref, mask_ref,
    w_qkv, b_qkv, w_proj, b_proj, bias_ref,
    ln1_s, ln1_b, ln2_s, ln2_b,
    w_fc1, b_fc1, w_fc2, b_fc2,
    out_ref,
    *, bb: int, tw: int, win: int, heads: int, use_mask: bool,
    hdp: int, mm_dtype, roll_w: int, fast_softmax: bool = False, pack2=None,
):
    x = x_ref[:]  # (bb, win, win*tw, C)
    if roll_w:
        # shifted blocks: the W-axis cyclic shift happens here in VMEM (the
        # instance sees the full width when tw == W//win); the H-axis roll
        # stays an XLA op outside (it crosses grid tiles). Left-roll by
        # roll_w == two slices + concat.
        x = jnp.concatenate([x[:, :, roll_w:], x[:, :, :roll_w]], axis=2)
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    out = _strip_block(
        x, mask, bias_ref[:],
        w_qkv[:], b_qkv[0], w_proj[:], b_proj[0],
        ln1_s[0], ln1_b[0], ln2_s[0], ln2_b[0],
        w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        win=win, heads=heads, hdp=hdp, mm_dtype=mm_dtype,
        fast_softmax=fast_softmax, pack2=pack2,
    )
    if roll_w:
        out = jnp.concatenate([out[:, :, -roll_w:], out[:, :, :-roll_w]], axis=2)
    out_ref[:] = out


def _prep_weights(p, C, num_heads, hdp, bias, wdtype=jnp.float32):
    """Pad/reshape one block's params into the kernel argument tuple.

    wdtype: storage dtype for the four matmul matrices (bfloat16 halves both
    VMEM footprint and weight DMA traffic; the kernel casts to mm_dtype
    anyway so passing bf16 when mm_dtype=bf16 is numerically identical).
    Biases/LN params stay f32. Order matches _kernel's weight refs.
    """
    hd = C // num_heads
    Cp = num_heads * hdp
    v1 = lambda a: jnp.asarray(a).reshape(1, -1)  # 1-D params as 2-D rows
    w_qkv = jnp.asarray(p["attn"]["qkv"]["kernel"])  # (C, 3C), cols [3][h][d]
    b_qkv = jnp.asarray(p["attn"]["qkv"]["bias"])
    w_proj = jnp.asarray(p["attn"]["proj"]["kernel"])  # (C, C), rows [h][d]
    if hdp != hd:
        pad = ((0, 0), (0, 0), (0, 0), (0, hdp - hd))
        w_qkv = jnp.pad(w_qkv.reshape(C, 3, num_heads, hd), pad).reshape(
            C, 3 * Cp
        )
        b_qkv = jnp.pad(
            b_qkv.reshape(3, num_heads, hd), pad[1:]
        ).reshape(3 * Cp)
        w_proj = jnp.pad(
            w_proj.reshape(num_heads, hd, C),
            ((0, 0), (0, hdp - hd), (0, 0)),
        ).reshape(Cp, C)
    return (
        w_qkv.astype(wdtype), b_qkv.reshape(1, -1),
        w_proj.astype(wdtype), v1(p["attn"]["proj"]["bias"]),
        bias,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(p["mlp"]["fc1"]["kernel"]).astype(wdtype),
        v1(p["mlp"]["fc1"]["bias"]),
        jnp.asarray(p["mlp"]["fc2"]["kernel"]).astype(wdtype),
        v1(p["mlp"]["fc2"]["bias"]),
    )


def fused_swin_block(
    x: jnp.ndarray,
    params: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    window: int = 8,
    num_heads: int,
    tw: Optional[int] = None,
    bb: Optional[int] = None,
    interpret: bool = False,
    pad_head_dim: bool = True,
    mm_dtype=jnp.float32,
    roll_w: int = 0,
    fast_softmax: bool = False,
    pack2=None,
) -> jnp.ndarray:
    """One swin block on spatial input x (B, H, W, C).

    params: flax SwinBlock param subtree (norm1/attn/norm2/mlp). bias:
    precomputed relative-position bias (heads, N, N). mask: shifted-window
    additive mask (nW, N, N) or None — the caller rolls x before/after.

    pad_head_dim: zero-pad each head's qkv columns (and proj rows) from
    head_dim to the next multiple of 32 so every in-kernel slice is
    lane-aligned (HTS-AT's head_dim is 24 at every stage — a 128-lane VPU
    pathology). Exact numerics: padded q/k columns are zero so logits are
    unchanged; padded v columns produce zeros that hit zero proj rows.
    mm_dtype: matmul input dtype (bfloat16 halves MXU passes; accumulation
    stays f32 via preferred_element_type — feature cosine vs f32 > 0.9999).
    roll_w: cyclic left-shift along W applied inside the kernel (and undone
    on the output) — for shifted blocks the caller then only rolls the H
    axis outside: jnp.roll(x, -s, axis=1); fused(..., roll_w=s); roll back.
    Requires tw == W//window (the default) so each instance sees full W.
    """
    B, H, W, C = x.shape
    win = window
    nwh, nww = H // win, W // win
    if tw is None:
        tw = min(nww, 8)
    assert nww % tw == 0
    if roll_w:
        assert tw == nww, "in-kernel W roll needs the full width per instance"
    N = win * win
    hd = C // num_heads
    hdp = ((hd + 31) // 32) * 32 if pad_head_dim else hd
    Cp = num_heads * hdp
    hidden = params["mlp"]["fc1"]["kernel"].shape[1]
    wbytes = 2 if mm_dtype == jnp.bfloat16 else 4
    abytes = jnp.dtype(x.dtype).itemsize
    if bb is None:
        # batch rows per kernel instance: amortizes weight DMAs across the
        # grid, bounded by the 16MB scoped-VMEM limit. Model (calibrated on
        # observed Mosaic stack sizes): per-instance activations + double-
        # buffered in/out tiles + one copy of the weights, kept <= 13MB.
        # bf16 activation flow (x.dtype == bfloat16) halves both the matmul-
        # feeding intermediates and the io tiles, roughly doubling bb.
        weights = (C * 3 * Cp + Cp * C + 2 * C * hidden) * wbytes
        act_row = tw * N * (
            (13 * C + 4 * Cp + hidden) * abytes + num_heads * N * 4
        )
        io_row = 4 * tw * N * C * abytes
        bb = ((13 << 20) - weights) // max(act_row + io_row, 1)
        bb = max(1, min(B, bb))
        while B % bb:
            bb -= 1
    assert B % bb == 0
    use_mask = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((nwh, nww // tw, tw, N, N), jnp.float32)
    else:
        mask_arr = mask.reshape(nwh, nww // tw, tw, N, N)

    args = (x, mask_arr) + _prep_weights(
        params, C, num_heads, hdp, bias, wdtype=mm_dtype
    )

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid = (B // bb, nwh, nww // tw)
    return pl.pallas_call(
        functools.partial(
            _kernel, bb=bb, tw=tw, win=win, heads=num_heads, use_mask=use_mask,
            hdp=hdp, mm_dtype=mm_dtype, roll_w=roll_w, fast_softmax=fast_softmax,
            pack2=pack2,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tw, N, N), lambda b, i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            full((C, 3 * Cp)), full((1, 3 * Cp)),
            full((Cp, C)), full((1, C)),
            full((num_heads, N, N)),
            full((1, C)), full((1, C)), full((1, C)), full((1, C)),
            full((C, hidden)), full((1, hidden)),
            full((hidden, C)), full((1, C)),
        ],
        out_specs=pl.BlockSpec(
            (bb, win, win * tw, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*args)


def _attn_half_kernel(
    x_ref, mask_ref,
    w_qkv, b_qkv, w_proj, b_proj, bias_ref, ln1_s, ln1_b,
    out_ref,
    *, bb: int, tw: int, win: int, heads: int, use_mask: bool,
    hdp: int, mm_dtype, roll_w: int, fast_softmax: bool = False, pack2=None,
):
    x = x_ref[:]
    if roll_w:
        x = jnp.concatenate([x[:, :, roll_w:], x[:, :, :roll_w]], axis=2)
    mask = jnp.tile(mask_ref[0, 0], (bb, 1, 1)) if use_mask else None
    out = _strip_attn(
        x, mask, bias_ref[:],
        w_qkv[:], b_qkv[0], w_proj[:], b_proj[0], ln1_s[0], ln1_b[0],
        win=win, heads=heads, hdp=hdp, mm_dtype=mm_dtype,
        fast_softmax=fast_softmax, pack2=pack2,
    )
    if roll_w:
        # un-rolling between the halves is exact: the MLP half is per-token,
        # so it commutes with the spatial cyclic shift
        out = jnp.concatenate([out[:, :, -roll_w:], out[:, :, :-roll_w]], axis=2)
    out_ref[:] = out


def _mlp_half_kernel(x_ref, ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2, out_ref,
                     *, mm_dtype):
    out_ref[:] = _strip_mlp(
        x_ref[:], ln2_s[0], ln2_b[0], w_fc1[:], b_fc1[0], w_fc2[:], b_fc2[0],
        mm_dtype=mm_dtype,
    )


def fused_swin_block_split(
    x: jnp.ndarray,
    params: dict,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    window: int = 8,
    num_heads: int,
    tw: Optional[int] = None,
    interpret: bool = False,
    pad_head_dim: bool = True,
    mm_dtype=jnp.float32,
    roll_w: int = 0,
    fast_softmax: bool = False,
    pack2=None,
) -> jnp.ndarray:
    """One swin block as a split (attention, MLP) kernel pair — for stages
    whose full-block weights exceed the VMEM budget (HTS-AT stage 4, C=768:
    qkv+proj ~4.7+1.6 MB bf16, fc1+fc2 ~9.4 MB — together past the 13 MB
    model that sizes fused_swin_block's bb). Two reads + two writes of x per
    block instead of one — still ~4x fewer HBM passes than the XLA block.
    Same contract and numerics as fused_swin_block (it runs the same
    _strip_attn/_strip_mlp bodies)."""
    B, H, W, C = x.shape
    win = window
    nwh, nww = H // win, W // win
    if tw is None:
        tw = min(nww, 8)
    assert nww % tw == 0
    if roll_w:
        assert tw == nww, "in-kernel W roll needs the full width per instance"
    N = win * win
    hd = C // num_heads
    hdp = ((hd + 31) // 32) * 32 if pad_head_dim else hd
    Cp = num_heads * hdp
    hidden = params["mlp"]["fc1"]["kernel"].shape[1]
    wbytes = 2 if mm_dtype == jnp.bfloat16 else 4
    abytes = jnp.dtype(x.dtype).itemsize

    weights = _prep_weights(params, C, num_heads, hdp, bias, wdtype=mm_dtype)
    w_attn = weights[:4] + (weights[4], weights[5], weights[6])
    w_mlp = weights[7:]

    def _bb(wb, act_row):
        io_row = 4 * tw * N * C * abytes
        b = ((13 << 20) - wb) // max(act_row + io_row, 1)
        b = max(1, min(B, b))
        while B % b:
            b -= 1
        return b

    attn_wbytes = (C * 3 * Cp + Cp * C) * wbytes
    attn_act_row = tw * N * (
        (9 * C + 4 * Cp) * abytes + num_heads * N * 4
    )
    bb_a = _bb(attn_wbytes, attn_act_row)
    mlp_wbytes = 2 * C * hidden * wbytes
    mlp_act_row = tw * N * ((6 * C + hidden) * abytes + hidden * 4)
    bb_m = _bb(mlp_wbytes, mlp_act_row)

    use_mask = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((nwh, nww // tw, tw, N, N), jnp.float32)
    else:
        mask_arr = mask.reshape(nwh, nww // tw, tw, N, N)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xspec = lambda b: pl.BlockSpec(
        (b, win, win * tw, C), lambda bi, i, j: (bi, i, j, 0),
        memory_space=pltpu.VMEM,
    )

    h1 = pl.pallas_call(
        functools.partial(
            _attn_half_kernel, bb=bb_a, tw=tw, win=win, heads=num_heads,
            use_mask=use_mask, hdp=hdp, mm_dtype=mm_dtype, roll_w=roll_w,
            fast_softmax=fast_softmax, pack2=pack2,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // bb_a, nwh, nww // tw),
        in_specs=[
            xspec(bb_a),
            pl.BlockSpec((1, 1, tw, N, N), lambda b, i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C, 3 * Cp)), full((1, 3 * Cp)),
            full((Cp, C)), full((1, C)),
            full((num_heads, N, N)),
            full((1, C)), full((1, C)),
        ],
        out_specs=xspec(bb_a),
        interpret=interpret,
    )(x, mask_arr, *w_attn[:4], w_attn[4], w_attn[5], w_attn[6])

    return pl.pallas_call(
        functools.partial(_mlp_half_kernel, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // bb_m, nwh, nww // tw),
        in_specs=[
            xspec(bb_m),
            full((1, C)), full((1, C)),
            full((C, hidden)), full((1, hidden)),
            full((hidden, C)), full((1, C)),
        ],
        out_specs=xspec(bb_m),
        interpret=interpret,
    )(h1, *w_mlp)


# ---------------------------------------------------------------------------
# Block-PAIR fusion: (regular, shifted) swin blocks + both cyclic rolls in one
# kernel. Ablation (bench/kernel_ablate.py) shows the single-block kernel runs
# at the HBM-bandwidth floor (cost == a pure copy of x), so the only remaining
# lever is fewer HBM passes: per pair, XLA does ~8 passes over x (2 kernel
# read/writes + 2 two-pass H-rolls); the pair kernel does exactly 2 (one read,
# one write) with the intermediate held in a VMEM scratch map. The H/W cyclic
# shifts degenerate into STATIC strip offsets: the shifted block's tile (i, j)
# reads scratch rows [i*win+s, i*win+win+s) mod H and cols [j*cw+s, ...) mod W
# — wraparound tiles are 2-4 static slices concatenated, no rolled copy ever
# materializes.
# ---------------------------------------------------------------------------


def _read_tile(ref, r0, nr, c0, nc, H, W):
    """Rows [r0, r0+nr) mod H x cols [c0, c0+nc) mod W from (bb, H, W, C)."""
    rparts = [(r0, min(nr, H - r0))]
    if r0 + nr > H:
        rparts.append((0, r0 + nr - H))
    cparts = [(c0, min(nc, W - c0))]
    if c0 + nc > W:
        cparts.append((0, c0 + nc - W))
    rows = []
    for rs, rl in rparts:
        cols = [ref[:, rs : rs + rl, cs : cs + cl, :] for cs, cl in cparts]
        rows.append(cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=2))
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=1)


def _write_tile(ref, val, r0, c0, H, W):
    """Write val (bb, nr, nc, C) to rows [r0, r0+nr) mod H, cols mod W."""
    nr, nc = val.shape[1], val.shape[2]
    rparts = [(r0, 0, min(nr, H - r0))]
    if r0 + nr > H:
        rparts.append((0, H - r0, r0 + nr - H))
    cparts = [(c0, 0, min(nc, W - c0))]
    if c0 + nc > W:
        cparts.append((0, W - c0, c0 + nc - W))
    for rs, vr, rl in rparts:
        for cs, vc, cl in cparts:
            ref[:, rs : rs + rl, cs : cs + cl, :] = val[
                :, vr : vr + rl, vc : vc + cl, :
            ]


def _pair_kernel(
    x_ref, mask_ref,
    a_qkv, a_bqkv, a_proj, a_bproj, a_bias, a_l1s, a_l1b, a_l2s, a_l2b,
    a_f1, a_bf1, a_f2, a_bf2,
    b_qkv, b_bqkv, b_proj, b_bproj, b_bias, b_l1s, b_l1b, b_l2s, b_l2b,
    b_f1, b_bf1, b_f2, b_bf2,
    out_ref, scr,
    *, bb: int, win: int, heads: int, hdp: int, mm_dtype, shift: int, cw: int,
    fast_softmax: bool = False, pack2=None,
):
    H, W = x_ref.shape[1], x_ref.shape[2]
    nwh = H // win
    twc = cw // win
    nj = W // cw
    kw = dict(win=win, heads=heads, hdp=hdp, mm_dtype=mm_dtype,
              fast_softmax=fast_softmax, pack2=pack2)
    wA = (a_qkv[:], a_bqkv[0], a_proj[:], a_bproj[0], a_l1s[0], a_l1b[0],
          a_l2s[0], a_l2b[0], a_f1[:], a_bf1[0], a_f2[:], a_bf2[0])
    wB = (b_qkv[:], b_bqkv[0], b_proj[:], b_bproj[0], b_l1s[0], b_l1b[0],
          b_l2s[0], b_l2b[0], b_f1[:], b_bf1[0], b_f2[:], b_bf2[0])
    # Block A (no shift): tile over whole windows, x -> scratch (stays VMEM)
    for i in range(nwh):
        for j in range(nj):
            xs = x_ref[:, i * win : (i + 1) * win, j * cw : (j + 1) * cw, :]
            scr[:, i * win : (i + 1) * win, j * cw : (j + 1) * cw, :] = (
                _strip_block(xs, None, a_bias[:], *wA, **kw)
            )
    # Block B (shift s): the roll is a static tile offset; mask row i matches
    # rolled window-row i because scratch rows [i*win+s, ...) ARE rolled rows
    # [i*win, ...).
    for i in range(nwh):
        r0 = i * win + shift
        for j in range(nj):
            c0 = (j * cw + shift) % W
            xs = _read_tile(scr, r0, win, c0, cw, H, W)
            m = jnp.tile(mask_ref[i, j * twc : (j + 1) * twc, :, :], (bb, 1, 1))
            y = _strip_block(xs, m, b_bias[:], *wB, **kw)
            _write_tile(out_ref, y, r0, c0, H, W)


def pair_plan(B, H, W, C, heads, hidden, mm_dtype, window=8,
              budget=(14 << 20), act_dtype=jnp.float32):
    """(bb, cw) if the pair kernel fits scoped VMEM for these dims, else None.

    Same calibrated per-token activation model as fused_swin_block's bb
    heuristic; the per-row fixed cost is 5 full maps (double-buffered in/out
    + scratch). cw shrinks (fewer tokens in flight) before giving up.
    act_dtype: storage dtype of the activation maps/intermediates (bf16
    halves maps_row and most of act_row, roughly doubling bb).
    """
    hd = C // heads
    hdp = ((hd + 31) // 32) * 32
    Cp = heads * hdp
    N = window * window
    wbytes = 2 if mm_dtype == jnp.bfloat16 else 4
    abytes = jnp.dtype(act_dtype).itemsize
    weights = 2 * (C * 3 * Cp + Cp * C + C * hidden + hidden * C) * wbytes
    fixed = weights + 2 * heads * N * N * 4 + (H // window) * (W // window) * N * N * 4
    maps_row = 5 * H * W * C * abytes
    for cw in (W, W // 2, W // 4):
        if cw < window or W % cw or cw % window:
            continue
        act_row = window * cw * (
            (13 * C + 4 * Cp + hidden) * abytes + heads * N * 4
        )
        bb = (budget - fixed) // (act_row + maps_row)
        if bb >= 1:
            bb = min(B, bb)
            while B % bb:
                bb -= 1
            return bb, cw
    return None


def fused_swin_pair(
    x: jnp.ndarray,
    params_a: dict,
    params_b: dict,
    bias_a: jnp.ndarray,
    bias_b: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    window: int = 8,
    num_heads: int,
    shift: int,
    bb: Optional[int] = None,
    cw: Optional[int] = None,
    interpret: bool = False,
    pad_head_dim: bool = True,
    mm_dtype=jnp.float32,
    fast_softmax: bool = False,
    pack2=None,
) -> jnp.ndarray:
    """(regular block a, shifted block b) on spatial x (B, H, W, C), fused.

    Equivalent to: fused_swin_block(x, params_a, ...) then roll(-s, -s),
    fused_swin_block(., params_b, mask, ...), roll(+s, +s) — but with ONE
    HBM read and ONE write of x total. mask is the shifted-window additive
    mask (nW, N, N) for block b (required: shift > 0).
    """
    B, H, W, C = x.shape
    assert shift > 0 and mask is not None
    win = window
    nwh, nww = H // win, W // win
    N = win * win
    hd = C // num_heads
    hdp = ((hd + 31) // 32) * 32 if pad_head_dim else hd
    hidden = params_a["mlp"]["fc1"]["kernel"].shape[1]
    if bb is None or cw is None:
        plan = pair_plan(B, H, W, C, num_heads, hidden, mm_dtype, win,
                         act_dtype=x.dtype)
        assert plan is not None, "pair kernel does not fit VMEM for these dims"
        bb = bb if bb is not None else plan[0]
        cw = cw if cw is not None else plan[1]
    assert B % bb == 0 and W % cw == 0 and cw % win == 0
    wdtype = mm_dtype  # bf16 weights in HBM when the matmuls are bf16 anyway
    args = (
        x,
        mask.reshape(nwh, nww, N, N),
        *_prep_weights(params_a, C, num_heads, hdp, bias_a, wdtype),
        *_prep_weights(params_b, C, num_heads, hdp, bias_b, wdtype),
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    wspecs = [full(a.shape) for a in args[2:]]
    return pl.pallas_call(
        functools.partial(
            _pair_kernel, bb=bb, win=win, heads=num_heads, hdp=hdp,
            mm_dtype=mm_dtype, shift=shift, cw=cw, fast_softmax=fast_softmax,
            pack2=pack2,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            full((nwh, nww, N, N)),
        ] + wspecs,
        out_specs=pl.BlockSpec(
            (bb, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bb, H, W, C), x.dtype)],
        interpret=interpret,
    )(*args)
