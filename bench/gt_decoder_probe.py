"""Decoder-only ablation at GT production geometry: where do the ~500 ms of
full_step_dopt go? Variants of the packed-window swin-v2-cr block
(models/mae_decoder_opt), each timed as decoder-only fwd+bwd:

  full      the shipped swin_v2_cr_block_opt
  noattn    qk/softmax/av replaced by identity (keeps qkv+proj dense) —
            isolates the attention chain
  nonorm    cosine normalize skipped (plain dot-product attention) —
            isolates the per-head normalize passes
  lanenorm  normalize computed on the (inst, GN, C) full-lane layout before
            the head split (the padded (.., hd=16) elementwise passes are
            the suspected cost)

Usage: [B=64] python -u bench/gt_decoder_probe.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.models.mae_decoder_opt import (
    _dense, _ln, _meta_bias, _pack_mask_np,
)
from heart_murmur_detection_tpu.models.vit_mae import (
    MaskedAutoencoderViT, mae_vit_small_config,
)

B = int(os.environ.get("B", 64))
cfg = mae_vit_small_config()
model = MaskedAutoencoderViT(cfg)
rng = jax.random.PRNGKey(0)
with jax.default_device(jax.devices("cpu")[0]):
    variables = model.init(rng, jnp.zeros((1,) + cfg.img_size), rng=rng)
params = jax.device_put(variables["params"], jax.devices()[0])
H, W = cfg.grid
C, nh = cfg.decoder_embed_dim, cfg.decoder_num_heads
hd = C // nh
window, shifts = cfg.decoder_window, cfg.decoder_shift
r = np.random.default_rng(0)
x0 = jax.device_put(
    jnp.asarray(r.standard_normal((B, H * W, C)), jnp.float32), jax.devices()[0]
)
mm = lambda a: a.astype(jnp.bfloat16)


def block(x, p, shift, variant):
    Bx, L, Cx = x.shape
    wh, ww = window
    sh, sw = shift
    N = wh * ww
    nW = (H // wh) * (W // ww)
    G = 128 // N
    h = x.reshape(Bx, H, W, Cx)
    if sh or sw:
        h = jnp.roll(h, (-sh, -sw), axis=(1, 2))
    hw = (
        h.reshape(Bx, H // wh, wh, W // ww, ww, Cx)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(Bx * nW // G, G * N, Cx)
    )
    qkv = _dense(hw, p["attn"]["qkv"], mm)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    inst = Bx * nW // G

    if variant == "noattn":
        o = q[..., :Cx]
    elif variant in ("bdims", "bdims_nonorm"):
        # no head-concat relayouts: reshape lanes (C -> nh, hd) and batch the
        # dot_general over (instance, head)
        q4 = q.reshape(inst, G * N, nh, hd)
        k4 = k.reshape(inst, G * N, nh, hd)
        v4 = v.reshape(inst, G * N, nh, hd)
        if variant == "bdims":
            tau = jnp.clip(p["attn"]["tau"], 0.01, None)
            qn = jnp.sqrt(jnp.sum(q4 * q4, -1, keepdims=True))
            kn = jnp.sqrt(jnp.sum(k4 * k4, -1, keepdims=True))
            q4 = q4 / jnp.maximum(qn, 1e-3) / tau[None, None, :, None]
            k4 = k4 / jnp.maximum(kn, 1e-3)
        s = jax.lax.dot_general(
            mm(q4), mm(k4),
            dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # (inst, nh, GN, GN)
        bias = _meta_bias(p["attn"], (wh, ww), nh)
        eye = jnp.asarray(np.eye(G, dtype=np.float32))
        bd_bias = jnp.einsum("gh,nij->ngihj", eye, bias).reshape(nh, G * N, G * N)
        bd_mask = jnp.asarray(_pack_mask_np(H, W, (wh, ww), (sh, sw), G))
        nWg = nW // G
        s = (
            s.reshape(Bx, nWg, nh, G * N, G * N)
            + bd_bias[None, None] + bd_mask[None, :, None]
        ).reshape(inst, nh, G * N, G * N)
        s = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            mm(s), mm(v4),
            dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32,
        )  # (inst, nh, GN, hd)
        o = o.transpose(0, 2, 1, 3).reshape(inst, G * N, Cx)
    else:
        if variant == "lanenorm":
            tau = jnp.clip(p["attn"]["tau"], 0.01, None)
            qn2 = (q * q).reshape(inst, G * N, nh, hd).sum(-1)
            kn2 = (k * k).reshape(inst, G * N, nh, hd).sum(-1)
            sq = (1.0 / jnp.maximum(jnp.sqrt(qn2), 1e-3)) / tau
            sk = 1.0 / jnp.maximum(jnp.sqrt(kn2), 1e-3)
            q = q * jnp.repeat(sq, hd, axis=-1)
            k = k * jnp.repeat(sk, hd, axis=-1)

        def heads(t):
            return jnp.concatenate(
                [t[:, :, i * hd:(i + 1) * hd] for i in range(nh)], axis=0
            )

        q, k, v = heads(q), heads(k), heads(v)
        if variant == "full":
            qn = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
            kn = jnp.sqrt(jnp.sum(k * k, -1, keepdims=True))
            tau = jnp.clip(p["attn"]["tau"], 0.01, None)
            inv_tau = jnp.repeat(1.0 / tau, inst)[:, None, None]
            q = q / jnp.maximum(qn, 1e-3) * inv_tau
            k = k / jnp.maximum(kn, 1e-3)
        s = jax.lax.dot_general(
            mm(q), mm(k), dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        bias = _meta_bias(p["attn"], (wh, ww), nh)
        eye = jnp.asarray(np.eye(G, dtype=np.float32))
        bd_bias = jnp.einsum("gh,nij->ngihj", eye, bias).reshape(nh, G * N, G * N)
        bd_mask = jnp.asarray(_pack_mask_np(H, W, (wh, ww), (sh, sw), G))
        add = bd_bias[:, None, None] + bd_mask[None, None]
        s = (s.reshape(nh, Bx, nW // G, G * N, G * N) + add).reshape(s.shape)
        s = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            mm(s), mm(v), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o = jnp.concatenate(
            [o[i * inst:(i + 1) * inst] for i in range(nh)], axis=-1
        )
    o = _dense(o, p["attn"]["proj"], mm)
    h = (
        o.reshape(Bx, H // wh, W // ww, wh, ww, Cx)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(Bx, H, W, Cx)
    )
    if sh or sw:
        h = jnp.roll(h, (sh, sw), axis=(1, 2))
    x = x + _ln(h.reshape(Bx, L, Cx), p["norm1"])
    m = _dense(x, p["mlp_fc1"], mm)
    m = jax.nn.gelu(m, approximate=False)
    m = _dense(m, p["mlp_fc2"], mm)
    return x + _ln(m, p["norm2"])


def make(variant):
    def dec(p, x):
        h = x
        for i in range(cfg.decoder_depth):
            h = block(h, p[f"decoder_blocks_{i}"], (0, 0) if i % 2 == 0 else shifts, variant)
        return (h.astype(jnp.float32) ** 2).mean()

    @jax.jit
    def f(p, x):
        l, g = jax.value_and_grad(dec)(p, x)
        return l + jax.tree.reduce(
            lambda a, q: a + q.sum().astype(jnp.float32), g, jnp.float32(0)
        )
    return f


best = {}
fns = {v: make(v) for v in ("full", "noattn", "bdims", "bdims_nonorm")}
for v, f in fns.items():
    t0 = time.time()
    np.asarray(f(params, x0))
    print(f"{v} compile+1 {time.time()-t0:.1f}s", flush=True)
for rd in range(5):
    for v, f in fns.items():
        t0 = time.time()
        for _ in range(3):
            y = f(params, x0)
        np.asarray(y)
        best[v] = min(best.get(v, 1e9), (time.time() - t0) / 3 * 1000)
    print(f"round {rd}: " + " ".join(f"{k}={t:.1f}ms" for k, t in best.items()), flush=True)
