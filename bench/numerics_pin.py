"""TPU-side numerics pin for the fused bf16 production extractors.

The CPU test suite pins the exact-f32 harness; this pins what actually ships
on the chip: fixed-seed synthetic clips through the PRODUCTION extractor for
each fused tower (fused Pallas kernels, bf16 matmuls, fast_softmax with
normalize-after-av), asserting feature cosine >= 0.99999 against the exact
f32 XLA graph computed in the same process with the same weights — the
manual cosine gates from RESULTS.md as a repeatable check. bench.py runs it
as a prologue so every BENCH_r*.json re-proves the numerics (round-4 weak
#5); a fused-kernel regression fails the bench, not a future reader's
eyeball.

Standalone: `python bench/numerics_pin.py` prints per-tower cosines.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

TOWERS = (
    # (pretrain, dim, input_sec, clip_sec)
    ("operaCT", 768, 8.0, 10.0),
    ("operaGT", 384, 8.18, 8.18),
    ("audiomae", 768, 10.0, 10.0),
)
BAR = 0.99999


def _cos(a, b):
    a = a.ravel().astype(np.float64)
    b = b.ravel().astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def frontend_precision_pin(tol: float = 2e-4) -> dict:
    """Pin the bf16-path frontend precision policy: logmel_frontend_general
    and hear_preprocess at Precision.HIGH (bf16x3 DFT/mel passes — the
    production bf16 extraction default) must track their HIGHEST output
    within `tol` of the output RANGE (log-mel values cross zero, so
    pointwise relative error is meaningless there; measured on hardware:
    ~4e-5 of range for the 44.1 kHz logmel, ~2e-5 for hear mel-PCEN).
    Guards against an XLA change silently widening the gap (ADVICE round 4,
    models/clap.py:113). Returns the measured range-normalized errors."""
    import jax
    import jax.numpy as jnp

    from heart_murmur_detection_tpu.audio.dsp import logmel_frontend_general
    from heart_murmur_detection_tpu.audio.hear_frontend import hear_preprocess

    r = np.random.default_rng(11)
    out = {}

    wav = jnp.asarray(r.standard_normal((4, 308800)).astype(np.float32) * 0.3)
    lens = jnp.full((4,), 308800, jnp.int32)

    @jax.jit
    def lm(w, l):
        hi, _ = logmel_frontend_general(
            w, l, precision=jax.lax.Precision.HIGH
        )
        ex, _ = logmel_frontend_general(
            w, l, precision=jax.lax.Precision.HIGHEST
        )
        return hi, ex

    hi, ex = (np.asarray(a) for a in lm(wav, lens))
    err = float(np.abs(hi - ex).max() / (ex.max() - ex.min()))
    assert err < tol, f"logmel_frontend_general HIGH drifted: {err:.2e}"
    out["logmel_general_range_err"] = round(err, 9)

    w2 = jnp.asarray(r.standard_normal((4, 32000)).astype(np.float32) * 0.3)

    @jax.jit
    def hp(w):
        return (
            hear_preprocess(w, precision=jax.lax.Precision.HIGH),
            hear_preprocess(w, precision=jax.lax.Precision.HIGHEST),
        )

    hi, ex = (np.asarray(a) for a in hp(w2))
    err = float(np.abs(hi - ex).max() / (ex.max() - ex.min()))
    assert err < tol, f"hear_preprocess HIGH drifted: {err:.2e}"
    out["hear_preprocess_range_err"] = round(err, 9)
    return out


def baseline_tower_pin(bar: float = BAR, hear_bar: float = 0.9999) -> dict:
    """Fused-vs-exact cosine for the baseline towers not routed through
    FeatureExtractor: HeAR (hear_forward_fused) and CLAP-2023
    (clap_audio_forward_fused), both with fast_softmax — the production
    serving paths (models/{hear,clap}.extract_*). HeAR's bar is its own
    documented class (~0.99995 measured): 24 ViT-L blocks accumulate more
    bf16/Mosaic-transcendental delta than the 12-block towers, consistent
    since round 3 (RESULTS.md)."""
    import jax
    import jax.numpy as jnp

    from heart_murmur_detection_tpu.models.clap import (
        CLAPAudioEncoder, CLAPConfig, clap_audio_forward_fused,
    )
    from heart_murmur_detection_tpu.models.hear import HeAREncoder
    from heart_murmur_detection_tpu.models.vit_fused import hear_forward_fused

    r = np.random.default_rng(9)
    out = {}
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    hm = HeAREncoder()
    with jax.default_device(cpu):
        hv = hm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)))
    hv = jax.device_put(hv, dev)
    hw = jnp.asarray(r.standard_normal((8, 32000)).astype(np.float32) * 0.1)
    prod = np.asarray(
        jax.jit(
            lambda v, w: hear_forward_fused(v, w, hm.config, fast_softmax=True)
        )(hv, hw)
    )
    exact = np.asarray(jax.jit(lambda v, w: hm.apply(v, w)["pooled"])(hv, hw))
    c = _cos(prod, exact)
    assert np.isfinite(prod).all() and c >= hear_bar, f"hear cosine {c:.7f}"
    out["hear"] = round(c, 7)

    ccfg = CLAPConfig(version="2023")
    cm = CLAPAudioEncoder(ccfg)
    n = int(ccfg.duration * ccfg.sample_rate)
    n = (n + ccfg.hop - 1) // ccfg.hop * ccfg.hop
    with jax.default_device(cpu):
        cv = cm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n)), jnp.full((1,), n, jnp.int32)
        )
    cv = jax.device_put(cv, dev)
    cw = jnp.asarray(r.standard_normal((8, n)).astype(np.float32) * 0.1)
    cl = jnp.full((8,), n, jnp.int32)
    prod = np.asarray(
        jax.jit(
            lambda v, w, l: clap_audio_forward_fused(
                v, w, l, ccfg, fast_softmax=True
            )
        )(cv, cw, cl)
    )
    exact = np.asarray(jax.jit(lambda v, w, l: cm.apply(v, w, l))(cv, cw, cl))
    c = _cos(prod, exact)
    assert np.isfinite(prod).all() and c >= bar, f"clap2023 cosine {c:.7f}"
    out["clap2023"] = round(c, 7)
    return out


def run_pin(batch: int = 16, bar: float = BAR, towers=TOWERS) -> dict:
    """Returns {tower: cosine}; raises AssertionError if any tower is below
    `bar` or produces non-finite features."""
    import jax
    import jax.numpy as jnp

    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    r = np.random.default_rng(7)
    out = {}
    for name, dim, isec, csec in towers:
        n = int(csec * 16000)
        clips = [
            (0.3 * np.sin(2 * np.pi * (60 + 7 * i) * np.arange(n) / 16000)
             + 0.05 * r.standard_normal(n)).astype(np.float32)
            for i in range(batch)
        ]
        fe = FeatureExtractor(
            name, dim=dim, input_sec=isec, batch_size=batch, random_init=True
        )
        if name == "audiomae":
            f_prod = fe.extract_chunk_waveforms(list(clips))
        else:
            f_prod = fe.extract_waveforms(list(clips), max_len=n)
        fx = FeatureExtractor(
            name, dim=dim, input_sec=isec, batch_size=batch, random_init=True,
            use_fused_htsat=False, use_fused_vit=False,
            compute_dtype=jnp.float32, fast_softmax=False,
        )
        fx.variables = jax.device_put(
            jax.device_get(fe.variables), jax.devices()[0]
        )
        fx._fn = fx._build()
        if name == "audiomae":
            f_exact = fx.extract_chunk_waveforms(list(clips))
        else:
            f_exact = fx.extract_waveforms(list(clips), max_len=n)
        c = _cos(f_prod, f_exact)
        assert np.isfinite(f_prod).all(), f"{name}: non-finite features"
        assert c >= bar, (
            f"{name}: fused-vs-exact cosine {c:.7f} below the {bar} bar — "
            "fused-kernel numerics regression"
        )
        out[name] = round(c, 7)
    return out


if __name__ == "__main__":
    for k, v in run_pin().items():
        print(f"{k:9s} cosine={v:.7f}")
    for k, v in baseline_tower_pin().items():
        print(f"{k:9s} cosine={v:.7f}")
    for k, v in frontend_precision_pin().items():
        print(f"{k}={v:.2e}")  # range-normalized
