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
