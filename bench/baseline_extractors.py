"""End-to-end (disk -> feature) throughput of the baseline extractors
(HeAR, CLAP-2022/2023, VGGish) with random-init weights and synthetic WAVs —
the production path incl. host decode + async-dispatch pipelining.

Usage: N_CLIPS=64 python bench/baseline_extractors.py [hear|clap|clap2023|vggish ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, sys, tempfile, time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.utils.audio_io import write_wav

N_CLIPS = int(os.environ.get("N_CLIPS", 64))
SR = 16000
r = np.random.default_rng(0)
cpu = jax.devices("cpu")[0]

d = tempfile.mkdtemp(prefix="baseline_bench_")
paths = []
for i in range(N_CLIPS):
    sec = [3.0, 6.0, 9.0, 12.0][i % 4]
    y = (
        0.3 * np.sin(2 * np.pi * (60 + i) * np.arange(int(sec * SR)) / SR)
        + 0.02 * r.standard_normal(int(sec * SR))
    ).astype(np.float32)
    p = os.path.join(d, f"clip{i}.wav")
    write_wav(p, y, SR)
    paths.append(p)


def run(name, fn):
    t0 = time.time()
    f = fn(paths)  # cold: includes compile
    cold = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        f = fn(paths)
        best = min(best, time.time() - t0)
    print(
        f"{name:10s} {f.shape} warm {best:6.2f}s = {N_CLIPS / best:7.1f} clips/s"
        f"  (cold {cold:.1f}s)",
        flush=True,
    )


which = sys.argv[1:] or ["hear", "clap2023", "clap", "vggish"]
if "hear" in which:
    from heart_murmur_detection_tpu.models.hear import HeAREncoder, extract_hear_feature

    with jax.default_device(cpu):
        hv = HeAREncoder().init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)))
    run("hear", lambda p: extract_hear_feature(p, variables=hv))
if "clap2023" in which or "clap" in which:
    from heart_murmur_detection_tpu.models.clap import (
        CLAPAudioEncoder,
        CLAPConfig,
        extract_clap_feature,
    )

    def clap_vars(version):
        cfg = CLAPConfig(version=version)
        n = int(cfg.duration * cfg.sample_rate)
        n = (n + cfg.hop - 1) // cfg.hop * cfg.hop
        with jax.default_device(cpu):
            return CLAPAudioEncoder(cfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, n)), jnp.full((1,), n, jnp.int32)
            )

    if "clap2023" in which:
        cv23 = clap_vars("2023")
        run("clap2023", lambda p: extract_clap_feature(p, version="2023", variables=cv23))
    if "clap" in which:
        cv22 = clap_vars("2022")
        run("clap2022", lambda p: extract_clap_feature(p, version="2022", variables=cv22))
if "vggish" in which:
    from heart_murmur_detection_tpu.models.vggish import VGGish, extract_vgg_feature

    with jax.default_device(cpu):
        vv = VGGish().init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64)))
    run("vggish", lambda p: extract_vgg_feature(p, variables=vv))
