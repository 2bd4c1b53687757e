"""Does bf16 fused extraction change LP quality? Extract features from a
synthetic 2-class corpus with the f32 XLA path and the fused bf16 path, train
identical linear probes (5 seeds), compare AUROC."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, sys, wave, tempfile
import numpy as np

d = tempfile.mkdtemp()
r = np.random.default_rng(7)
paths, labels = [], []
N = 160
for i in range(N):
    cls = i % 2
    sec = float(r.uniform(6, 12))
    t = np.arange(int(sec * 16000)) / 16000
    # class-dependent spectral tilt + noise; not trivially separable
    f0 = 70 + 10 * cls + r.normal(0, 6)
    x = (0.25 * np.sin(2 * np.pi * f0 * t)
         + 0.12 * np.sin(2 * np.pi * (2.1 * f0) * t + r.uniform(0, 6))
         + 0.22 * r.standard_normal(len(t)))
    x = np.clip(x, -1, 1)
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    p = os.path.join(d, f"c{i}.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    paths.append(p); labels.append(cls)
labels = np.array(labels)

import jax.numpy as jnp
from heart_murmur_detection_tpu.extract.extract import FeatureExtractor
from heart_murmur_detection_tpu.train.linear_eval import train_linear_head

feats = {}
for tag, kw in (
    ("f32_xla", dict(use_fused_htsat=False)),
    ("bf16_fused", dict(use_fused_htsat=True, compute_dtype=jnp.bfloat16)),
):
    fe = FeatureExtractor("operaCT", dim=768, input_sec=8, batch_size=32,
                          random_init=True, **kw)
    feats[tag] = fe.extract_files(paths)
    print(tag, "done", feats[tag].shape, flush=True)

a, b = feats["f32_xla"], feats["bf16_fused"]
cos = np.sum(a*b,-1)/(np.linalg.norm(a,axis=-1)*np.linalg.norm(b,axis=-1))
print(f"feature cosine: min={cos.min():.6f} mean={cos.mean():.6f}")

idx = np.arange(N)
rs = np.random.default_rng(0); rs.shuffle(idx)
tr, va, te = idx[:96], idx[96:128], idx[128:]
for tag, F in feats.items():
    aucs = []
    for seed in range(5):
        res = train_linear_head(
            F[tr], labels[tr], F[va], labels[va], F[te], labels[te],
            n_cls=2, epochs=32, seed=seed, metrics=("macro_auroc",))
        aucs.append(res.metrics["macro_auroc"])
    print(f"{tag}: AUROC {np.mean(aucs):.4f} +/- {np.std(aucs):.4f}")
