"""TPU streaming throughput for each wire format / source-rate combo."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.cola import Cola
from heart_murmur_detection_tpu.ops.resample import resample_poly_device

SR = 16000
CLIP_SEC = 10.0
B = 64
N = 512
model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)


def make_fn(wire_fmt, up):
    @jax.jit
    def fn(wav, lengths):
        w = wire.decode_device(wav, wire_fmt)
        if up != 1:
            w = resample_poly_device(w, up)
            lengths = lengths * up
        mel, nf = dsp.mel_frontend(w, lengths)
        return model.apply(variables, mel, 768, nf, method=Cola.extract_feature)

    return fn


r = np.random.default_rng(0)
import os, sys
_variants = {"f32": [("f32", SR)], "i16": [("int16", SR)], "mu": [("mulaw", SR)], "i16s": [("int16", 4000)], "mus": [("mulaw", 4000)]}
for wire_fmt, src_sr in _variants[os.environ.get("VAR", "a")]:
    up = SR // src_sr
    clips = [
        (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(CLIP_SEC * src_sr)) / src_sr)
         + 0.05 * r.standard_normal(int(CLIP_SEC * src_sr))).astype(np.float32)
        for _ in range(B)
    ]
    mult = 512 // up
    max_len = ((int(CLIP_SEC * src_sr) + mult - 1) // mult) * mult
    fn = make_fn(wire_fmt, up)
    wav, lengths = dsp.pad_batch(clips, pad_to_multiple=mult, max_len=max_len)
    lenj = jnp.asarray(lengths)
    w0 = wire.encode_np(wav, wire_fmt)
    np.asarray(fn(jnp.asarray(w0), lenj))  # warm

    # device-resident compute time
    wj = jnp.asarray(w0)
    t0 = time.time()
    for _ in range(8):
        out = fn(wj, lenj)
    out.block_until_ready()
    comp = (time.time() - t0) / 8 * 1000

    # streaming (one-deep pipeline, fresh pack each batch)
    t0 = time.time()
    n = 0
    pending = None
    while n < N:
        wav, _ = dsp.pad_batch(clips, pad_to_multiple=mult, max_len=max_len)
        fut = fn(jnp.asarray(wire.encode_np(wav, wire_fmt)), lenj)
        if pending is not None:
            np.asarray(pending)
        pending = fut
        n += B
    np.asarray(pending)
    dt = time.time() - t0
    print(f"{wire_fmt:5s}@{src_sr}: {w0.nbytes/1e6:5.1f} MB/batch  "
          f"compute={comp:6.1f} ms  streaming={n/dt:7.1f} clips/s ({1000*dt/(n//B):.0f} ms/batch)")
