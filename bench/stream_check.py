"""Same-process A/B of streaming ingest strategies on the real link:
(a) the current one-deep pipeline (pack -> jnp.asarray -> dispatch, sync-1),
(b) threaded feeder: worker thread packs + device_puts DEPTH batches ahead,
(c) same with 2 worker threads (pack parallelism).

Target metric: bench.py's streaming_clips_per_sec_int16_4k_src (int16 @ 4 kHz
source rate, device polyphase upsample). Link bound at ~50 MB/s is ~625
clips/s for 10 s clips at batch 256.

Usage: [BATCH=256] [N_CLIPS=1024] python bench/stream_check.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from heart_murmur_detection_tpu.audio import dsp, wire
from heart_murmur_detection_tpu.extract import registry
from heart_murmur_detection_tpu.models.htsat import HTSATConfig
from heart_murmur_detection_tpu.models.htsat_fused import htsat_apply_fused
from heart_murmur_detection_tpu.ops.resample import resample_poly_device

SR = 16000
CLIP_SEC = 10.0
BATCH = int(os.environ.get("BATCH", 256))
N_CLIPS = int(os.environ.get("N_CLIPS", 1024))

r = np.random.default_rng(0)
clips = [
    (0.3 * np.sin(2 * np.pi * 80 * np.arange(int(CLIP_SEC * SR)) / SR)
     + 0.05 * r.standard_normal(int(CLIP_SEC * SR))).astype(np.float32)
    for _ in range(BATCH)
]
clips4k = [c[::4].copy() for c in clips]
max_len = ((int(CLIP_SEC * SR) + 511) // 512) * 512
max_len4 = max_len // 4

model, variables = registry.initialize_pretrained_model("operaCT", random_init=True)
enc_vars = {
    "params": variables["params"]["encoder"],
    "batch_stats": variables["batch_stats"]["encoder"],
}
dev = jax.devices()[0]


WIRE = os.environ.get("WIRE", "int16")  # int16 | mulaw (1 B/sample, ~38 dB)


@jax.jit
def batched_4k(wavw, lengths):
    w = resample_poly_device(wire.decode_device(wavw, WIRE), 4)
    mel, nf = dsp.mel_frontend(w, lengths * 4, precision=jax.lax.Precision.HIGH)
    return htsat_apply_fused(enc_vars, mel, nf, HTSATConfig(), mm_dtype=jnp.bfloat16)


len4 = np.full((BATCH,), max_len4, np.int32)
len4j = jax.device_put(jnp.asarray(len4), dev)


def pack():
    w4, _ = dsp.pad_batch(clips4k, pad_to_multiple=128, max_len=max_len4)
    return wire.encode_np(w4, WIRE)


w0 = pack()
np.asarray(batched_4k(jax.device_put(w0, dev), len4j))  # compile+warm

n_batches = (N_CLIPS + BATCH - 1) // BATCH


def run_current():
    t0 = time.time()
    pending = None
    for _ in range(n_batches):
        w = pack()
        fut = batched_4k(jnp.asarray(w), len4j)
        if pending is not None:
            np.asarray(pending)
        pending = fut
    np.asarray(pending)
    return n_batches * BATCH / (time.time() - t0)


def run_feeder(depth, workers=1):
    q = queue.Queue(maxsize=depth)
    stop = object()

    def worker(k):
        for i in range(k, n_batches, workers):
            w = pack()
            arr = jax.device_put(w, dev)  # async H2D begins here
            q.put((i, arr))

    ths = [threading.Thread(target=worker, args=(k,), daemon=True)
           for k in range(workers)]
    t0 = time.time()
    for th in ths:
        th.start()
    pending = None
    got = 0
    buf = {}
    nxt = 0
    while got < n_batches:
        i, arr = q.get()
        buf[i] = arr
        while nxt in buf:
            fut = batched_4k(buf.pop(nxt), len4j)
            if pending is not None:
                np.asarray(pending)
            pending = fut
            nxt += 1
            got += 1
    np.asarray(pending)
    for th in ths:
        th.join()
    return n_batches * BATCH / (time.time() - t0)


def run_puts_only():
    """Same-window link bound: the identical batches device_put back-to-back
    with NO compute — what the relay alone sustains right now."""
    w = pack()
    t0 = time.time()
    arrs = []
    for _ in range(n_batches):
        arrs.append(jax.device_put(w, dev))
    for a in arrs:
        a.block_until_ready()
    jax.block_until_ready(arrs[-1])
    return n_batches * BATCH / (time.time() - t0)


results = {}
for rd in range(3):
    for name, fn in (
        ("puts_only_bound", run_puts_only),
        ("current_1deep", run_current),
        ("feeder_d2", lambda: run_feeder(2)),
        ("feeder_d3", lambda: run_feeder(3)),
        ("feeder_d3_w2", lambda: run_feeder(3, workers=2)),
    ):
        v = fn()
        results[name] = max(results.get(name, 0), v)
        print(f"round {rd} {name:16s} {v:7.1f} clips/s", flush=True)

print("\nbest:")
for k, v in results.items():
    print(f"  {k:16s} {v:7.1f} clips/s")
