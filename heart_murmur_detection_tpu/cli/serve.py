"""Feature-extraction serving daemon.

A lightweight stdlib HTTP server wrapping a warm `FeatureExtractor`: the jit
graphs compile once at startup, then requests stream through the batched
device pipeline. The reference ships no serving path (its HeAR Vertex stack
is vendored dead code, SURVEY.md §2.3/§2.9); this is a new capability.

Usage:
  python -m heart_murmur_detection_tpu.cli.serve pretrain=operaCT dim=768 port=8799

Endpoints:
  GET  /healthz            -> {"status": "ok", "pretrain": ..., "dim": ...}
  POST /extract
       Content-Type: audio/wav  (raw WAV bytes, one clip)
       Content-Type: application/json  {"paths": ["/abs/a.wav", ...]}
       -> {"features": [[...dim floats...], ...], "n": N, "ms": elapsed}

Design notes (TPU):
- One FeatureExtractor per process: fixed-shape jit graphs, compiled and
  warmed before the socket opens (first compile is 20-400 s through a
  remote-compile link; a cold server must never eat that on a request).
- Requests serialize through a lock: the host has one core and one chip;
  concurrency belongs inside the batch (extract_files pipelines pack/upload
  against device compute), not across competing graphs.
- WAV bytes go through the same decode/trim/pad policy as offline
  processing (pipelines.get_entire_signal semantics via a temp file), so
  served features match `feature/<task>_eval/*_feature.npy` caches.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .config import resolve


class _State:
    extractor = None
    lock = threading.Lock()
    cfg = {}


def _build_extractor(cfg):
    from ..data.processors.common import default_input_sec
    from ..extract.extract import FeatureExtractor

    pretrain = cfg.get("pretrain", "operaCT")
    dim = int(cfg.get("dim", 768))
    input_sec = cfg.get("input_sec")
    input_sec = (
        float(input_sec) if input_sec not in (None, "None") else default_input_sec(pretrain)
    )
    source_sr = cfg.get("source_sr")
    return FeatureExtractor(
        pretrain,
        dim=dim,
        input_sec=input_sec,
        ckpt_path=cfg.get("ckpt_path") if cfg.get("ckpt_path") not in (None, "None") else None,
        batch_size=int(cfg.get("batch_size", 16)),
        random_init=bool(cfg.get("random_init", False)),
        wire_format=cfg.get("wire_format", "int16"),
        source_sr=int(source_sr) if source_sr not in (None, "None") else None,
        fast_softmax=bool(cfg.get("fast_softmax", False)),
    )


def _warm(ex):
    """Compile + warm the extraction graph on a synthetic clip."""
    import numpy as np

    from ..utils.audio_io import write_wav

    sr = ex._host_sr
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "warm.wav")
        t = np.arange(int(ex.input_sec * sr), dtype=np.float32) / sr
        write_wav(p, (0.1 * np.sin(2 * np.pi * 100 * t)).astype(np.float32), sr)
        ex.extract_files([p])


class Handler(BaseHTTPRequestHandler):
    # quiet request logging (stderr noise at serving rates)
    def log_message(self, fmt, *args):
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            c = _State.cfg
            self._json(200, {"status": "ok", "pretrain": c.get("pretrain"),
                             "dim": c.get("dim")})
        else:
            self._json(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/extract":
            self._json(404, {"error": "unknown path"})
            return
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        t0 = time.time()
        try:
            if ctype == "application/json":
                req = json.loads(body)
                paths = [str(p) for p in req.get("paths", [])]
                if not paths:
                    self._json(400, {"error": "no paths"})
                    return
                missing = [p for p in paths if not os.path.exists(p)]
                if missing:
                    self._json(400, {"error": f"missing files: {missing[:5]}"})
                    return
                with _State.lock:
                    feats = _State.extractor.extract_files(paths)
            elif ctype in ("audio/wav", "audio/x-wav", "application/octet-stream"):
                with tempfile.TemporaryDirectory() as d:
                    p = os.path.join(d, "clip.wav")
                    with open(p, "wb") as f:
                        f.write(body)
                    with _State.lock:
                        feats = _State.extractor.extract_files([p])
            else:
                self._json(415, {"error": f"unsupported content-type {ctype!r}"})
                return
        except Exception as e:  # noqa: BLE001 - report, keep serving
            self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        self._json(200, {
            "features": [[float(v) for v in row] for row in feats],
            "n": len(feats),
            "ms": round((time.time() - t0) * 1000, 1),
        })


def make_server(cfg, host="127.0.0.1", port=0):
    """Build (server, extractor) with graphs warm; caller serves_forever()."""
    _State.cfg = cfg
    _State.extractor = _build_extractor(cfg)
    _warm(_State.extractor)
    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for cfg in resolve("serve_config", argv):
        host = cfg.get("host", "127.0.0.1")
        port = int(cfg.get("port", 8799))
        srv = make_server(cfg, host, port)
        print(
            f"serving {cfg.get('pretrain')}{cfg.get('dim')} on "
            f"http://{host}:{srv.server_address[1]} (graphs warm)",
            flush=True,
        )
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            srv.shutdown()
        break  # one server per invocation; no multirun sweeps


if __name__ == "__main__":
    main()
