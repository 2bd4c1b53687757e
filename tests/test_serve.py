"""Serving daemon: warm server, /healthz, /extract with JSON paths and raw
WAV bytes; served features match offline extraction."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from heart_murmur_detection_tpu.cli.serve import make_server
from heart_murmur_detection_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = {
        "pretrain": "operaCT",
        "dim": 768,
        "input_sec": 8,
        "batch_size": 4,
        "random_init": True,
    }
    srv = make_server(cfg, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", cfg
    srv.shutdown()


def _wav(path, sec=6.0, f0=90.0, sr=16000):
    r = np.random.default_rng(int(f0))
    t = np.arange(int(sec * sr)) / sr
    x = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.02 * r.standard_normal(len(t))
    write_wav(path, x.astype(np.float32), sr)
    return path


def test_healthz(server):
    url, cfg = server
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["pretrain"] == "operaCT"


def test_extract_paths_matches_offline(server, tmp_path):
    url, cfg = server
    paths = [_wav(str(tmp_path / f"c{i}.wav"), 6.0 + i, 80 + 10 * i) for i in range(3)]
    req = urllib.request.Request(
        url + "/extract",
        data=json.dumps({"paths": paths}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    feats = np.asarray(body["features"], np.float32)
    assert feats.shape == (3, 768)
    assert body["n"] == 3

    from heart_murmur_detection_tpu.cli.serve import _State

    offline = _State.extractor.extract_files(paths)
    assert np.allclose(feats, offline, atol=1e-5)


def test_extract_wav_bytes(server, tmp_path):
    url, _ = server
    p = _wav(str(tmp_path / "one.wav"), 7.0, 120)
    req = urllib.request.Request(
        url + "/extract",
        data=open(p, "rb").read(),
        headers={"Content-Type": "audio/wav"},
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert np.asarray(body["features"]).shape == (1, 768)


def test_errors(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/extract",
        data=json.dumps({"paths": ["/nonexistent/x.wav"]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    req = urllib.request.Request(
        url + "/extract", data=b"x", headers={"Content-Type": "text/plain"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 415
