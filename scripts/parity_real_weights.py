"""Real-weights parity runbook (driver for scripts/parity_real_weights.sh).

On a networked machine with the raw datasets present, this validates the full
conversion chain against ground truth the reference ships:

  1. download the base OPERA checkpoints from HF `evelyn0414/OPERA`
     (model_util.py:98-110 does the same),
  2. convert them with extract/convert.py and build the flax models,
  3. extract features on the shipped audio lists
     (feature/<task>_eval/sound_dir_loc.npy),
  4. diff against the shipped caches (feature/<task>_eval/<model>_feature.npy,
     e.g. operaCT768_feature.npy written by the reference's own extractor).

Each step degrades to an explicit SKIP when its input artifact is missing
(no network / no checkpoints / no raw WAVs), so the script runs cleanly in
offline environments and documents exactly what remains unverified.

Expected tolerances when everything is present:
  - cosine similarity per clip > 0.999 for operaCT/operaCE/operaGT
  - mean |delta| < 2e-3 on unit-scale features
The residual comes from librosa-vs-JAX mel float semantics (audio/dsp.py is
parity-tested to ~1e-6 per mel cell against audio/reference_np.py, but
power_to_db(ref=max) + min-max normalization amplify ulp-level differences
near silent clips) and torch-vs-XLA conv accumulation order. Exceeding these
bounds indicates a conversion bug, not float noise.
"""

import os
import sys

import numpy as np

FEATURE_ROOT = os.environ.get("HMDT_FEATURE_ROOT", "/root/reference/feature")
TASKS = ("pascal_A", "pascal_B", "zchsound_clean", "zchsound_noisy")
MODELS = (
    ("operaCT", 768, "operaCT768_feature.npy"),
    ("operaCE", 1280, "operaCE1280_feature.npy"),
    ("operaGT", 384, "operaGT384_feature.npy"),
)


def step(msg):
    print(f"[parity] {msg}", flush=True)


def skip(msg):
    print(f"[parity] SKIP: {msg}", flush=True)


def download_base_ckpts() -> bool:
    ok = True
    for name in ("operaCT", "operaCE", "operaGT"):
        path = f"cks/model/encoder-{name}.ckpt"
        if os.path.exists(path):
            step(f"checkpoint present: {path}")
            continue
        try:
            from huggingface_hub import hf_hub_download

            step(f"downloading encoder-{name}.ckpt from evelyn0414/OPERA ...")
            hf_hub_download(
                "evelyn0414/OPERA", f"encoder-{name}.ckpt", local_dir="cks/model"
            )
        except Exception as e:
            skip(f"download failed for {name} ({type(e).__name__}); offline?")
            ok = False
    return ok


def audio_list(task: str):
    p = os.path.join(FEATURE_ROOT, f"{task}_eval", "sound_dir_loc.npy")
    if not os.path.exists(p):
        skip(f"no audio list: {p}")
        return None
    locs = [str(s) for s in np.load(p)]
    present = [s for s in locs if os.path.exists(s)]
    if len(present) < len(locs):
        skip(
            f"{task}: {len(locs) - len(present)}/{len(locs)} WAVs missing "
            "(raw datasets not mounted)"
        )
        if not present:
            return None
    return locs if len(present) == len(locs) else None


def diff_features(task: str, model: str, dim: int, cache_name: str) -> bool:
    cache = os.path.join(FEATURE_ROOT, f"{task}_eval", cache_name)
    if not os.path.exists(cache):
        skip(f"no shipped cache: {cache}")
        return True
    locs = audio_list(task)
    if locs is None:
        return True
    if not os.path.exists(f"cks/model/encoder-{model}.ckpt"):
        skip(f"no checkpoint for {model}")
        return True

    from heart_murmur_detection_tpu.extract.extract import FeatureExtractor

    input_sec = {"operaCT": 8, "operaCE": 8, "operaGT": 8.18}[model]
    step(f"extracting {model}{dim} on {task} ({len(locs)} clips) ...")
    ex = FeatureExtractor(model, dim=dim, input_sec=input_sec)
    ours = ex.extract_files(locs)
    want = np.load(cache)
    cos = np.sum(ours * want, axis=1) / (
        np.linalg.norm(ours, axis=1) * np.linalg.norm(want, axis=1) + 1e-12
    )
    mad = float(np.abs(ours - want).mean())
    step(
        f"{task}/{model}{dim}: cosine min={cos.min():.6f} "
        f"median={np.median(cos):.6f} mean|d|={mad:.2e}"
    )
    ok = bool(cos.min() > 0.999 and mad < 2e-3)
    if not ok:
        print(f"[parity] FAIL: {task}/{model}{dim} outside tolerance")
    return ok


def main() -> int:
    os.makedirs("cks/model", exist_ok=True)
    download_base_ckpts()
    failures = 0
    for task in TASKS:
        for model, dim, cache_name in MODELS:
            if not diff_features(task, model, dim, cache_name):
                failures += 1
    if failures:
        print(f"[parity] {failures} comparisons FAILED")
        return 1
    step("done (failures=0; skipped steps listed above)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
