"""Batched feature extraction — replaces the reference's per-file batch-1 hot
loop (src/benchmark/model_util.py:113-182, the primary TPU target per
SURVEY §3.1) with fixed-shape jit graphs over padded batches:

  operaCT : whole clip (<=32 s) -> device mel -> HTS-AT latent (dim 768/512)
  operaCE : whole clip -> device mel -> EfficientNet (masked pool) (1280/512)
  operaGT : 8.18 s 50%-hop chunks -> device mel -> ViT-S forward_feature ->
            mean over chunks (384)
  audiomae: 10 s non-overlap chunks (+tail) -> device kaldi fbank -> ViT-B
            global-pool backbone -> mean over chunks (768)

Host does decode+trim+window policy only; all spectrogram + encoder compute is
one compiled graph per (model, batch) shape.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import dsp, pipelines, wire
from ..audio.pad import split_pad_sample, split_sample_simple
from ..models.cola import Cola
from ..models.vit_mae import MaskedAutoencoderViT
from ..ops.resample import resample_poly_device
from . import registry

SR = 16000


def _batched(n: int, bs: int):
    for i in range(0, n, bs):
        yield i, min(i + bs, n)


class FeatureExtractor:
    """Batched jit extraction for one pretrained encoder."""

    def __init__(
        self,
        pretrain: str,
        dim: int = 1280,
        input_sec: float = 8,
        ckpt_path: Optional[str] = None,
        batch_size: int = 16,
        pad0: bool = False,
        random_init: bool = False,
        compute_dtype=jnp.bfloat16,
        use_pallas_mel: bool = False,
        use_fused_htsat: Optional[bool] = None,
        wire_format: str = "int16",
        source_sr: Optional[int] = None,
        mesh=None,
        fast_softmax: Optional[bool] = None,
        use_fused_vit: Optional[bool] = None,
        pallas_interpret: Optional[bool] = None,
    ):
        # use_fused_htsat: models.htsat_fused forward — fused Pallas swin
        # blocks for the bandwidth-bound stages (C<=192). 1.13x runtime at
        # f32, 1.5x with compute_dtype=bfloat16, ~4.5x faster first compile
        # (RESULTS.md). Features match the XLA path to cosine ~0.99999
        # (Mosaic transcendental approximations). None = auto: on for TPU
        # extraction — single-chip, or a pure data-parallel mesh (the jit
        # body is shard_map'd over the data axis, so each shard runs the
        # batch-grid kernels on its local batch; see _wrap). Off on CPU
        # (interpret mode is slow) and under tensor-sharded meshes
        # (in-kernel collectives would be needed).
        # compute_dtype: fused-kernel matmul input dtype. Default bfloat16
        # (f32 accumulation): 1.78x extraction throughput; feature cosine
        # vs the f32 XLA path 0.999996; 5-seed LP AUROC delta 0.006, within
        # seed noise (RESULTS.md) — comparable precision class to the
        # TF32/conv-bf16 defaults torch uses on the reference's A100. For
        # strict f32 parity: compute_dtype=jnp.float32, use_fused_htsat=False.
        from ..parallel.mesh import dp_axis

        self._dp_axis = dp_axis(mesh)
        _pallas_ok = mesh is None or self._dp_axis is not None
        if use_fused_htsat is None:
            use_fused_htsat = jax.default_backend() == "tpu" and _pallas_ok
        self.use_fused_htsat = use_fused_htsat
        # use_fused_vit: models.vit_fused forwards for the MAE encoders —
        # fused Pallas ViT blocks (ops.pallas_vit; full sequence in VMEM,
        # query-chunked exact softmax). Measured 2.83x (operaGT, 498 -> 1406
        # clips/s) and 1.85x (audiomae, 597 -> 1107) vs the bf16-XLA blocks;
        # feature cosine 0.999997 both (bench/vit_fused_check.py,
        # RESULTS.md). bf16 only — at f32 (HIGHEST = bf16x6 passes) the
        # kernel is slower than XLA. None = auto: on for TPU single-chip
        # bf16 extraction, same gate as use_fused_htsat.
        if use_fused_vit is None:
            use_fused_vit = (
                jax.default_backend() == "tpu"
                and _pallas_ok
                and compute_dtype == jnp.bfloat16
            )
        self.use_fused_vit = use_fused_vit and compute_dtype == jnp.bfloat16
        # fast_softmax: unstabilized in-kernel softmax (skips the rowwise
        # max pass; ~3% faster forward, feature cosine 0.9999988 vs the
        # stabilized kernel). Safe while attention logits < 88 (f32 exp
        # overflow) — far above anything the LN-bounded swin logits reach
        # (the hardware A/B at production geometry stayed finite with
        # cosine 0.9999988, RESULTS.md round 2). Default ON for the
        # bf16 TPU extraction path (same acceptance bar as the bf16 kernels,
        # cosine >= 0.99999); pass False for the stabilized kernel.
        if fast_softmax is None:
            fast_softmax = (
                jax.default_backend() == "tpu"
                and _pallas_ok
                and compute_dtype == jnp.bfloat16
            )
        self.fast_softmax = fast_softmax
        # pallas_interpret: run the fused kernels in Pallas interpret mode
        # (auto: off-TPU backends — lets the CPU virtual-device mesh tests
        # exercise the shard_map'd fused paths end-to-end)
        if pallas_interpret is None:
            pallas_interpret = jax.default_backend() != "tpu"
        self._interpret = pallas_interpret
        # use_pallas_mel: ops.pallas_mel fused kernel instead of the XLA mel
        # frontend (same output to ~3e-5; far faster first compile, see ops/).
        self.use_pallas_mel = use_pallas_mel
        # wire_format: host->device waveform packing (audio.wire). "int16"
        # (default) is exact for 16-bit-sourced PCM at half the f32 bytes;
        # "mulaw" halves again (~38 dB SNR, drift pinned in tests/test_wire.py).
        self.wire = wire_format
        wire.wire_dtype(wire_format)  # validate early
        # source_sr: ship waveforms at the corpus's native sample rate
        # (CirCor 4 kHz, PhysioNet-2016 2 kHz) and upsample to 16 kHz on
        # device (ops.resample, scipy-parity FIR). Cuts link bytes by
        # 16000/source_sr losslessly; the host pipeline (decode/trim/pad
        # policy) runs at source rate — trim_heart's frame is sr-relative
        # (src/util.py:237-243) so boundaries land at the same instants.
        self.source_sr = source_sr
        if source_sr is not None:
            if SR % source_sr or (512 % (SR // source_sr)):
                raise ValueError(
                    f"source_sr must divide {SR} with power-of-two ratio <=512"
                )
        self._up = SR // source_sr if source_sr else 1
        self.pretrain = pretrain
        self.is_mae = "mae" in pretrain or "GT" in pretrain
        self.is_audiomae = "audiomae" in pretrain
        self.dim = dim
        self.input_sec = input_sec
        self.batch_size = batch_size
        self.pad0 = pad0
        self.compute_dtype = compute_dtype
        self.model, self.variables = registry.initialize_pretrained_model(
            pretrain, ckpt_path=ckpt_path, random_init=random_init
        )
        # mesh: optional jax.sharding.Mesh with a 'data' axis; batches shard
        # over it and GSPMD replicates the params (SURVEY §2.10)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import put_replicated

            n_mesh = mesh.devices.size
            if batch_size % n_mesh:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by mesh size {n_mesh}"
                )
            self.variables = put_replicated(self.variables, mesh)
        else:
            # params are jit ARGUMENTS, not closure constants: closed-over
            # arrays get baked into the serialized HLO, which (a) bloats the
            # compile payload past this environment's remote-compile request
            # limit for ViT-B-sized models (HTTP 413 at ~344MB) and (b)
            # re-embeds weights per graph. device_put once; per-call passing
            # of device-resident arrays is free. The device is explicit:
            # device_put(x, None) leaves committed arrays where they are —
            # CPU-committed params would silently re-upload the whole tree
            # every call over the ~50MB/s link.
            self.variables = jax.device_put(self.variables, jax.devices()[0])
        self.max_sec = 32 if "operaCT" in pretrain else None
        self._fn_stable = None  # lazy exact-softmax fallback (_harvest)
        self._fn = self._build()

    def _dispatch(self, wav: np.ndarray, lengths: np.ndarray, fn=None):
        fn = fn or self._fn
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            wav, lengths = shard_batch((wav, lengths), self.mesh)
            return fn(self.variables, wav, lengths)
        return fn(self.variables, jnp.asarray(wav), jnp.asarray(lengths))

    def _harvest(self, fut, wav=None, lengths=None) -> np.ndarray:
        """Sync a dispatched batch to host, guarding the fast_softmax path:
        the unstabilized softmax overflows f32 exp for attention logits
        >~80, and every downstream op (av matmul, proj, LN, pooling) is
        NaN-preserving — so a pathological clip surfaces as non-finite
        features HERE, and the batch is recomputed once through the
        stabilized-softmax graph (same fused kernels, rowwise max pass
        restored). Matches the reference's always-exact softmax
        (src/model/htsat/htsat.py:150-178) on exactly the inputs that need
        it, at zero cost on the (LN-bounded, logits ~O(10)) common path."""
        out = np.asarray(fut)
        if (
            self.fast_softmax
            and wav is not None
            and not np.isfinite(out).all()
        ):
            if self._fn_stable is None:
                fast, self.fast_softmax = self.fast_softmax, False
                self._fn_stable = self._build()
                self.fast_softmax = fast
            out = np.asarray(self._dispatch(wav, lengths, fn=self._fn_stable))
        return out

    @staticmethod
    def _prefetch_iter(gen, depth: int = 3):
        """Run a host batch generator in a worker thread, holding up to
        `depth` results ahead of the consumer. The generator does the
        CPU-side pack (pad_batch + wire encode) and starts the async H2D
        transfer (jax.device_put), so on the streaming path packing AND the
        ~50 MB/s relay transfer of batch i+1..i+depth overlap the device
        compute of batch i — the one-deep dispatch loop alone leaves the
        pack time on the critical path (RESULTS.md round-4 streaming)."""
        import queue
        import threading

        q = queue.Queue(maxsize=depth)
        stop = object()
        err = []

        def run():
            try:
                for v in gen:
                    q.put(v)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                err.append(e)
            finally:
                q.put(stop)

        threading.Thread(target=run, daemon=True).start()
        while True:
            v = q.get()
            if v is stop:
                break
            yield v
        if err:
            raise err[0]

    # -- device graphs -------------------------------------------------------
    def _prologue(self, wav, lengths):
        """Wire decode + (optional) source-rate -> 16 kHz upsample, on device."""
        wav = wire.decode_device(wav, self.wire)
        if self._up != 1:
            wav = resample_poly_device(wav, self._up)
            lengths = (lengths * self._up).astype(lengths.dtype)
        return wav, lengths

    def _mel(self, wav, lengths):
        if self.use_pallas_mel:
            from ..ops.pallas_mel import mel_frontend_pallas

            return mel_frontend_pallas(wav, lengths)
        # bf16 extraction: bf16x3 DFT passes (~1e-7 rel err) instead of the
        # strict-parity bf16x6 — half the mel frontend's MXU time
        prec = (
            jax.lax.Precision.HIGH
            if self.compute_dtype == jnp.bfloat16
            else None
        )
        return dsp.mel_frontend(wav, lengths, precision=prec)

    def _wrap(self, body):
        """jit the extraction body. With a pure data-parallel mesh and a
        fused (Pallas) path active, the body is shard_map'd over the data
        axis first — params replicated, batch sharded — so the batch-grid
        kernels run per-shard on their local batch (pallas_call is not
        GSPMD-partitionable, but it shards trivially along the grid axis).
        Unfused mesh graphs keep plain jit: GSPMD partitions XLA ops fine."""
        if (
            self.mesh is not None
            and self._dp_axis is not None
            and (self.use_fused_htsat or self.use_fused_vit)
        ):
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self._dp_axis
            return jax.jit(
                shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(), P(ax), P(ax)),
                    out_specs=P(ax),
                    # pallas_call emits no varying-mesh-axes metadata, so
                    # the vma replication checker must be off
                    check_vma=False,
                )
            )
        return jax.jit(body)

    def _build(self):
        """Build the jit graph; `variables` is an explicit argument (see
        __init__ — closure constants bloat the serialized HLO)."""
        model = self.model
        # snapshot: the bodies trace lazily (first call / new batch shape),
        # so closing over the attribute would let _harvest's temporary flag
        # flip leak into later traces of the stable fallback graph
        fast_softmax = self.fast_softmax

        if self.is_mae or self.is_audiomae:
            # bf16 ViT blocks for the TPU extraction path (ViTBlock
            # compute_dtype: bf16 matmuls/einsums, f32 softmax + residuals) —
            # same precision class as the fused HTS-AT path, and the logits
            # tensors (the MAE encoders' HBM bottleneck) halve. CPU keeps
            # the exact f32 path (same policy as use_fused_htsat=None).
            if (
                self.compute_dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
            ):
                import dataclasses as _dc

                model = model.clone(
                    config=_dc.replace(
                        model.config, compute_dtype=self.compute_dtype
                    )
                )
                self.model = model

        if self.is_audiomae:

            prec = (
                jax.lax.Precision.HIGH
                if self.compute_dtype == jnp.bfloat16
                else None
            )

            if self.use_fused_vit:
                from ..models.vit_fused import audiomae_backbone_fused

                cfg = model.config

                def fn(variables, wav, lengths):
                    wav, lengths = self._prologue(wav, lengths)
                    fb, nf = dsp.kaldi_fbank_frontend(
                        wav, lengths, precision=prec
                    )
                    return audiomae_backbone_fused(
                        variables, fb, cfg, mm_dtype=jnp.bfloat16,
                        fast_softmax=fast_softmax,
                        interpret=self._interpret,
                    )

                return self._wrap(fn)

            def fn(variables, wav, lengths):
                wav, lengths = self._prologue(wav, lengths)
                fb, nf = dsp.kaldi_fbank_frontend(wav, lengths, precision=prec)
                return model.apply(variables, fb)

            return self._wrap(fn)

        if self.is_mae:  # operaGT

            if self.use_fused_vit:
                from ..models.vit_fused import mae_forward_feature_fused

                cfg = model.config

                def fn(variables, wav, lengths):
                    wav, lengths = self._prologue(wav, lengths)
                    mel, nf = self._mel(wav, lengths)
                    mel = mel[:, :256]
                    return mae_forward_feature_fused(
                        variables, mel, cfg, mm_dtype=jnp.bfloat16,
                        fast_softmax=fast_softmax,
                        interpret=self._interpret,
                    )

                return self._wrap(fn)

            def fn(variables, wav, lengths):
                wav, lengths = self._prologue(wav, lengths)
                mel, nf = self._mel(wav, lengths)
                mel = mel[:, :256]
                return model.apply(
                    variables, mel, method=MaskedAutoencoderViT.forward_feature
                )

            return self._wrap(fn)

        dim = self.dim

        if self.use_fused_htsat and "operaCT" in self.pretrain and dim == 768:
            from ..models.htsat import HTSATConfig
            from ..models.htsat_fused import htsat_apply_fused

            mm_dtype = self.compute_dtype

            def fn(variables, wav, lengths):
                enc_vars = {
                    "params": variables["params"]["encoder"],
                    "batch_stats": variables["batch_stats"]["encoder"],
                }
                wav, lengths = self._prologue(wav, lengths)
                mel, nf = self._mel(wav, lengths)
                return htsat_apply_fused(
                    enc_vars, mel, nf, HTSATConfig(), mm_dtype=mm_dtype,
                    fast_softmax=fast_softmax,
                    interpret=self._interpret,
                )

            return self._wrap(fn)

        def fn(variables, wav, lengths):
            wav, lengths = self._prologue(wav, lengths)
            mel, nf = self._mel(wav, lengths)
            return model.apply(
                variables, mel, dim, nf, method=Cola.extract_feature
            )

        return self._wrap(fn)

    # -- host orchestration ----------------------------------------------------
    @property
    def _host_sr(self) -> int:
        return self.source_sr or SR

    def _clip_waveform(self, path: str) -> Optional[np.ndarray]:
        types = "zero" if self.pad0 else "repeat"
        return pipelines.get_entire_signal(
            path,
            input_sec=self.input_sec,
            sample_rate=self._host_sr,
            pad=True,
            types=types,
            max_sec=self.max_sec,
        )

    def _chunks(self, path: str) -> List[np.ndarray]:
        sr = self._host_sr
        if self.is_audiomae:
            yt = pipelines._load_trim(path, sr, None, 200, 1800)
            chunks = split_sample_simple(yt, 10, sr)
            # keep-gate is defined in 16 kHz samples (>400, i.e. >25 ms)
            return [c - c.mean() for c in chunks if len(c) * self._up > 400]
        yt = pipelines._load_trim(path, sr, None, 200, 1800)
        return split_pad_sample(yt, self.input_sec, sr)

    def extract_files(self, sound_dir_loc: Sequence[str]) -> np.ndarray:
        if self.is_mae or self.is_audiomae:
            return self._extract_chunked(sound_dir_loc)
        return self._extract_whole(sound_dir_loc)

    # whole-clip models (operaCT / operaCE)
    def _extract_whole(self, paths) -> np.ndarray:
        from ..utils import native

        if self.max_sec and native.native_available() and self.source_sr is None:
            return self._extract_whole_native(paths)
        sr = self._host_sr
        clips = [self._clip_waveform(p) for p in paths]
        max_len = (
            int((self.max_sec or max(len(c) / sr for c in clips)) * sr)
            if clips
            else 0
        )
        return self.extract_waveforms(clips, max_len=max_len)

    def _extract_whole_native(self, paths) -> np.ndarray:
        """C++ decode/trim/pad on worker threads overlapped with device
        compute (utils/native.PrefetchLoader)."""
        from ..utils import native

        max_len = ((int(self.max_sec * SR) + 511) // 512) * 512
        min_len = int(self.input_sec * SR)

        def _load(p):
            try:
                return native.load_clip(p, max_len, min_len, self.pad0, SR)
            except (ValueError, IOError):
                # non-16k / non-wav: python decode+resample fallback
                w = self._clip_waveform(p)
                buf = np.zeros(max_len, np.float32)
                m = min(len(w), max_len)
                buf[:m] = w[:m]
                return buf, m

        loader = native.PrefetchLoader(
            list(paths),
            batch_size=self.batch_size,
            max_len=max_len,
            min_len=min_len,
            pad_zero=self.pad0,
            sr=SR,
            loader=_load,
        )
        out = np.zeros((len(paths), self.dim), np.float32)

        def packed():
            for lo, k, wav, lengths in loader:
                yield lo, k, wire.encode_np(wav, self.wire), lengths

        def put(gen):
            for lo, k, w, lengths in gen:
                if self.mesh is None:  # start the async H2D in this worker
                    w = jax.device_put(w)
                yield lo, k, w, lengths

        # two pipeline threads: stage 1 packs (CPU-bound wire encode),
        # stage 2 device_puts (GIL released during the relay transfer) —
        # pack(i+2) overlaps transfer(i+1) overlaps compute(i)
        pending = None  # sync stays one behind
        for lo, k, wav, lengths in self._prefetch_iter(
            put(self._prefetch_iter(packed()))
        ):
            fut = self._dispatch(wav, lengths)
            if pending is not None:
                plo, pk, pf, pw, pl = pending
                out[plo : plo + pk] = self._harvest(pf, pw, pl)[:pk]
            pending = (lo, k, fut, wav, lengths)
        if pending is not None:
            plo, pk, pf, pw, pl = pending
            out[plo : plo + pk] = self._harvest(pf, pw, pl)[:pk]
        return out

    def extract_waveforms(
        self, clips: List[np.ndarray], max_len: Optional[int] = None
    ) -> np.ndarray:
        out = []
        bs = self.batch_size
        if max_len is None:
            max_len = max(len(c) for c in clips)

        def packed():
            for lo, hi in _batched(len(clips), bs):
                chunk = clips[lo:hi]
                if len(chunk) < bs:  # pad batch to fixed size, drop extras
                    chunk = chunk + [chunk[0]] * (bs - len(chunk))
                wav, lengths = dsp.pad_batch(
                    chunk, pad_to_multiple=512 // self._up, max_len=max_len
                )
                yield hi - lo, wire.encode_np(wav, self.wire), lengths

        def put(gen):
            for n, w, lengths in gen:
                if self.mesh is None:  # start the async H2D in this worker
                    w = jax.device_put(w)
                yield n, w, lengths

        # two pipeline threads (pack | put), see _extract_whole_native
        pending = None  # sync stays one behind
        for n, wav, lengths in self._prefetch_iter(
            put(self._prefetch_iter(packed()))
        ):
            fut = self._dispatch(wav, lengths)
            if pending is not None:
                pf, pn, pw, pl = pending
                out.append(self._harvest(pf, pw, pl)[:pn])
            pending = (fut, n, wav, lengths)
        if pending is not None:
            pf, pn, pw, pl = pending
            out.append(self._harvest(pf, pw, pl)[:pn])
        return np.concatenate(out, axis=0)

    # chunked models (operaGT / audiomae)
    def _extract_chunked(self, paths) -> np.ndarray:
        all_chunks: List[np.ndarray] = []
        owners: List[int] = []
        for i, p in enumerate(paths):
            for c in self._chunks(p):
                # operaGT keeps chunks with >=16 mel frames
                # (model_util.py:148 `x.shape[0]>=16`, hop 512). audiomae
                # keeps every chunk >400 samples (_chunks filter): the
                # reference's fbank gate `x.shape[1] >= 16`
                # (extract_feature.py:156) tests the 128-bin axis and is
                # vacuous, so short tails are KEPT and zero-padded to
                # (1024,128) inside forward_feature.
                if self.is_audiomae or len(c) // 512 + 1 >= 16:
                    all_chunks.append(c)
                    owners.append(i)
        feats = self.extract_chunk_waveforms(all_chunks)
        d = feats.shape[1]
        out = np.zeros((len(paths), d), np.float32)
        cnt = np.zeros(len(paths), np.int64)
        for f, o in zip(feats, owners):
            out[o] += f
            cnt[o] += 1
        cnt = np.maximum(cnt, 1)
        return out / cnt[:, None]

    def extract_chunk_waveforms(self, chunks: List[np.ndarray]) -> np.ndarray:
        sr, mult = self._host_sr, 512 // self._up
        if self.is_audiomae:
            max_len = 10 * sr  # 16k-equivalent multiple of the 160-sample shift
        else:
            max_len = ((int(self.input_sec * sr) + mult - 1) // mult) * mult
        out = []
        bs = self.batch_size

        def packed():
            for lo, hi in _batched(len(chunks), bs):
                part = chunks[lo:hi]
                if len(part) < bs:
                    part = part + [part[0]] * (bs - len(part))
                wav, lengths = dsp.pad_batch(
                    part, pad_to_multiple=mult, max_len=max_len
                )
                yield hi - lo, wire.encode_np(wav, self.wire), lengths

        def put(gen):
            for n, w, lengths in gen:
                if self.mesh is None:  # start the async H2D in this worker
                    w = jax.device_put(w)
                yield n, w, lengths

        # two pipeline threads (pack | put), same shape as extract_waveforms
        pending = None
        for n, wav, lengths in self._prefetch_iter(
            put(self._prefetch_iter(packed()))
        ):
            fut = self._dispatch(wav, lengths)
            if pending is not None:
                pf, pn, pw, pl = pending
                out.append(self._harvest(pf, pw, pl)[:pn])
            pending = (fut, n, wav, lengths)
        if pending is not None:
            pf, pn, pw, pl = pending
            out.append(self._harvest(pf, pw, pl)[:pn])
        return np.concatenate(out, axis=0)


def extract_opera_feature(
    sound_dir_loc,
    pretrain: str = "operaCE",
    input_sec: float = 8,
    dim: int = 1280,
    pad0: bool = False,
    ckpt_path: Optional[str] = None,
    batch_size: int = 16,
    random_init: bool = False,
) -> np.ndarray:
    """Functional API mirroring model_util.extract_opera_feature:113-182."""
    ex = FeatureExtractor(
        pretrain,
        dim=dim,
        input_sec=input_sec,
        ckpt_path=ckpt_path,
        pad0=pad0,
        batch_size=batch_size,
        random_init=random_init,
    )
    return ex.extract_files(list(sound_dir_loc))


def extract_audiomae_feature(
    sound_dir_loc, input_sec: float = 10, ckpt_path: Optional[str] = None, **kw
) -> np.ndarray:
    """Mirrors extract_feature.extract_audioMAE_feature:105-171."""
    ex = FeatureExtractor("audiomae", dim=768, input_sec=input_sec, ckpt_path=ckpt_path, **kw)
    return ex.extract_files(list(sound_dir_loc))
