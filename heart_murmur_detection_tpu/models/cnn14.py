"""PANNs Cnn14 audio encoder in Flax — the CLAP-2022 audio backbone
(src/benchmark/baseline/msclap/models/audio.py:132, standard PANNs Cnn14).

Six conv blocks (2x [3x3 conv no-bias + BN + relu] then 2x2 avg pool), dims
64->2048; freq-mean then time-(max+mean) pool; fc1 -> relu = 2048-d embedding.
Input: log-mel (B, T, 64) from audio.dsp.logmel_frontend_general + per-bin
BatchNorm (bn0)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        for i in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding="SAME", use_bias=False, name=f"conv{i+1}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=ura, momentum=0.9, epsilon=1e-5, name=f"bn{i+1}"
            )(x)
            x = nn.relu(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Cnn14(nn.Module):
    """Returns dict(embedding=(B,2048), clipwise_output=(B,classes))."""

    classes_num: int = 527

    @nn.compact
    def __call__(self, logmel: jnp.ndarray, n_frames=None, train: bool = False):
        ura = not train
        x = nn.BatchNorm(
            use_running_average=ura, axis=-1, momentum=0.9, epsilon=1e-5, name="bn0"
        )(logmel)
        x = x[..., None]  # (B, T, F, 1)
        for i, ch in enumerate([64, 128, 256, 512, 1024, 2048]):
            x = ConvBlock(ch, name=f"conv_block{i+1}")(x, train)
        x = x.mean(axis=2)  # freq mean -> (B, T', C)
        if n_frames is not None:
            tmax = x.shape[1]
            valid = jnp.ceil(n_frames / 64.0).astype(jnp.int32)  # 6 pools of 2
            ok = jnp.arange(tmax)[None, :] < jnp.clip(valid, 1, tmax)[:, None]
            big_neg = jnp.full_like(x, -1e30)
            xmax = jnp.where(ok[..., None], x, big_neg).max(axis=1)
            xmean = jnp.where(ok[..., None], x, 0.0).sum(axis=1) / jnp.maximum(
                ok.sum(axis=1, keepdims=True), 1
            ).astype(x.dtype)
        else:
            xmax = x.max(axis=1)
            xmean = x.mean(axis=1)
        h = xmax + xmean
        h = nn.relu(nn.Dense(2048, name="fc1")(h))
        clip = nn.Dense(self.classes_num, name="fc_audioset")(h)
        return {"embedding": h, "clipwise_output": nn.sigmoid(clip)}
