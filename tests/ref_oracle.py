"""Import the reference's OWN torch model classes as conversion oracles.

The round-1 parity tests used independently-written mini torch models
(tests/torch_mini) — same author as the flax code, so a shared misreading of
the reference source would pass silently. These helpers make the mounted
reference source importable by stubbing exactly the third-party pieces its
eval paths never execute:

- torchlibrosa Spectrogram/LogmelFilterBank/SpecAugmentation: constructed in
  HTSAT.__init__ but the eval forward feeds mel directly (the in-module STFT
  calls are commented out, reference htsat.py:886-887); stubs are
  parameterless identity modules.
- pytorch_lightning.LightningModule: nn.Module + no-op save_hyperparameters
  and log (training harness unused in eval forwards).
- timm.models.swin_transformer: the reference SHIPS this file
  (src/model/mae_utils/swin_transformer.py, copied into timm by
  prepare_code.sh:1-22); we exec the reference's own file under the timm
  module name.
- timm.models.layers.{DropPath,to_2tuple}: taken from the reference's own
  htsat_util.py (identical vendored copies of the timm originals).
- timm.models.vision_transformer.Block: standard timm ViT block,
  re-implemented here (used by the MAE encoder/decoder at real dims).
- efficientnet_pytorch / huggingface_hub download: import-time only.

Everything that carries learned parameters in the oracles below is the
reference's own code.
"""

import importlib.util
import sys
import types

REF = "/root/reference"

_installed = False


def _module(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install_reference_stubs():
    global _installed
    if _installed:
        return
    sys.dont_write_bytecode = True
    import torch
    import torch.nn as nn

    # ---- pytorch_lightning ----
    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")

        class LightningModule(nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.Callback = object

    # ---- torchlibrosa ----
    if "torchlibrosa" not in sys.modules:
        tl = _module("torchlibrosa")
        aug = _module("torchlibrosa.augmentation")
        stft = _module("torchlibrosa.stft")

        class _Identity(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        aug.SpecAugmentation = _Identity
        stft.Spectrogram = _Identity
        stft.LogmelFilterBank = _Identity
        tl.augmentation = aug
        tl.stft = stft

    # ---- efficientnet_pytorch (import-time only; Cola(encoder='htsat')
    # never constructs it) ----
    if "efficientnet_pytorch" not in sys.modules:
        ep = _module("efficientnet_pytorch")

        class EfficientNet:
            @classmethod
            def from_name(cls, *a, **k):
                raise RuntimeError(
                    "efficientnet_pytorch stub: not available in this env"
                )

        ep.EfficientNet = EfficientNet

    # ---- reference source on sys.path ----
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # ---- timm ----
    if "timm" not in sys.modules:
        timm = _module("timm")
        models = _module("timm.models")
        models.__path__ = []  # package, so relative imports resolve
        timm.models = models

        layers = _module("timm.models.layers")
        from src.model.htsat.htsat_util import DropPath, to_2tuple  # noqa: E402

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        models.layers = layers

        # the reference's own patched swin block, under the name
        # prepare_code.sh installs it as
        spec = importlib.util.spec_from_file_location(
            "timm.models.swin_transformer",
            f"{REF}/src/model/mae_utils/swin_transformer.py",
        )
        swin = importlib.util.module_from_spec(spec)
        sys.modules["timm.models.swin_transformer"] = swin
        spec.loader.exec_module(swin)
        models.swin_transformer = swin

        vt = _module("timm.models.vision_transformer")

        class _Attention(nn.Module):
            def __init__(self, dim, num_heads, qkv_bias=True):
                super().__init__()
                self.num_heads = num_heads
                self.scale = (dim // num_heads) ** -0.5
                self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                qkv = (
                    self.qkv(x)
                    .reshape(B, N, 3, self.num_heads, C // self.num_heads)
                    .permute(2, 0, 3, 1, 4)
                )
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
                x = (a @ v).transpose(1, 2).reshape(B, N, C)
                return self.proj(x)

        class _Mlp(nn.Module):
            def __init__(self, dim, hidden):
                super().__init__()
                self.fc1 = nn.Linear(dim, hidden)
                self.act = nn.GELU()
                self.fc2 = nn.Linear(hidden, dim)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        class Block(nn.Module):
            """timm ViT block (pre-norm, no layer-scale at default init)."""

            def __init__(
                self,
                dim,
                num_heads,
                mlp_ratio=4.0,
                qkv_bias=True,
                norm_layer=nn.LayerNorm,
                **kw,
            ):
                super().__init__()
                self.norm1 = norm_layer(dim)
                self.attn = _Attention(dim, num_heads, qkv_bias)
                self.norm2 = norm_layer(dim)
                self.mlp = _Mlp(dim, int(dim * mlp_ratio))

            def forward(self, x):
                x = x + self.attn(self.norm1(x))
                return x + self.mlp(self.norm2(x))

        class VisionTransformer(nn.Module):
            # subclassed by the reference's fine-tune class; the oracle tests
            # never instantiate it (needs full timm)
            def __init__(self, *a, **k):
                raise RuntimeError("timm VisionTransformer stub: do not build")

        vt.Block = Block
        vt.VisionTransformer = VisionTransformer
        models.vision_transformer = vt

    _installed = True


def load_reference_cola_htsat():
    """Reference Cola(encoder='htsat') = HTSATWrapper at real OPERA-CT dims."""
    install_reference_stubs()
    from src.model.models_cola import Cola

    return Cola(encoder="htsat")


def load_reference_mae_gt():
    """Reference mae_vit_small at OPERA-GT dims (model_util.py:204-214)."""
    install_reference_stubs()
    from src.model.models_mae import mae_vit_small

    return mae_vit_small(
        norm_pix_loss=False,
        in_chans=1,
        audio_exp=True,
        img_size=(256, 64),
        alpha=0.0,
        mode=0,
        use_custom_patch=False,
        split_pos=False,
        pos_trainable=False,
        use_nce=False,
        decoder_mode=1,
        mask_2d=False,
        mask_t_prob=0.7,
        mask_f_prob=0.3,
        no_shift=False,
    )
