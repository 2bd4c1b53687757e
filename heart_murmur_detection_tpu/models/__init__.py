from .cola import Cola, ColaConfig, cola_loss
from .efficientnet import ColaEfficientNetEncoder, EfficientNet
from .heads import Classifier, Head, freeze_mask_fn
from .htsat import HTSAT, HTSATConfig
from .vit_mae import (
    AudioMAEClassifierBackbone,
    MAEConfig,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
