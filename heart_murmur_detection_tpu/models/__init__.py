from .cola import Cola, ColaConfig, cola_loss
from .efficientnet import ColaEfficientNetEncoder, EfficientNet
from .heads import Head, freeze_mask_fn
from .htsat import HTSAT, HTSATConfig
from .clap import CLAPAudioEncoder, CLAPConfig, extract_clap_feature
from .cnn14 import Cnn14
from .hear import HeARConfig, HeAREncoder, extract_hear_feature
from .vggish import VGGish, extract_opensmile_features, extract_vgg_feature
from .vit_mae import (
    AudioMAEClassifierBackbone,
    MAEConfig,
    MaskedAutoencoderViT,
    audiomae_base_config,
    mae_vit_small_config,
)
