"""Where do params live? fe.variables vs manually-inited + device_put."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from heart_murmur_detection_tpu.extract.extract import FeatureExtractor
from heart_murmur_detection_tpu.models.vit_mae import MaskedAutoencoderViT, mae_vit_small_config

fe = FeatureExtractor("operaGT", dim=384, input_sec=8.18, batch_size=64, random_init=True)
leaf = jax.tree.leaves(fe.variables)[0]
print("fe.variables device:", leaf.devices() if hasattr(leaf, "devices") else type(leaf))

m = MaskedAutoencoderViT(mae_vit_small_config())
x = np.random.default_rng(0).random((2, 256, 64)).astype(np.float32)
with jax.default_device(jax.devices("cpu")[0]):
    v = m.init({"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}, x)
leaf = jax.tree.leaves(v)[0]
print("cpu-inited device:", leaf.devices())
v2 = jax.device_put(v)
leaf2 = jax.tree.leaves(v2)[0]
print("after device_put(None):", leaf2.devices())
v3 = jax.device_put(v, jax.devices()[0])
leaf3 = jax.tree.leaves(v3)[0]
print("after device_put(tpu0):", leaf3.devices())
