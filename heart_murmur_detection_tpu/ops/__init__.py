from .pallas_mel import fused_logmel
