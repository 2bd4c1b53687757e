from . import data, prepare, steps
from .cola_training import train_multiple_data
from .data import (
    HEART_CORPORA,
    OPTIMAL_MAX_LEN_COLA,
    OPTIMAL_MAX_LEN_MAE,
    Corpus,
    MultiCorpusSampler,
)
from .mae_training import mae_train_multiple_data
