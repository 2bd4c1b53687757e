from . import checkpoints, linear_eval, metrics
from .linear_eval import (
    HEART_METRICS,
    get_class_weights,
    linear_evaluation_heart,
    linear_evaluation_heart_cv,
    run_seeds,
    train_linear_head,
)
