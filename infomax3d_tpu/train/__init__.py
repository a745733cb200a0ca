from infomax3d_tpu.train.metrics import METRIC_REGISTRY, get_metric
from infomax3d_tpu.train.schedulers import LRController, ReduceLROnPlateau, WarmUpController

__all__ = [
    "METRIC_REGISTRY", "get_metric",
    "LRController", "ReduceLROnPlateau", "WarmUpController",
]
