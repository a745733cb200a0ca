from infomax3d_tpu.losses.contrastive import *  # noqa: F401,F403
from infomax3d_tpu.losses.contrastive import LOSS_REGISTRY, get_loss

__all__ = ["LOSS_REGISTRY", "get_loss"]
