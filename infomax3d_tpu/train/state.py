"""Train state pytree — everything the jitted step touches."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """Device-resident training state.

    params / batch_stats are dicts keyed by model name ('model', 'model3d',
    'critic', ...).  `extra` carries trainer-specific state (e.g. BYOL teacher
    params).  Host-side bookkeeping (epoch, best score, scheduler) lives in
    the Trainer, mirroring the reference checkpoint payload
    (trainer/trainer.py:272-280).
    """
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray
    extra: Optional[Dict[str, Any]] = None
