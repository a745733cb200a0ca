"""Device mesh construction.

The reference has NO distributed layer (SURVEY.md §2.7) — this is new,
first-class capability: `jax.sharding.Mesh` over (data,) or (data, model)
axes; collectives ride ICI within a slice.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = [n_devices] + [1] * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)
