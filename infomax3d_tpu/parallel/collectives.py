"""Cross-device loss wrappers.

`NTXent` and friends need the GLOBAL batch in the denominator
(commons/losses.py:144-155 assumes the full [B, B] similarity matrix).  Under
data parallelism each device holds a shard of embeddings; `CrossDeviceLoss`
all-gathers both views along the mesh axis and evaluates the wrapped loss on
the global batch — identical value on every device, and the all_gather's
transpose routes each device exactly its local gradient contribution.

The [B, B] einsum is recomputed per device; at contrastive batch sizes
(B<=4096, D<=256) that is microseconds on the MXU and cheaper than sharding
the similarity matrix.
"""
from __future__ import annotations

from typing import Any, Callable

import jax


class CrossDeviceLoss:
    def __init__(self, loss: Callable, axis: str = "data"):
        self.loss = loss
        self.axis = axis

    def __getattr__(self, item):
        return getattr(self.loss, item)

    def __call__(self, z1, z2, **kw):
        z1g = jax.lax.all_gather(z1, self.axis, axis=0, tiled=True)
        z2g = jax.lax.all_gather(z2, self.axis, axis=0, tiled=True)
        gathered_kw = {}
        for k, v in kw.items():
            # node-level kwargs (local-global losses) gather too; graph ids
            # must be offset per shard to stay globally unique
            if k == "node_graph":
                idx = jax.lax.axis_index(self.axis)
                n_graphs_local = kw.get("_n_graphs_local")
                v = v + idx * n_graphs_local if n_graphs_local else v
                gathered_kw[k] = jax.lax.all_gather(v, self.axis, axis=0, tiled=True)
            elif k == "node_mask":
                gathered_kw[k] = jax.lax.all_gather(v, self.axis, axis=0, tiled=True)
            elif k.startswith("_"):
                continue
            else:
                gathered_kw[k] = v
        return self.loss(z1g, z2g, **gathered_kw)
