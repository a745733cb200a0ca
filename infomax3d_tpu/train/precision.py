"""Mixed-precision (bf16 compute) support.

TPU-native training recipe: master parameters, optimizer state, batch-norm
statistics and losses stay float32; the network forward/backward runs in
bfloat16 so every matmul hits the MXU's native bf16 path and all activation
HBM traffic is halved.  Implemented as boundary casts around `model.apply`
(params f32->bf16, float batch inputs f32->bf16, outputs bf16->f32): the
cast's VJP upcasts cotangents, so `jax.grad` naturally yields float32
gradients w.r.t. the float32 master weights — no loss scaling needed
(bf16 has float32's exponent range).

Numerics kept in float32 by construction:
* MaskedBatchNorm statistics (models/base.py computes sums in f32 and
  returns in input dtype),
* every loss (the trainer upcasts model outputs before the loss math),
* the Pallas CSR aggregation outputs (ops/pallas/spmm.py accumulates f32).

The reference has no mixed-precision mode (pure fp32 CUDA torch); this is a
TPU-first addition, config key ``bf16_compute: auto|true|false``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def cast_floats(tree: Any, dtype) -> Any:
    """Cast float32 leaves of a pytree to `dtype` (other dtypes — ints,
    bools, f64, existing bf16 — pass through untouched)."""
    def _cast(x):
        if isinstance(x, (jnp.ndarray, jax.Array)) and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def resolve_compute_dtype(setting) -> Optional[jnp.dtype]:
    """'auto' -> bf16 on accelerators, f32 (None) on CPU; True -> bf16;
    False/None -> full precision."""
    if setting == "auto":
        return jnp.bfloat16 if jax.default_backend() != "cpu" else None
    if setting is True or setting == "bf16" or setting == "bfloat16":
        return jnp.bfloat16
    return None
