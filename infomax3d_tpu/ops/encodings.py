"""Distance / positional encodings (reference `commons/utils.py:103-110`)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fourier_encode_dist(x: jnp.ndarray, num_encodings: int = 4,
                        include_self: bool = True) -> jnp.ndarray:
    """Sin/cos encoding of distances at dyadic scales.

    Matches reference `fourier_encode_dist` (commons/utils.py:103-110) which
    the Net3D encoder applies to edge distances: x/2^k for k in [0,
    num_encodings), sin & cos, optionally appending the raw distance.

    Input [..., ] (trailing scalar per edge; a final size-1 axis is also
    accepted) -> output [..., 2*num_encodings (+1)].
    """
    if x.shape[-1] != 1:
        x = x[..., None]
    scales = jnp.asarray(2.0 ** np.arange(num_encodings, dtype=np.float32),
                         x.dtype)
    scaled = x / scales                                     # [..., K]
    out = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if include_self:
        out = jnp.concatenate([out, x], axis=-1)
    return out
