"""Dense masked attention building blocks.

`TransformerEncoderBlock` reproduces torch `nn.TransformerEncoderLayer`
(post-norm, batch_first) semantics used by the reference's hybrid models —
as dense masked MXU attention.  Layer weights match torch's in_proj/out_proj
structure functionally (not bit-for-bit initialization).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from infomax3d_tpu.models.base import get_activation


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    scores = jnp.where(mask, scores, neg)
    out = jax.nn.softmax(scores, axis=axis)
    # rows with no valid keys produce uniform garbage; zero them
    any_valid = mask.any(axis=axis, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


class MultiHeadSelfAttention(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_mask, deterministic=True):
        # x [G, N, D]; key_mask [G, N] True = attendable
        G, N, D = x.shape
        H = self.num_heads
        hd = self.dim // H
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(G, N, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(G, N, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(G, N, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("ghqd,ghkd->ghqk", q, k) / jnp.sqrt(hd)
        attn = masked_softmax(scores, key_mask[:, None, None, :])
        if self.dropout > 0:
            attn = nn.Dropout(rate=self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("ghqk,ghkd->ghqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(G, N, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class TransformerEncoderBlock(nn.Module):
    """torch TransformerEncoderLayer(batch_first=True, norm_first=False)."""
    dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"

    @nn.compact
    def __call__(self, x, key_mask, deterministic=True):
        a = MultiHeadSelfAttention(self.dim, self.num_heads, self.dropout,
                                   name="self_attn")(x, key_mask, deterministic)
        if self.dropout > 0:
            a = nn.Dropout(rate=self.dropout, deterministic=deterministic)(a)
        x = nn.LayerNorm(name="norm1")(x + a)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = get_activation(self.activation)(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, name="linear2")(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(name="norm2")(x + h)
