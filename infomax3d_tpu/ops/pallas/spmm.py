"""Pallas fused CSR segmented multi-aggregation (the SpMM of SURVEY.md §2.6).

Input contract: edges sorted by receiver (batcher `csr=True` buckets) with
row pointers `row_ptr [N+1]`.  One kernel pass computes, per node tile, ALL
of {sum, sum-of-squares, max(+argmax), min(+argmin)} of the incoming edge
messages — without materializing dense [N, K, D] mailboxes (which cost more
in relayout copies than they save in scatters) and without XLA scatters
(row-serialized on TPU, ~0.19 ms each).

Kernel shape:
  grid = (N / TN, D / DC)
  - row_ptr is scalar-prefetched; the node tile's edge window
    [row_ptr[n0], row_ptr[n0] + WIN) is DMA'd from HBM (WIN = TN * max_deg,
    bucket-static),
  - incidence [TN, WIN] built by comparing a window iota against the tile's
    per-node row offsets,
  - sum / sumsq ride the MXU as incidence @ window,
  - max / min: K per-slot one-hot matmuls gather the mailbox rows on the
    MXU (DEFAULT precision), then a K-deep masked VPU running reduce,
  - backward (custom VJP, plain XLA): gathers of the cotangents through
    `receivers` + max/min equality compare — no scatter anywhere.

Contract: every node's true in-degree must be <= max_deg (the batcher's
csr buckets guarantee this); edges beyond slot max_deg would be silently
dropped from max/min.  On TPU the max/min VALUES are bf16-rounded (DEFAULT
MXU precision selection); sums are exact: bf16 messages use 0/1-incidence
DEFAULT passes (hi/lo split for sumsq), f32 messages use HIGHEST.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infomax3d_tpu.ops.segment import EPS


NEG_BIG = -3.0e38
POS_BIG = 3.0e38


def _kernel(row_ptr_ref, msg_hbm, sum_ref, sumsq_ref, max_ref,
            min_ref, win_ref, sem, *, TN, DC, WIN, K, E):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n0 = i * TN
    # sublane-align the DMA start (Mosaic requires provable 8-divisibility);
    # WIN carries +8 headroom for the floor
    base = jnp.minimum(row_ptr_ref[n0], E - WIN)
    base = pl.multiple_of((base // 8) * 8, 8)
    copy = pltpu.make_async_copy(
        msg_hbm.at[pl.ds(base, WIN), pl.ds(j * DC, DC)], win_ref, sem)
    copy.start()

    # per-node relative edge ranges within the window
    starts = jnp.stack([row_ptr_ref[n0 + k] for k in range(TN)]) - base
    ends = jnp.stack([row_ptr_ref[n0 + k + 1] for k in range(TN)]) - base
    eidx = jax.lax.broadcasted_iota(jnp.int32, (TN, WIN), 1)
    inc = (eidx >= starts[:, None]) & (eidx < ends[:, None])   # [TN, WIN]

    copy.wait()
    win = win_ref[:]                                           # [WIN, DC]
    winf = win.astype(jnp.float32)
    if win.dtype == jnp.bfloat16:
        # bf16 messages: the incidence matrix is 0/1 (exact in bf16) and the
        # window is already bf16, so ONE DEFAULT-precision pass accumulates
        # the exact sum in f32 — identical numerics to HIGHEST at 1/6 the MXU
        # passes.  sumsq: the f32 square of a bf16 value overflows bf16's
        # mantissa, so split it hi/lo (two DEFAULT passes, ~2^-16 relative) —
        # 3 passes total where HIGHEST costs 12.
        incb = inc.astype(jnp.bfloat16)
        sum_ref[:] = jnp.dot(incb, win, preferred_element_type=jnp.float32)
        sq = winf * winf
        hi = sq.astype(jnp.bfloat16)
        lo = (sq - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        sumsq_ref[:] = (jnp.dot(incb, hi, preferred_element_type=jnp.float32)
                        + jnp.dot(incb, lo,
                                  preferred_element_type=jnp.float32))
    else:
        # f32 messages: HIGHEST keeps sum/sumsq f32-exact
        incf = inc.astype(jnp.float32)
        sum_ref[:] = jnp.dot(incf, winf, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        sumsq_ref[:] = jnp.dot(incf, winf * winf,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

    # max/min via per-slot one-hot matmuls: slot s of node n is window row
    # starts[n] + s.  K small MXU matmuls replace the old dense VPU masking
    # of the whole window (2 * TN * WIN * DC select+cmp ops, ~deg/WIN-fold
    # redundant); the MXU does the gather, the VPU only reduces K-deep.
    run_max = jnp.full((TN, DC), NEG_BIG, jnp.float32)
    run_min = jnp.full((TN, DC), POS_BIG, jnp.float32)
    for s in range(K):
        tgt = starts + s                                       # [TN]
        has = (tgt < ends).astype(jnp.int32)[:, None]          # [TN, 1]
        onehot = (eidx == tgt[:, None]).astype(win.dtype)      # [TN, WIN]
        # DEFAULT precision: the MXU rounds window values to bf16; the
        # selected max/min are bf16-rounded and the VJP compares against
        # bf16-rounded messages (exact routing, see _bwd)
        row = jnp.dot(onehot, win, preferred_element_type=jnp.float32)
        run_max = jnp.where(has > 0, jnp.maximum(run_max, row), run_max)
        run_min = jnp.where(has > 0, jnp.minimum(run_min, row), run_min)

    deg = (ends - starts)[:, None]
    max_ref[:] = jnp.where(deg > 0, run_max, 0.0)
    min_ref[:] = jnp.where(deg > 0, run_min, 0.0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _csr_reduce_raw(messages, row_ptr, max_deg: int, interpret: bool):
    """Returns (sum, sumsq, max, min), each [N, D]."""
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    TN = 64
    DC = min(256, max(128, ((D + 127) // 128) * 128))
    WIN = max(((TN * max_deg + 8 + 127) // 128) * 128, 128)
    if D % DC:
        messages = jnp.pad(messages, ((0, 0), (0, DC - D % DC)))
    if E < WIN:
        messages = jnp.pad(messages, ((0, WIN - E), (0, 0)))
    Ep = messages.shape[0]
    Dp = messages.shape[1]
    if N % TN:
        row_ptr = jnp.concatenate(
            [row_ptr, jnp.full(TN - N % TN, row_ptr[-1], row_ptr.dtype)])
    Np = row_ptr.shape[0] - 1

    grid = (Np // TN, Dp // DC)
    out_shape = [jax.ShapeDtypeStruct((Np, Dp), jnp.float32)] * 4
    out_spec = pl.BlockSpec((TN, DC), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((WIN, DC), messages.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_kernel, TN=TN, DC=DC, WIN=WIN, K=max_deg, E=Ep)
    outs = pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                          interpret=interpret)(row_ptr, messages)
    return tuple(o[:N, :D] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def csr_multi_reduce(messages, row_ptr, receivers, max_deg: int,
                     interpret: bool = False):
    """(sum, sumsq, max, min) with a scatter-free backward."""
    return _csr_reduce_raw(messages, row_ptr, max_deg, interpret)


def _fwd(messages, row_ptr, receivers, max_deg, interpret):
    s, s2, mx, mn = _csr_reduce_raw(messages, row_ptr, max_deg, interpret)
    return (s, s2, mx, mn), (messages, receivers, mx, mn)


def _bwd(max_deg, interpret, res, cots):
    messages, receivers, mx, mn = res
    d_s, d_s2, d_mx, d_mn = cots
    E, D = messages.shape
    N = mx.shape[0]
    recv = receivers.clip(0, N - 1)
    d_msg = jnp.take(d_s, recv, axis=0)
    d_msg = d_msg + 2.0 * messages * jnp.take(d_s2, recv, axis=0)
    # equality routing (matches jax segment_max/min vjp semantics; padded
    # rows have max/min forced to 0 but are masked below).  The kernel's
    # slot-selection matmul runs at DEFAULT MXU precision, so the returned
    # max/min are bf16-rounded — compare bf16-rounded messages for exact
    # routing (near-ties within bf16 resolution all receive the cotangent,
    # the "all ties get gradient" semantics XLA uses for exact ties)
    # (interpret mode computes exact matmuls, so accept either equality)
    msg_r = messages.astype(jnp.bfloat16).astype(jnp.float32)
    mx_e = jnp.take(mx, recv, axis=0)
    mn_e = jnp.take(mn, recv, axis=0)
    d_msg = d_msg + jnp.take(d_mx, recv, axis=0) * \
        ((msg_r == mx_e) | (messages == mx_e))
    d_msg = d_msg + jnp.take(d_mn, recv, axis=0) * \
        ((msg_r == mn_e) | (messages == mn_e))
    valid = (receivers < N)[:, None]
    return jnp.where(valid, d_msg, 0.0).astype(messages.dtype), None, None


csr_multi_reduce.defvjp(_fwd, _bwd)


def pna_csr_aggregate(messages, row_ptr, receivers, max_deg: int,
                      aggregators: Sequence[str],
                      scalers: Sequence[str] = ("identity",),
                      avg_d_log: float = 1.0, interpret: bool = False):
    """PNA multi-aggregator from one fused kernel pass — value-identical to
    `ops.segment.pna_multi_aggregate` for {sum, mean, max, min, std, var}.
    Moment aggregators fall back to the XLA path upstream."""
    s1, s2, mx, mn = csr_multi_reduce(messages, row_ptr, receivers, max_deg,
                                      interpret)
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    deg_safe = jnp.maximum(deg, 1.0)
    has = deg > 0
    mean = s1 / deg_safe
    outs = {}
    for a in aggregators:
        if a == "sum":
            outs[a] = s1
        elif a == "mean":
            outs[a] = jnp.where(has, mean, 0.0)
        elif a == "max":
            outs[a] = mx
        elif a == "min":
            outs[a] = mn
        elif a in ("std", "var"):
            var = jax.nn.relu(s2 / deg_safe - mean * mean)
            outs[a] = jnp.where(has, var if a == "var"
                                else jnp.sqrt(var + EPS), 0.0)
        else:
            raise ValueError(f"aggregator '{a}' unsupported by the Pallas "
                             f"kernel (use the XLA path)")
    h = jnp.concatenate([outs[a] for a in aggregators], axis=-1)
    if len(scalers) > 1:
        log_deg = jnp.log(deg + 1.0)
        scaled = []
        for s in scalers:
            if s == "identity":
                scaled.append(h)
            elif s == "amplification":
                scaled.append(h * (log_deg / avg_d_log))
            elif s == "attenuation":
                scaled.append(jnp.where(has, h * (avg_d_log /
                                                  jnp.maximum(log_deg, EPS)),
                                        0.0))
            else:
                raise ValueError(f"unknown PNA scaler: {s}")
        h = jnp.concatenate(scaled, axis=-1)
    return h.astype(messages.dtype)


def pna_csr_aggregate_parts(messages, row_ptr, receivers, max_deg: int,
                            aggregators: Sequence[str],
                            scalers: Sequence[str] = ("identity",),
                            avg_d_log: float = 1.0, interpret: bool = False):
    """`pna_csr_aggregate` as SplitDense parts: the (scaler-major, aggregator
    -minor) block order of the concatenated tensor is preserved, but neither
    the aggregator concat nor the degree-scaled copies are materialized —
    each block becomes a ScaledPart(agg, scale) consumed lazily by the
    posttrans SplitDense (row scaling commutes with the right-matmul).
    Value-identical to running the concat version through nn.Dense."""
    from infomax3d_tpu.models.base import ScaledPart
    s1, s2, mx, mn = csr_multi_reduce(messages, row_ptr, receivers, max_deg,
                                      interpret)
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    deg_safe = jnp.maximum(deg, 1.0)
    has = deg > 0
    mean = s1 / deg_safe
    outs = {}
    for a in aggregators:
        if a == "sum":
            outs[a] = s1
        elif a == "mean":
            outs[a] = jnp.where(has, mean, 0.0)
        elif a == "max":
            outs[a] = mx
        elif a == "min":
            outs[a] = mn
        elif a in ("std", "var"):
            var = jax.nn.relu(s2 / deg_safe - mean * mean)
            outs[a] = jnp.where(has, var if a == "var"
                                else jnp.sqrt(var + EPS), 0.0)
        else:
            raise ValueError(f"aggregator '{a}' unsupported by the Pallas "
                             f"kernel (use the XLA path)")
    aggs = [outs[a].astype(messages.dtype) for a in aggregators]
    if len(scalers) <= 1:
        return list(aggs)
    log_deg = jnp.log(deg + 1.0)
    parts = []
    for s in scalers:
        if s == "identity":
            parts.extend(aggs)
            continue
        if s == "amplification":
            scale = log_deg / avg_d_log
        elif s == "attenuation":
            scale = jnp.where(has, avg_d_log / jnp.maximum(log_deg, EPS), 0.0)
        else:
            raise ValueError(f"unknown PNA scaler: {s}")
        scale = scale.astype(messages.dtype)
        parts.extend(ScaledPart(a, scale) for a in aggs)
    return parts


def _sum_kernel(row_ptr_ref, msg_hbm, sum_ref, win_ref, sem,
                *, TN, DC, WIN, E, exact=True):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n0 = i * TN
    base = jnp.minimum(row_ptr_ref[n0], E - WIN)
    base = pl.multiple_of((base // 8) * 8, 8)
    copy = pltpu.make_async_copy(
        msg_hbm.at[pl.ds(base, WIN), pl.ds(j * DC, DC)], win_ref, sem)
    copy.start()
    starts = jnp.stack([row_ptr_ref[n0 + k] for k in range(TN)]) - base
    ends = jnp.stack([row_ptr_ref[n0 + k + 1] for k in range(TN)]) - base
    eidx = jax.lax.broadcasted_iota(jnp.int32, (TN, WIN), 1)
    copy.wait()
    incf = ((eidx >= starts[:, None]) &
            (eidx < ends[:, None])).astype(jnp.float32)
    sum_ref[:] = jnp.dot(incf, win_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=(jax.lax.Precision.HIGHEST if exact
                                    else jax.lax.Precision.DEFAULT))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _csr_sum_raw(messages, row_ptr, max_deg: int, interpret: bool,
                 exact: bool = True):
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    TN = 64
    DC = min(256, max(128, ((D + 127) // 128) * 128))
    WIN = max(((TN * max_deg + 8 + 127) // 128) * 128, 128)
    if D % DC:
        messages = jnp.pad(messages, ((0, 0), (0, DC - D % DC)))
    if E < WIN:
        messages = jnp.pad(messages, ((0, WIN - E), (0, 0)))
    Ep, Dp = messages.shape
    if N % TN:
        row_ptr = jnp.concatenate(
            [row_ptr, jnp.full(TN - N % TN, row_ptr[-1], row_ptr.dtype)])
    Np = row_ptr.shape[0] - 1
    grid = (Np // TN, Dp // DC)
    out_spec = pl.BlockSpec((TN, DC), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((WIN, DC), messages.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_sum_kernel, TN=TN, DC=DC, WIN=WIN, E=Ep,
                               exact=exact)
    out = pl.pallas_call(kernel,
                         out_shape=jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
                         grid_spec=grid_spec, interpret=interpret)(
        row_ptr, messages)
    return out[:N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def csr_sum(messages, row_ptr, receivers, max_deg: int, interpret=False):
    """Sum-only fused kernel (skips sumsq and the K slot matmuls)."""
    return _csr_sum_raw(messages, row_ptr, max_deg, interpret)


def _sum_fwd(messages, row_ptr, receivers, max_deg, interpret):
    return (_csr_sum_raw(messages, row_ptr, max_deg, interpret),
            (receivers, jnp.zeros((), messages.dtype)))


def _sum_bwd(max_deg, interpret, res, d_s):
    receivers, dtype_token = res
    N = d_s.shape[0]
    d_msg = jnp.take(d_s, receivers.clip(0, N - 1), axis=0)
    return (jnp.where((receivers < N)[:, None], d_msg, 0.0)
            .astype(dtype_token.dtype), None, None)


csr_sum.defvjp(_sum_fwd, _sum_bwd)


def csr_mean(messages, row_ptr, receivers, max_deg: int, interpret=False):
    s1 = csr_sum(messages, row_ptr, receivers, max_deg, interpret)
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    return (s1 / jnp.maximum(deg, 1.0)).astype(messages.dtype)
