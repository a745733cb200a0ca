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

# node-tile height shared by the stats kernel and the batcher's compacted
# window measurement (graphs/batch.py publishes the max edges per TILE_N-node
# tile so WIN can shrink from the worst case TN*max_deg to ~TN*avg_deg).
# 128 (was 64): per-tile fixed costs (DMA issue + output pipeline) dominate
# the MXU window redundancy at molecular degrees — measured on the v5e
# flagship step: 32 -> 9.74 ms, 64 -> 7.35, 128 -> 7.2, 256 -> 7.40 (the
# window MXU cost grows ~linearly with TN and overtakes past 128)
CSR_TILE_N = 128

# edge-block width of the Pallas stats BACKWARD kernel; the batcher
# publishes the max receiver-node span under any TILE_E consecutive edges
# (csr_bwd_span) so the kernel's node-window DMA is sized to reality.
# 128 (was 256): the kernel's one-hot broadcast matmul costs E*TNW*PW MXU
# flops and TNW (the node span) shrinks with the edge-block height — at
# molecular degree ~2 halving TE halves both the matmul and the window DMA
CSR_TILE_E = 128


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


_STATS_KERNEL_OK = None     # set by preflight_stats_kernel()


def preflight_stats_kernel() -> bool:
    """One-time tiny compile+run of the fused stats kernel on the current
    default backend.  bench.py / __graft_entry__ call this before building
    the real step so a Mosaic rejection on hardware degrades to the
    csr_multi_reduce fallback instead of failing the whole run (the kernel
    is interpret-tested in CI; this is the on-chip gate)."""
    global _STATS_KERNEL_OK
    if _STATS_KERNEL_OK is not None:
        return _STATS_KERNEL_OK
    import jax
    try:
        import numpy as np
        N, deg, D = 16, 4, 128
        E = N * deg
        # build operands in numpy and pass ALL of them as jit arguments:
        # a closed-over device array is embedded as an MLIR constant at
        # lowering time via a device->host fetch, which is pathologically
        # slow over a remote-device tunnel (observed 40s+ per fetch).
        msgs = np.linspace(-1.0, 1.0, E * D,
                           dtype=np.float32).reshape(E, D)
        msgs = jnp.asarray(msgs).astype(jnp.bfloat16)
        row_ptr = jnp.asarray(np.arange(N + 1, dtype=np.int32) * deg)
        recv = jnp.asarray(np.repeat(np.arange(N, dtype=np.int32), deg))
        out = jax.jit(
            lambda m, rp, rc: csr_pna_stats(m, rp, rc, max_deg=deg))(
            msgs, row_ptr, recv)
        # the affine-folded variant compiles a distinct Mosaic kernel —
        # gate it with the same preflight (fwd AND bwd)
        aff = (jnp.asarray(np.linspace(0.5, 1.5, D, dtype=np.float32)),
               jnp.asarray(np.linspace(-0.5, 0.5, D, dtype=np.float32)))

        def _loss(m, rp, rc, aff):
            outs = csr_pna_stats(m, rp, rc, max_deg=deg, bwd_span=128,
                                 affine=aff)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        ga = jax.jit(jax.grad(_loss, argnums=(0, 3)))(
            msgs, row_ptr, recv, aff)
        # compile+execute success IS the default gate — no device->host
        # value fetch: a scalar D2H costs minutes on a degraded remote-TPU
        # tunnel (observed), and kernel NUMERICS are covered on-chip by
        # tools/verify_onchip.py and in interpret mode by the test suite.
        # INFOMAX3D_PREFLIGHT_NUMERIC=1 additionally compares a reduced
        # on-device checksum vs the f32 oracle and fetches ONE scalar, so a
        # Mosaic miscompile that runs but produces garbage also trips the
        # fallback (advisor r4).
        jax.block_until_ready((out, ga))
        import os
        if os.environ.get("INFOMAX3D_PREFLIGHT_NUMERIC") == "1":
            def _maxdiff(m, rp, rc):
                ks = csr_pna_stats(m, rp, rc, max_deg=deg)
                s1, s2, mx, mn = csr_multi_reduce(m.astype(jnp.float32),
                                                  rp, rc, deg)
                dg = jnp.maximum((rp[1:] - rp[:-1]).astype(jnp.float32),
                                 1.0)[:, None]
                mean = s1 / dg
                std = jnp.sqrt(jax.nn.relu(s2 / dg - mean ** 2) + EPS)
                refs = (s1, mean, std, mx, mn)
                return jnp.max(jnp.stack([
                    jnp.max(jnp.abs(k.astype(jnp.float32) - r))
                    for k, r in zip(ks, refs)]))
            d = float(jax.jit(_maxdiff)(msgs, row_ptr, recv))
            if not (d < 0.05):        # bf16 outputs on O(1) values
                raise FloatingPointError(
                    f"stats kernel numeric preflight: max|kernel-oracle| "
                    f"= {d}")
        _STATS_KERNEL_OK = True
    except Exception as e:             # Mosaic/XLA compile or runtime error
        print(f"stats-kernel preflight failed ({type(e).__name__}): "
              f"falling back to csr_multi_reduce")
        _STATS_KERNEL_OK = False
    return _STATS_KERNEL_OK


def _use_stats_kernel(messages, max_deg: int = 0) -> bool:
    """bf16 fused-stats dispatch gate; INFOMAX3D_STATS_KERNEL=0 falls back
    to the f32 csr_multi_reduce path (A/B runs, escape hatch).  The Mosaic
    preflight gate only applies when INFOMAX3D_STATS_IMPL=pallas — the
    default mailbox forward is pure XLA and cannot be rejected."""
    import os
    if os.environ.get("INFOMAX3D_STATS_KERNEL", "1") == "0":
        return False
    if max_deg > 16:        # winner-slot enc packs amax + 16*amin
        return False
    if messages.dtype != jnp.bfloat16:
        return False
    if _stats_impl() == "pallas":
        return _STATS_KERNEL_OK is not False and messages.shape[1] <= 512
    return True


def _stats_outs(messages, row_ptr, receivers, max_deg, aggregators, has,
                interpret, tile_win=0, bwd_span=0, pos=None, affine=None):
    s1, mean, std, mx, mn = csr_pna_stats(messages, row_ptr, receivers,
                                          pos, max_deg, interpret, tile_win,
                                          bwd_span,
                                          "sum" in aggregators, affine)
    outs = {}
    for a in aggregators:
        if a == "sum":
            outs[a] = s1
        elif a == "mean":
            outs[a] = mean
        elif a == "std":
            outs[a] = std
        elif a == "max":
            outs[a] = mx
        elif a == "min":
            outs[a] = mn
        elif a == "var":
            outs[a] = jnp.where(has, std.astype(jnp.float32) ** 2 - EPS, 0.0)
        else:
            raise ValueError(f"aggregator '{a}' unsupported by the Pallas "
                             f"kernel (use the XLA path)")
    return outs


def _reduce_outs(messages, row_ptr, receivers, max_deg, aggregators,
                 deg_safe, has, interpret):
    s1, s2, mx, mn = csr_multi_reduce(messages, row_ptr, receivers, max_deg,
                                      interpret)
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
    return outs


def pna_csr_aggregate(messages, row_ptr, receivers, max_deg: int,
                      aggregators: Sequence[str],
                      scalers: Sequence[str] = ("identity",),
                      avg_d_log: float = 1.0, interpret: bool = False,
                      tile_win: int = 0, bwd_span: int = 0, pos=None):
    """PNA multi-aggregator from one fused kernel pass — value-identical to
    `ops.segment.pna_multi_aggregate` for {sum, mean, max, min, std, var}.
    Moment aggregators fall back to the XLA path upstream."""
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    deg_safe = jnp.maximum(deg, 1.0)
    has = deg > 0
    outs = {}
    if _use_stats_kernel(messages, max_deg):
        outs = _stats_outs(messages, row_ptr, receivers, max_deg,
                           aggregators, has, interpret, tile_win, bwd_span,
                           pos)
    else:
        outs = _reduce_outs(messages, row_ptr, receivers, max_deg,
                            aggregators, deg_safe, has, interpret)
    h = jnp.concatenate([jnp.asarray(outs[a], messages.dtype)
                         for a in aggregators], axis=-1)
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
                            avg_d_log: float = 1.0, interpret: bool = False,
                            tile_win: int = 0, bwd_span: int = 0, pos=None):
    """`pna_csr_aggregate` as SplitDense parts: the (scaler-major, aggregator
    -minor) block order of the concatenated tensor is preserved, but neither
    the aggregator concat nor the degree-scaled copies are materialized —
    each block becomes a ScaledPart(agg, scale) consumed lazily by the
    posttrans SplitDense (row scaling commutes with the right-matmul).
    Value-identical to running the concat version through nn.Dense.

    `messages` may be a lazy AffinePart (pretrans BN-apply): the stats
    kernel folds the column affine in-register, so the normalized [E, D]
    message tensor never hits HBM.  Non-kernel paths materialize it."""
    from infomax3d_tpu.models.base import AffinePart, ScaledPart
    affine = None
    if isinstance(messages, AffinePart):
        messages, affine = messages.x, (messages.scale, messages.shift)
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    deg_safe = jnp.maximum(deg, 1.0)
    has = deg > 0
    outs = {}
    if _use_stats_kernel(messages, max_deg):
        # bf16 fast path: the fused-stats kernel emits the final aggregates
        # directly (no node-side f32 mean/std chains, half the HBM writes,
        # double-buffered window DMA)
        outs = _stats_outs(messages, row_ptr, receivers, max_deg,
                           aggregators, has, interpret, tile_win, bwd_span,
                           pos, affine)
    else:
        if affine is not None:
            messages = (messages.astype(jnp.float32) * affine[0]
                        + affine[1]).astype(messages.dtype)
        outs = _reduce_outs(messages, row_ptr, receivers, max_deg,
                            aggregators, deg_safe, has, interpret)
    aggs = [jnp.asarray(outs[a], messages.dtype) for a in aggregators]
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


def _stats_kernel_aff(row_ptr_ref, msg_hbm, rp_lo_ref, rp_hi_ref, aff_ref,
                      out_ref, win_ref, sems, **kw):
    """_stats_kernel with a folded column affine (see AffinePart): the
    4th input is [2, DC] f32 — row 0 scale, row 1 shift."""
    _stats_kernel(row_ptr_ref, msg_hbm, rp_lo_ref, rp_hi_ref, out_ref,
                  win_ref, sems, aff_ref=aff_ref, **kw)


def _stats_kernel(row_ptr_ref, msg_hbm, rp_lo_ref, rp_hi_ref, out_ref,
                  win_ref, sems, *, TN, DC, WIN, K, E, NT, want_sum,
                  aff_ref=None):
    """bf16 fused-stats variant: emits the FINAL PNA aggregates
    (sum, mean, std, max, min) in bf16 — the mean/std node-side chains the
    f32 kernel leaves to XLA (7 layers x ~0.15 ms of [N, D] f32 elementwise)
    happen in-register here, and output HBM writes halve.  The edge-window
    DMA is double-buffered across grid steps (scratch persists on the
    sequential TPU grid): tile i+1's window streams in during tile i's
    matmuls, hiding the per-tile DMA issue+latency that serialized the
    single-buffer kernel."""
    i = pl.program_id(0)

    def dma(slot, tile):
        base = jnp.minimum(row_ptr_ref[tile * TN], E - WIN)
        base = pl.multiple_of((base // 8) * 8, 8)
        return pltpu.make_async_copy(
            msg_hbm.at[pl.ds(base, WIN), :], win_ref.at[slot], sems.at[slot])

    # 4-deep window pipeline: per-tile compute at molecular sizes (~1-2 us)
    # is shorter than HBM DMA latency, so double buffering still stalled
    # every tile; issuing 3 tiles ahead hides it
    NSLOT = 4
    slot = jax.lax.rem(i, NSLOT)

    @pl.when(i == 0)
    def _():
        for a in range(NSLOT - 1):
            if a < NT:
                dma(a, a).start()

    @pl.when(i + NSLOT - 1 < NT)
    def _():
        dma(jax.lax.rem(i + NSLOT - 1, NSLOT), i + NSLOT - 1).start()

    n0 = i * TN
    base = jnp.minimum(row_ptr_ref[n0], E - WIN)
    base = pl.multiple_of((base // 8) * 8, 8)
    # per-node ranges as VECTOR loads ([TN,1] VMEM blocks of row_ptr[:-1] /
    # row_ptr[1:]) — the old jnp.stack of TN scalar SMEM reads serialized
    # ~2N scalar ops per call (~230 us at bench shapes, independent of
    # TN/WIN; this was the kernel's real bound, not the MXU)
    starts = rp_lo_ref[:] - base                               # [TN, 1]
    ends = rp_hi_ref[:] - base                                 # [TN, 1]
    eidx = jax.lax.broadcasted_iota(jnp.int32, (TN, WIN), 1)
    inc = (eidx >= starts) & (eidx < ends)                     # [TN, WIN]

    dma(slot, i).wait()
    win = win_ref[slot]                                        # [WIN, DC] bf16
    if aff_ref is not None:
        # folded BatchNorm apply (AffinePart): the effective messages are
        # m = x*a + b per column, computed in-register and bf16-rounded —
        # value-identical to materializing bf16 m in HBM, without the
        # [E, D] apply pass (58 us/layer measured on v5e)
        win = (win.astype(jnp.float32) * aff_ref[0:1, :]
               + aff_ref[1:2, :]).astype(jnp.bfloat16)
    # exact bf16 sums: 0/1 incidence is exact in bf16, one DEFAULT pass
    # accumulates in f32; sumsq via hi/lo split (see _kernel)
    incb = inc.astype(jnp.bfloat16)
    s1 = jnp.dot(incb, win, preferred_element_type=jnp.float32)
    winf = win.astype(jnp.float32)
    sq = winf * winf
    hi = sq.astype(jnp.bfloat16)
    lo = (sq - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    s2 = (jnp.dot(incb, hi, preferred_element_type=jnp.float32)
          + jnp.dot(incb, lo, preferred_element_type=jnp.float32))

    # max/min track the WINNING SLOT (strict >/< => first tie wins) so the
    # backward routes each extremum's cotangent to exactly one edge —
    # matching the reference's torch/DGL argmax semantics (JAX's XLA
    # segment_max instead splits evenly among ties; ties are common once
    # messages are bf16-rounded).
    # unconditional slot loop: the old per-slot pl.when(s < tile_deg)
    # guards saved one matmul on sparse tiles but cost a scalar branch per
    # slot per tile — at molecular degrees nearly every tile holds a
    # max-degree node, so the guards never skipped and only added overhead
    run_max = jnp.full((TN, DC), NEG_BIG, jnp.float32)
    run_min = jnp.full((TN, DC), POS_BIG, jnp.float32)
    amax = jnp.zeros((TN, DC), jnp.float32)
    amin = jnp.zeros((TN, DC), jnp.float32)
    for s in range(K):
        tgt = starts + s                                       # [TN, 1]
        has_s = (tgt < ends)
        onehot = (eidx == tgt).astype(win.dtype)
        row = jnp.dot(onehot, win, preferred_element_type=jnp.float32)
        sf = jnp.full((), float(s), jnp.float32)
        amax = jnp.where(has_s & (row > run_max), sf, amax)
        amin = jnp.where(has_s & (row < run_min), sf, amin)
        run_max = jnp.where(has_s, jnp.maximum(run_max, row), run_max)
        run_min = jnp.where(has_s, jnp.minimum(run_min, row), run_min)

    deg = (ends - starts).astype(jnp.float32)                 # [TN, 1]
    deg_safe = jnp.maximum(deg, 1.0)
    has = deg > 0
    mean = s1 / deg_safe
    var = jax.nn.relu(s2 / deg_safe - mean * mean)
    std = jnp.sqrt(var + EPS)
    zero = jnp.zeros((), jnp.float32)
    # ONE fat output block: separate outputs cost one pipelined output-DMA
    # issue each per tile (~1.6 us/tile of fixed overhead — the kernel's
    # actual bound at molecular sizes, not the MXU); sections at DC-aligned
    # lane offsets are free to write and free for consumers to slice.
    # `sum` is emitted only when an aggregator wants it (the flagship PNA
    # config uses mean/max/min/std — skipping sum cuts output HBM 1/7) and
    # the winner slots pack into ONE `enc` section (amax + 16*amin, exact
    # in bf16 for K <= 16) consumed only by the backward.
    o = 0
    if want_sum:
        out_ref[:, 0 * DC:1 * DC] = s1.astype(jnp.bfloat16)
        o = 1
    out_ref[:, (o + 0) * DC:(o + 1) * DC] = \
        jnp.where(has, mean, zero).astype(jnp.bfloat16)
    out_ref[:, (o + 1) * DC:(o + 2) * DC] = \
        jnp.where(has, std, zero).astype(jnp.bfloat16)
    out_ref[:, (o + 2) * DC:(o + 3) * DC] = \
        jnp.where(has, run_max, zero).astype(jnp.bfloat16)
    out_ref[:, (o + 3) * DC:(o + 4) * DC] = \
        jnp.where(has, run_min, zero).astype(jnp.bfloat16)
    out_ref[:, (o + 4) * DC:(o + 5) * DC] = \
        (amax + 16.0 * amin).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _csr_stats_raw(messages, row_ptr, max_deg: int, interpret: bool,
                   tile_win: int = 0, want_sum: bool = True, affine=None):
    """Returns (sum | None, mean, std, max, min, enc), each bf16 [N, D]
    (`enc` = argmax_slot + 16*argmin_slot, exact for max_deg <= 16).
    bf16 messages only; D <= 512 (the double-buffered window must fit one
    DC chunk).

    `tile_win` (from the batcher's per-tile edge-count measurement,
    graphs/batch.py) compacts the DMA/incidence window: every MXU pass
    costs TN*WIN*DC, and the worst-case WIN = TN*max_deg is ~3x wider than
    molecular tiles ever fill (avg degree ~2).  Measured in the bench step
    on v5e: 260 us/call at the worst-case window, ~110 us compacted."""
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    TN = CSR_TILE_N
    DC = ((D + 127) // 128) * 128
    WIN = tile_win if tile_win else \
        max(((TN * max_deg + 8 + 127) // 128) * 128, 128)
    if D % DC:
        messages = jnp.pad(messages, ((0, 0), (0, DC - D % DC)))
    pad_rows = max(WIN - E, 0)
    if (E + pad_rows) % 8:
        pad_rows += 8 - (E + pad_rows) % 8
    if pad_rows:
        messages = jnp.pad(messages, ((0, pad_rows), (0, 0)))
    Ep = messages.shape[0]
    if N % TN:
        row_ptr = jnp.concatenate(
            [row_ptr, jnp.full(TN - N % TN, row_ptr[-1], row_ptr.dtype)])
    Np = row_ptr.shape[0] - 1
    NT = Np // TN

    NSEC = 6 if want_sum else 5
    out_shape = jax.ShapeDtypeStruct((Np, NSEC * DC), jnp.bfloat16)
    out_spec = pl.BlockSpec((TN, NSEC * DC), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    rp_lo = row_ptr[:-1].reshape(Np, 1)
    rp_hi = row_ptr[1:].reshape(Np, 1)
    rp_spec = pl.BlockSpec((TN, 1), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), rp_spec, rp_spec]
    inputs = [row_ptr, messages, rp_lo, rp_hi]
    if affine is not None:
        a, b = affine
        aff = jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])
        if aff.shape[1] < DC:
            # pad scale with ONES so the bf16 round of padded lanes stays
            # the identity (they are sliced away, but keep them sane)
            aff = jnp.concatenate(
                [aff, jnp.stack([jnp.ones(DC - aff.shape[1], jnp.float32),
                                 jnp.zeros(DC - aff.shape[1],
                                           jnp.float32)])], axis=1)
        in_specs.append(pl.BlockSpec((2, DC), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(aff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((4, WIN, DC), messages.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
    )
    body = _stats_kernel if affine is None else _stats_kernel_aff
    kernel = functools.partial(body, TN=TN, DC=DC, WIN=WIN,
                               K=max_deg, E=Ep, NT=NT, want_sum=want_sum)
    fat = pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                         interpret=interpret)(*inputs)
    secs = tuple(fat[:N, k * DC:k * DC + D] for k in range(NSEC))
    return (secs if want_sum else (None,) + secs)


def _csr_stats_mailbox_raw(messages, row_ptr, max_deg: int):
    """Mailbox-gather stats forward: same outputs as `_csr_stats_raw`
    (sum always present here — it falls out of the reduction for free).

    Every edge occupies exactly ONE slot of its receiver's CSR range, so the
    dense mailbox [N, K, D] is a pure row-GATHER at indices
    `row_ptr[n] + slot` — computable on device from row_ptr alone, no
    batcher support and no scatter anywhere.  TPU row gathers stream at
    near-HBM bandwidth, so this costs ~K/avg_deg x the compact edge bytes,
    while the Mosaic slot-matmul kernel costs N*WIN*D*(3+K) MXU FLOPs
    (~37 GFLOP at bench shapes = 0.47 ms/call measured on v5e vs ~0.1 ms
    here) — the matmul formulation does ~450x redundant work at molecular
    degrees (avg ~2).  Numerics: sums/sumsq accumulate in exact f32 (no
    hi/lo split needed), max/min take the bf16 values directly, argmax =
    first winner — identical contracts to the Mosaic kernel, tighter sumsq.
    """
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    deg = row_ptr[1:] - row_ptr[:-1]                           # [N] int32
    slots = jnp.arange(max_deg, dtype=row_ptr.dtype)
    valid = slots[None, :] < deg[:, None]                      # [N, K]
    idx = jnp.where(valid, row_ptr[:-1, None] + slots[None, :], E)
    msgs_p = jnp.concatenate(
        [messages, jnp.zeros((1, D), messages.dtype)], axis=0)
    mail = jnp.take(msgs_p, idx.reshape(-1), axis=0,
                    unique_indices=True).reshape(N, max_deg, D)
    vm = valid[:, :, None]
    mf = mail.astype(jnp.float32)
    s1 = jnp.sum(jnp.where(vm, mf, 0.0), axis=1)
    s2 = jnp.sum(jnp.where(vm, mf * mf, 0.0), axis=1)
    mx_m = jnp.where(vm, mf, NEG_BIG)
    mn_m = jnp.where(vm, mf, POS_BIG)
    run_max = mx_m.max(axis=1)
    run_min = mn_m.min(axis=1)
    # first-winner slots (reference torch/DGL argmax semantics; matches the
    # Mosaic kernel's strict >/< running compare)
    amax = jnp.argmax(mx_m, axis=1).astype(jnp.float32)
    amin = jnp.argmin(mn_m, axis=1).astype(jnp.float32)

    degf = deg.astype(jnp.float32)[:, None]
    deg_safe = jnp.maximum(degf, 1.0)
    has = degf > 0
    mean = s1 / deg_safe
    var = jax.nn.relu(s2 / deg_safe - mean * mean)
    std = jnp.sqrt(var + EPS)
    zero = jnp.zeros((), jnp.float32)
    dt = messages.dtype
    return (s1.astype(dt), jnp.where(has, mean, zero).astype(dt),
            jnp.where(has, std, zero).astype(dt),
            jnp.where(has, run_max, zero).astype(dt),
            jnp.where(has, run_min, zero).astype(dt),
            (amax + 16.0 * amin).astype(dt))


def _stats_impl() -> str:
    """'pallas' (default: Mosaic slot-matmul kernel) or 'mailbox' (XLA
    gather forward) — A/B measured on v5e at bench shapes: pallas 13.59 ms
    /step, mailbox 20.6 ms (XLA materializes the f32 masked [N, K, D]
    chains); the Mosaic kernel stays default until the gather forward is
    restructured to win."""
    import os
    return os.environ.get("INFOMAX3D_STATS_IMPL", "pallas")


def _stats_raw_dispatch(messages, row_ptr, max_deg, interpret, tile_win=0,
                        want_sum=True, affine=None):
    if _stats_impl() == "pallas":
        return _csr_stats_raw(messages, row_ptr, max_deg, interpret,
                              tile_win, want_sum, affine)
    if affine is not None:
        a, b = affine
        messages = (messages.astype(jnp.float32) * a
                    + b).astype(messages.dtype)
    return _csr_stats_mailbox_raw(messages, row_ptr, max_deg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def csr_pna_stats(messages, row_ptr, receivers, pos=None, max_deg: int = 0,
                  interpret: bool = False, tile_win: int = 0,
                  bwd_span: int = 0, want_sum: bool = True, affine=None):
    """(sum, mean, std, max, min) — all bf16 — with an analytic bf16
    backward: d_msg = A[r] + B[r]*msg + eq_max*d_max[r] + eq_min*d_min[r]
    where A/B are cheap node-side combinations of the cotangents.  The relu
    gate on var needs no explicit mask in the backward: where var clamps,
    (msg - mean) ~ 0 and the std term vanishes on its own.

    With `want_sum=False` the kernel skips the sum output section; the
    returned `sum` slot is then the reconstruction mean*deg (bf16-rounded —
    only request it when no aggregator consumes sum)."""
    s1, mean, std, mx, mn, _ = _stats_raw_dispatch(
        messages, row_ptr, max_deg, interpret, tile_win, want_sum, affine)
    if s1 is None:
        deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
        s1 = (mean.astype(jnp.float32) * deg).astype(mean.dtype)
    return s1, mean, std, mx, mn


def _stats_fwd(messages, row_ptr, receivers, pos=None, max_deg=0,
               interpret=False, tile_win=0, bwd_span=0, want_sum=True,
               affine=None):
    s1, mean, std, mx, mn, enc = _stats_raw_dispatch(
        messages, row_ptr, max_deg, interpret, tile_win, want_sum, affine)
    if s1 is None:
        deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
        s1 = (mean.astype(jnp.float32) * deg).astype(mean.dtype)
    return ((s1, mean, std, mx, mn),
            (messages, receivers, row_ptr, pos, mean, std, enc, affine))


def _stats_bwd(max_deg, interpret, tile_win, bwd_span, want_sum, res, cots):
    messages, receivers, row_ptr, pos, mean, std, enc, affine = res
    d_sum, d_mean, d_std, d_mx, d_mn = cots
    N = mean.shape[0]
    deg = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float32)[:, None]
    inv = 1.0 / jnp.maximum(deg, 1.0)
    # node-side combination (f32 for the divides, gathered as bf16):
    #   mean term: d_mean / deg
    #   std term:  d_std * (msg - mean) / (deg * std)
    # (msg - mean) must be formed PER EDGE, not distributed into
    # A + B*msg: bf16 rounding of the distributed terms breaks the exact
    # cancellation at degenerate nodes (deg==1 -> msg == mean -> grad 0)
    std_safe = jnp.maximum(std.astype(jnp.float32), jnp.sqrt(EPS))
    B = d_std.astype(jnp.float32) * inv / std_safe
    A = d_sum.astype(jnp.float32) + d_mean.astype(jnp.float32) * inv
    dt = messages.dtype
    D = messages.shape[1]
    if (bwd_span > 0 and dt == jnp.bfloat16 and not interpret
            and _stats_impl() == "pallas"):
        # Pallas edge-block backward: same math, no [N,6D] concat gather
        # materialization in edge space (node operands stream through ONE
        # packed per-block window; the node->edge broadcast is a single
        # one-hot MXU matmul)
        d_msg, d_a, d_b = _csr_stats_bwd_raw(
            messages, receivers, row_ptr, pos,
            (A.astype(dt), B.astype(dt), mean, d_mx.astype(dt),
             d_mn.astype(dt), enc), bwd_span, interpret, affine)
        d_aff = None if affine is None else (d_a, d_b)
        return (d_msg, None, None, None, d_aff)
    # TPU gathers are ROW-bound (~same cost at width 200 or 1400), so the
    # six node-side operands ride ONE wide gather: concat in node space
    # (N rows, cheap) then take in edge space (E rows, the expensive part)
    packed = jnp.concatenate(
        [A.astype(dt), B.astype(dt), mean, d_mx.astype(dt),
         d_mn.astype(dt), enc], axis=1)                        # [N, 6D]
    recv = receivers.clip(0, N - 1)
    rows = jnp.take(packed, recv, axis=0)                      # [E, 6D]
    Ae, Be, mean_e, dmx_e, dmn_e, enc_e = [
        jax.lax.dynamic_slice_in_dim(rows, k * D, D, axis=1) for k in range(6)]
    enc_f = enc_e.astype(jnp.float32)
    amin_e = jnp.floor(enc_f / 16.0)
    amax_e = enc_f - 16.0 * amin_e
    if affine is not None:
        # messages are pre-affine x; the formula runs on m = x*a + b
        # (bf16-rounded, matching the forward's in-register apply)
        aa, ab = affine
        m_eff = (messages.astype(jnp.float32) * aa + ab).astype(dt)
    else:
        m_eff = messages
    d_msg = Ae + Be * (m_eff - mean_e)
    # single-winner extremum routing: the kernel recorded each node's
    # argmax/argmin SLOT (packed as enc = amax + 16*amin), and an edge's
    # slot is its position within its node's CSR range — the cotangent goes
    # to exactly one edge per node (the reference's torch/DGL argmax
    # semantics; JAX's XLA segment_max would split evenly among ties)
    if pos is None:
        pos = (np.arange(receivers.shape[0], dtype=np.float32)
               - jnp.take(row_ptr, recv).astype(jnp.float32))
    pos = pos.astype(jnp.float32)[:, None]
    d_msg = d_msg + dmx_e * (pos == amax_e)
    d_msg = d_msg + dmn_e * (pos == amin_e)
    valid = (receivers < N)[:, None]
    d_msg = jnp.where(valid, d_msg, 0)
    if affine is not None:
        d_mf = d_msg.astype(jnp.float32)
        d_a = (d_mf * messages.astype(jnp.float32)).sum(axis=0)
        d_b = d_mf.sum(axis=0)
        return ((d_msg.astype(jnp.float32) * aa).astype(dt),
                None, None, None, (d_a, d_b))
    return (d_msg.astype(dt), None, None, None, None)


csr_pna_stats.defvjp(_stats_fwd, _stats_bwd)


def _seg_sum_kernel(row_ptr_ref, msg_hbm, rp_lo_ref, rp_hi_ref, out_ref,
                    win_ref, sems, *, TN, DC, WIN, E, NT):
    """Pipelined bf16 CSR segment-sum: the gather-backward kernel.

    Same structure as `_stats_kernel` (vector row_ptr loads, 4-deep window
    DMA pipeline) with ONE incidence matmul and one output — replaces the
    `sorted_segment_sum` MXU prefix-sum backward of `ops.segment.take_rows`,
    which materializes an f32 [E, D] prefix (14.7 MB at bench shapes) plus
    two boundary gathers per call (2 x 26 us measured on v5e); here the f32
    accumulation lives in-register and only the [N, D] result is written."""
    i = pl.program_id(0)

    def dma(slot, tile):
        base = jnp.minimum(row_ptr_ref[tile * TN], E - WIN)
        base = pl.multiple_of((base // 8) * 8, 8)
        return pltpu.make_async_copy(
            msg_hbm.at[pl.ds(base, WIN), :], win_ref.at[slot], sems.at[slot])

    NSLOT = 4
    slot = jax.lax.rem(i, NSLOT)

    @pl.when(i == 0)
    def _():
        for a in range(NSLOT - 1):
            if a < NT:
                dma(a, a).start()

    @pl.when(i + NSLOT - 1 < NT)
    def _():
        dma(jax.lax.rem(i + NSLOT - 1, NSLOT), i + NSLOT - 1).start()

    n0 = i * TN
    base = jnp.minimum(row_ptr_ref[n0], E - WIN)
    base = pl.multiple_of((base // 8) * 8, 8)
    starts = rp_lo_ref[:] - base                               # [TN, 1]
    ends = rp_hi_ref[:] - base
    eidx = jax.lax.broadcasted_iota(jnp.int32, (TN, WIN), 1)
    inc = ((eidx >= starts) & (eidx < ends)).astype(jnp.bfloat16)

    dma(slot, i).wait()
    # 0/1 incidence is exact in bf16; one DEFAULT pass accumulates in f32
    s1 = jnp.dot(inc, win_ref[slot], preferred_element_type=jnp.float32)
    out_ref[:] = s1.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _csr_seg_sum_raw(messages, row_ptr, max_deg: int, interpret: bool,
                     tile_win: int = 0):
    """bf16 [E, D] -> [N, D] segment sum over CSR-sorted rows (D <= 512)."""
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    TN = CSR_TILE_N
    DC = ((D + 127) // 128) * 128
    WIN = tile_win if tile_win else \
        max(((TN * max_deg + 8 + 127) // 128) * 128, 128)
    if D % DC:
        messages = jnp.pad(messages, ((0, 0), (0, DC - D % DC)))
    pad_rows = max(WIN - E, 0)
    if (E + pad_rows) % 8:
        pad_rows += 8 - (E + pad_rows) % 8
    if pad_rows:
        messages = jnp.pad(messages, ((0, pad_rows), (0, 0)))
    Ep = messages.shape[0]
    if N % TN:
        row_ptr = jnp.concatenate(
            [row_ptr, jnp.full(TN - N % TN, row_ptr[-1], row_ptr.dtype)])
    Np = row_ptr.shape[0] - 1
    NT = Np // TN

    out_spec = pl.BlockSpec((TN, DC), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    rp_lo = row_ptr[:-1].reshape(Np, 1)
    rp_hi = row_ptr[1:].reshape(Np, 1)
    rp_spec = pl.BlockSpec((TN, 1), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), rp_spec, rp_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((4, WIN, DC), messages.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
    )
    kernel = functools.partial(_seg_sum_kernel, TN=TN, DC=DC, WIN=WIN,
                               E=Ep, NT=NT)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((Np, DC), jnp.bfloat16),
        grid_spec=grid_spec, interpret=interpret)(row_ptr, messages,
                                                  rp_lo, rp_hi)
    return out[:N, :D]


def csr_segment_sum_bf16(ct, row_ptr, max_deg: int, tile_win: int = 0,
                         interpret: bool = False):
    """Public entry for the gather-backward segment sum (bf16 only)."""
    return _csr_seg_sum_raw(ct, row_ptr, max_deg, interpret, tile_win)


def _snd_seg_sum_kernel(base_ref, ct_hbm, rp_lo_ref, rp_hi_ref, out_refs,
                        w_ct, sems, *, TN, DC, WIN, NT, LIM, SD,
                        want_recv):
    """Segment-sum keyed by SENDER directly over receiver-sorted (CSR) edge
    rows: d_hs[n] = sum over {e : senders[e] == n} of ct[e] — replacing the
    CSC path's [E, D] permutation gather (take(ct, csc_perm), ~58 us/layer
    on v5e) + sorted seg-sum.  Molecules are contiguous in csr order, so
    all edges SENT by a TN-node tile live in a bounded csr window
    (batcher-measured csr_pair_base / csr_pair_win).

    The sender ids ride in two spare LANES of the lane-padded ct window
    (hi = s // 128, lo = s % 128, both exact in bf16) — no second DMA
    stream and no lane-alignment constraints.  With `want_recv`, the SAME
    window also yields d_hd (receiver seg-sum from the row_ptr incidence):
    the window bytes — the dominant cost — are paid once for both halves
    of the edge-combine backward."""
    i = pl.program_id(0)

    def _b(tile):
        v = (base_ref[tile] // 8) * 8
        if LIM >= 0:
            v = jnp.minimum(v, LIM)
        return pl.multiple_of(v, 8)

    def dma(slot, tile):
        return pltpu.make_async_copy(
            ct_hbm.at[pl.ds(_b(tile), WIN), :], w_ct.at[slot],
            sems.at[slot])

    NSLOT = 4
    slot = jax.lax.rem(i, NSLOT)

    @pl.when(i == 0)
    def _():
        for a in range(NSLOT - 1):
            if a < NT:
                dma(a, a).start()

    @pl.when(i + NSLOT - 1 < NT)
    def _():
        dma(jax.lax.rem(i + NSLOT - 1, NSLOT), i + NSLOT - 1).start()

    dma(slot, i).wait()
    win = w_ct[slot]                                           # [WIN, DCA]
    vals = win[:, :DC]
    snd = (win[:, SD:SD + 1].astype(jnp.float32) * 128.0
           + win[:, SD + 1:SD + 2].astype(jnp.float32))        # [WIN, 1]
    nid = (i * TN
           + jax.lax.broadcasted_iota(jnp.int32, (WIN, TN), 1)) \
        .astype(jnp.float32)
    inc_wt = (snd == nid).astype(jnp.bfloat16)                 # [WIN, TN]
    d_hs = jax.lax.dot_general(inc_wt, vals, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if want_recv:
        base = _b(i)
        starts = rp_lo_ref[:] - base                           # [TN, 1]
        ends = rp_hi_ref[:] - base
        eidx = jax.lax.broadcasted_iota(jnp.int32, (TN, WIN), 1)
        inc_r = ((eidx >= starts) & (eidx < ends)).astype(jnp.bfloat16)
        d_hd = jnp.dot(inc_r, vals, preferred_element_type=jnp.float32)
        out_refs[0][:] = d_hd.astype(out_refs[0].dtype)
        out_refs[1][:] = d_hs.astype(out_refs[1].dtype)
    else:
        out_refs[:] = d_hs.astype(out_refs.dtype)


def _snd_kernel_norecv(base_ref, ct_hbm, out_ref, w_ct, sems, **kw):
    _snd_seg_sum_kernel(base_ref, ct_hbm, None, None, out_ref, w_ct, sems,
                        want_recv=False, **kw)


def _snd_kernel_pair(base_ref, ct_hbm, rp_lo_ref, rp_hi_ref, dhd_ref,
                     dhs_ref, w_ct, sems, **kw):
    _snd_seg_sum_kernel(base_ref, ct_hbm, rp_lo_ref, rp_hi_ref,
                        (dhd_ref, dhs_ref), w_ct, sems, want_recv=True,
                        **kw)


def _snd_augment(ct, senders, D, DC, WIN):
    """Lane-pad ct to [Ep, DCA] with sender ids encoded in the two lanes
    right after the data (hi = s // 128, lo = s % 128, exact in bf16 for
    N < 2^15).  When the existing lane pad has >= 2 spare lanes
    (D <= DC - 2, e.g. 200 -> 256) the ids ride INSIDE it — the augmented
    write costs exactly what the plain lane pad would have; otherwise one
    extra 128-lane section is appended.  Returns (array, Ep, DCA)."""
    E = ct.shape[0]
    NBIG = jnp.iinfo(jnp.int32).max // 4
    snd = jnp.pad(senders.astype(jnp.int32), (0, max(0, WIN - E)),
                  constant_values=NBIG)
    Ep0 = snd.shape[0]
    if Ep0 % 8:
        snd = jnp.pad(snd, (0, 8 - Ep0 % 8), constant_values=NBIG)
    Ep = snd.shape[0]
    hi = (snd // 128).astype(jnp.bfloat16)[:, None]
    lo = (snd % 128).astype(jnp.bfloat16)[:, None]
    ct = ct.astype(jnp.bfloat16)
    if Ep > E:
        ct = jnp.pad(ct, ((0, Ep - E), (0, 0)))
    DCA = DC if D + 2 <= DC else DC + 128
    tail = DCA - D - 2
    parts = [ct, hi, lo]
    if tail:
        parts.append(jnp.zeros((Ep, tail), jnp.bfloat16))
    return jnp.concatenate(parts, axis=1), Ep, DCA


@functools.partial(jax.jit, static_argnums=(3, 4))
def snd_segment_sum_bf16(ct, senders, pair_base, pair_win: int,
                         interpret: bool = False):
    """bf16 [E, D] -> [NTt*TILE_N, D] sum keyed by `senders` over
    csr-ordered rows (see _snd_seg_sum_kernel); caller slices [:N]."""
    E, D = ct.shape
    TN = CSR_TILE_N
    NTt = pair_base.shape[0]
    # _snd_augment's hi/lo bf16 sender-id encoding is exact only for
    # ids < 2^15 (hi must stay an exact bf16 integer, i.e. <= 256);
    # dispatchers fall back to the CSC path above this — enforce it here
    # so a new caller can't silently corrupt gradients.
    assert NTt * TN < 2 ** 15, (
        f"snd_segment_sum_bf16: {NTt * TN} padded nodes >= 2^15 — sender-id "
        "lane encoding would be inexact; use the CSC-permuted seg-sum path")
    DC = ((D + 127) // 128) * 128
    WIN = pair_win
    cta, Ep, DCA = _snd_augment(ct, senders, D, DC, WIN)
    LIM = Ep - WIN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NTt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TN, DC), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, WIN, DCA), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((4,))],
    )
    kernel = functools.partial(_snd_kernel_norecv, TN=TN, DC=DC, WIN=WIN,
                               NT=NTt, LIM=LIM, SD=D)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((NTt * TN, DC), jnp.bfloat16),
        grid_spec=grid_spec, interpret=interpret)(pair_base, cta)
    return out[:, :D]


@functools.partial(jax.jit, static_argnums=(4, 5))
def pair_segment_sum_bf16(ct, senders, row_ptr, pair_base, pair_win: int,
                          interpret: bool = False):
    """(d_hd, d_hs) — receiver- AND sender-keyed segment sums of ct over
    csr-ordered rows from ONE window stream (the edge-combine backward
    pair).  Returns [N, D] each (N from row_ptr)."""
    E, D = ct.shape
    N = row_ptr.shape[0] - 1
    assert N < 2 ** 15, (
        f"pair_segment_sum_bf16: {N} padded nodes >= 2^15 — sender-id "
        "lane encoding would be inexact; use the CSC-permuted seg-sum path")
    TN = CSR_TILE_N
    NTt = pair_base.shape[0]
    DC = ((D + 127) // 128) * 128
    WIN = pair_win
    cta, Ep, DCA = _snd_augment(ct, senders, D, DC, WIN)
    LIM = Ep - WIN
    rp = row_ptr
    if N % TN:
        rp = jnp.concatenate(
            [rp, jnp.full(NTt * TN - N, rp[-1], rp.dtype)])
    rp_lo = rp[:-1].reshape(NTt * TN, 1)
    rp_hi = rp[1:].reshape(NTt * TN, 1)
    rp_spec = pl.BlockSpec((TN, 1), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NTt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), rp_spec, rp_spec],
        out_specs=[pl.BlockSpec((TN, DC), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((4, WIN, DCA), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((4,))],
    )
    kernel = functools.partial(_snd_kernel_pair, TN=TN, DC=DC, WIN=WIN,
                               NT=NTt, LIM=LIM, SD=D)
    d_hd, d_hs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((NTt * TN, DC), jnp.bfloat16)] * 2,
        grid_spec=grid_spec, interpret=interpret)(pair_base, cta, rp_lo,
                                                  rp_hi)
    return d_hd[:N, :D], d_hs[:N, :D]


def _edge_combine_kernel(bns_ref, ops_hbm, pe_ref, recv_ref, send_ref,
                         out_ref, w_ops, sems, *, TE, TNW, DC, N, NT, LIM):
    """Fused edge combine: z[e] = hd[recv[e]] + hs[send[e]] + pe[e].

    Replaces the two forward row-gathers + the edge-space add chain of a
    message MLP's first layer (PNA pretrans SplitDense): per edge block,
    ONE packed node window [TNW, 2*DC] (hd | hs) streams in (3-deep DMA
    pipeline) and two one-hot MXU matmuls broadcast both operands — the
    [E, D] gather outputs never hit HBM.  Within a CSR-sorted edge block
    both receivers AND senders stay inside the touched molecules' node
    range, so one window covers both (batcher-measured `csr_cmb_span`).
    Padding edges (recv == N) write pe alone (zero one-hot rows)."""
    t = pl.program_id(0)

    def _ns(blk):
        # LIM >= 0: clamp the window start so the node array needs no +TNW
        # slack pad (a full-array HBM copy); see _stats_bwd_kernel
        v = (bns_ref[blk] // 8) * 8
        if LIM >= 0:
            v = jnp.minimum(v, LIM)
        return pl.multiple_of(v, 8)

    def dma(slot, blk):
        return pltpu.make_async_copy(
            ops_hbm.at[pl.ds(_ns(blk), TNW), :], w_ops.at[slot],
            sems.at[slot])

    NSLOT = 3
    slot = jax.lax.rem(t, NSLOT)

    @pl.when(t == 0)
    def _():
        for a in range(NSLOT - 1):
            if a < NT:
                dma(a, a).start()

    @pl.when(t + NSLOT - 1 < NT)
    def _():
        dma(jax.lax.rem(t + NSLOT - 1, NSLOT), t + NSLOT - 1).start()

    ns = _ns(t)
    recv = recv_ref[:]                                        # [TE, 1] i32
    send = send_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TE, TNW), 1)
    inc_r = (lane == recv - ns).astype(jnp.bfloat16)          # [TE, TNW]
    inc_s = (lane == send - ns).astype(jnp.bfloat16)

    dma(slot, t).wait()
    win = w_ops[slot]                                         # [TNW, 2DC]
    zd = jnp.dot(inc_r, win[:, 0 * DC:1 * DC],
                 preferred_element_type=jnp.float32)
    zs = jnp.dot(inc_s, win[:, 1 * DC:2 * DC],
                 preferred_element_type=jnp.float32)
    out_ref[:] = (zd + zs + pe_ref[:].astype(jnp.float32)) \
        .astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _csr_edge_combine_raw(hd, hs, pe, receivers, senders,
                          cmb_span: int, interpret: bool):
    """z[e] = hd[recv[e]] + hs[send[e]] + pe[e], all bf16 [.., D<=512]."""
    E, D = pe.shape
    N = hd.shape[0]
    TE = CSR_TILE_E
    TNW = cmb_span
    DC = ((D + 127) // 128) * 128

    def lane_pad(x):
        x = x.astype(jnp.bfloat16)
        if x.shape[1] < DC:
            x = jnp.pad(x, ((0, 0), (0, DC - x.shape[1])))
        return x

    packed = jnp.concatenate([lane_pad(hd), lane_pad(hs)], axis=1)
    if N % 8 == 0 and N >= TNW:
        LIM = N - TNW                  # clamped windows, no slack pad
    else:
        packed = jnp.pad(packed, ((0, TNW), (0, 0)))          # window slack
        LIM = -1

    NT = (E + TE - 1) // TE
    Ep = NT * TE
    pe_p = lane_pad(pe)
    if Ep > E:
        pe_p = jnp.pad(pe_p, ((0, Ep - E), (0, 0)))
    recv_p = jnp.pad(receivers.astype(jnp.int32), (0, Ep - E),
                     constant_values=-1).reshape(Ep, 1)
    send_p = jnp.pad(senders.astype(jnp.int32), (0, Ep - E),
                     constant_values=-1).reshape(Ep, 1)
    # per-block window start: min touched node over the block's real edges
    lo_r = jnp.where(receivers < N, receivers.astype(jnp.int32), N - 1)
    lo_s = jnp.where(senders < N, senders.astype(jnp.int32), N - 1)
    lo = jnp.minimum(lo_r, lo_s)
    lo = jnp.pad(lo, (0, Ep - E), constant_values=N - 1)
    bns = jnp.clip(lo.reshape(NT, TE).min(axis=1), 0, max(N - 1, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((TE, DC), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TE, 1), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TE, 1), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TE, DC), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, TNW, 2 * DC), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((3,))],
    )
    kernel = functools.partial(_edge_combine_kernel, TE=TE, TNW=TNW, DC=DC,
                               N=N, NT=NT, LIM=LIM)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((Ep, DC), jnp.bfloat16),
        grid_spec=grid_spec, interpret=interpret)(
        bns, packed, pe_p, recv_p, send_p)
    return out[:E, :D]


def _combine_kernel_ok(hd, pe, cmb_span: int) -> bool:
    import os
    if cmb_span <= 0 or os.environ.get("INFOMAX3D_COMBINE_KERNEL", "1") == "0":
        return False
    return (hd.dtype == jnp.bfloat16 and pe.dtype == jnp.bfloat16
            and pe.shape[1] <= 512 and jax.default_backend() != "cpu")


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14))
def csr_edge_combine(hd, hs, pe, receivers, senders, row_ptr, csc_row_ptr,
                     csc_perm, snd_base=None, max_deg: int = 0,
                     tile_win: int = 0, csc_tile_win: int = 0,
                     cmb_span: int = 0, interpret: bool = False,
                     snd_win: int = 0):
    """Fused `hd[recv] + hs[send] + pe` with scatter-free backwards:
    d_hd rides the Pallas incidence seg-sum (CSR order); d_hs rides the
    SENDER-KEYED seg-sum when snd_base/snd_win are given (no csc
    permutation gather), else the CSC-order seg-sum; d_pe is the cotangent
    itself.  Falls back to clip-gathers + add when the kernel is
    unavailable (CPU, f32, no span marker)."""
    if _combine_kernel_ok(hd, pe, cmb_span):
        return _csr_edge_combine_raw(hd, hs, pe, receivers, senders,
                                     cmb_span, interpret)
    N = hd.shape[0]
    return (jnp.take(hd, receivers.clip(0, N - 1), axis=0)
            + jnp.take(hs, senders.clip(0, N - 1), axis=0) + pe)


def _combine_fwd(hd, hs, pe, receivers, senders, row_ptr, csc_row_ptr,
                 csc_perm, snd_base=None, max_deg=0, tile_win=0,
                 csc_tile_win=0, cmb_span=0, interpret=False, snd_win=0):
    z = csr_edge_combine(hd, hs, pe, receivers, senders, row_ptr,
                         csc_row_ptr, csc_perm, snd_base, max_deg, tile_win,
                         csc_tile_win, cmb_span, interpret, snd_win)
    return z, (receivers, senders, row_ptr, csc_row_ptr, csc_perm,
               snd_base, hd.shape[0])


def _combine_bwd(max_deg, tile_win, csc_tile_win, cmb_span, interpret,
                 snd_win, res, ct):
    from infomax3d_tpu.ops.segment import (_use_segsum_kernel,
                                           sorted_segment_sum)
    receivers, senders, row_ptr, csc_row_ptr, csc_perm, snd_base, n = res
    if _use_segsum_kernel(ct, max_deg):
        # n < 2^15: the pair kernel's bf16 sender-id lane encoding is only
        # exact below that (see _snd_augment); bigger batches use CSC
        if snd_win > 0 and snd_base is not None and n < 2 ** 15:
            # both halves from ONE window stream; no csc permutation gather
            d_hd, d_hs = pair_segment_sum_bf16(ct, senders, row_ptr,
                                               snd_base, snd_win, interpret)
        else:
            d_hd = _csr_seg_sum_raw(ct, row_ptr, max_deg, interpret,
                                    tile_win)
            d_hs = _csr_seg_sum_raw(jnp.take(ct, csc_perm, axis=0),
                                    csc_row_ptr, max_deg, interpret,
                                    csc_tile_win)
    else:
        d_hd = sorted_segment_sum(ct, row_ptr)
        d_hs = sorted_segment_sum(jnp.take(ct, csc_perm, axis=0),
                                  csc_row_ptr)
    return d_hd, d_hs, ct, None, None, None, None, None, None


csr_edge_combine.defvjp(_combine_fwd, _combine_bwd)


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


def _stats_bwd_kernel_aff(bns_ref, ops_hbm, msg_ref, recv_ref, pos_ref,
                          aff_ref, out_ref, pa_ref, pb_ref, w_ops, sems,
                          **kw):
    """_stats_bwd_kernel with a folded column affine: messages input is the
    pre-affine x, aff is [2, DC] f32 (scale, shift); emits per-block
    column partials pa = sum(d_m * x), pb = sum(d_m) for the affine's own
    cotangents, and scales the returned d_x by the affine scale."""
    _stats_bwd_kernel(bns_ref, ops_hbm, msg_ref, recv_ref, pos_ref, out_ref,
                      w_ops, sems, aff_ref=aff_ref, pa_ref=pa_ref,
                      pb_ref=pb_ref, **kw)


def _stats_bwd_kernel(bns_ref, ops_hbm, msg_ref, recv_ref, pos_ref, out_ref,
                      w_ops, sems, *, TE, TNW, DC, N, NT, LIM,
                      aff_ref=None, pa_ref=None, pb_ref=None):
    """Edge-block stats backward: ONE packed node-window DMA per block, the
    node->edge broadcast of all six operands rides a single one-hot MXU
    matmul — the [N, 6D] gather materialization in edge space of the XLA
    backward (tens of MB per layer) never exists.  The edge's slot within
    its receiver's CSR range arrives as a per-edge input (`pos`), so no
    row_ptr decoding happens in-kernel.

    LIM >= 0: window starts are clamped to LIM (= rows - TNW, 8-aligned) so
    the operand array needs NO slack rows — the wrapper's old +TNW pad was
    a full [N, 6D] HBM copy (~83 us at bench shapes).  Receivers stay
    covered: a clamped window ends exactly at the last row."""
    t = pl.program_id(0)

    def _ns(blk):
        v = (bns_ref[blk] // 8) * 8
        if LIM >= 0:
            v = jnp.minimum(v, LIM)
        return pl.multiple_of(v, 8)

    def dma(slot, blk):
        return pltpu.make_async_copy(
            ops_hbm.at[pl.ds(_ns(blk), TNW), :], w_ops.at[slot],
            sems.at[slot])

    # 3-deep operand-window pipeline (same rationale as the forward
    # kernel: block compute is shorter than DMA latency)
    NSLOT = 3
    slot = jax.lax.rem(t, NSLOT)

    @pl.when(t == 0)
    def _():
        for a in range(NSLOT - 1):
            if a < NT:
                dma(a, a).start()

    @pl.when(t + NSLOT - 1 < NT)
    def _():
        dma(jax.lax.rem(t + NSLOT - 1, NSLOT), t + NSLOT - 1).start()

    ns = _ns(t)
    recv = recv_ref[:]                                        # [TE, 1] i32
    rel = recv - ns
    lane = jax.lax.broadcasted_iota(jnp.int32, (TE, TNW), 1)
    inc = (lane == rel).astype(jnp.bfloat16)                  # [TE, TNW]

    dma(slot, t).wait()
    # exact bf16-value broadcast of ALL operands: one-hot rows, f32
    # accumulation, one MXU pass over the packed [TNW, 6*DC] window
    big = jnp.dot(inc, w_ops[slot], preferred_element_type=jnp.float32)
    a_e = big[:, 0 * DC:1 * DC]
    b_e = big[:, 1 * DC:2 * DC]
    mean_e = big[:, 2 * DC:3 * DC]
    dmx_e = big[:, 3 * DC:4 * DC]
    dmn_e = big[:, 4 * DC:5 * DC]
    enc_e = big[:, 5 * DC:6 * DC]

    pos = pos_ref[:].astype(jnp.float32)                      # [TE, 1]
    amin_e = jnp.floor(enc_e / 16.0)
    amax_e = enc_e - 16.0 * amin_e

    msg = msg_ref[:].astype(jnp.float32)                      # [TE, DC]
    if aff_ref is not None:
        # messages input is pre-affine x; the formula runs on the
        # bf16-rounded m = x*a + b (matching the forward's in-register
        # apply)
        x = msg
        msg = (x * aff_ref[0:1, :] + aff_ref[1:2, :]) \
            .astype(jnp.bfloat16).astype(jnp.float32)
    d = a_e + b_e * (msg - mean_e)
    d = d + dmx_e * (pos == amax_e)
    d = d + dmn_e * (pos == amin_e)
    valid = (recv >= 0) & (recv < N)
    d = jnp.where(valid, d, 0.0)
    if aff_ref is not None:
        pa_ref[:] = jnp.pad((d * x).sum(axis=0, keepdims=True),
                            ((0, 7), (0, 0)))
        pb_ref[:] = jnp.pad(d.sum(axis=0, keepdims=True), ((0, 7), (0, 0)))
        d = d * aff_ref[0:1, :]
    out_ref[:] = d.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _csr_stats_bwd_raw(messages, receivers, row_ptr, pos, operands,
                       bwd_span: int, interpret: bool, affine=None):
    """operands = (A, B, mean, d_mx, d_mn, enc) node-side bf16 [N, D]
    (A/B already combined and enc = amax + 16*amin from the forward, see
    _stats_bwd).  `pos` is the batcher-precomputed per-edge CSR slot
    (csr_pos, int16, -1 on padding); None falls back to the in-jit gather.
    Returns (d_msg [E, D] bf16, d_scale, d_shift) — the affine cotangents
    are None unless `affine` (scale, shift) is given, in which case
    `messages` is the pre-affine x (see csr_pna_stats)."""
    E, D = messages.shape
    N = row_ptr.shape[0] - 1
    TE = CSR_TILE_E
    TNW = bwd_span
    DC = ((D + 127) // 128) * 128

    def lane_pad(x):
        x = x.astype(jnp.bfloat16)
        if x.shape[1] < DC:
            x = jnp.pad(x, ((0, 0), (0, DC - x.shape[1])))
        return x

    # ONE packed operand array: a node-space concat (N rows, cheap) buys a
    # single window DMA stream per block instead of 7 (the per-block DMA
    # issue overhead dominated at molecular block sizes)
    packed = jnp.concatenate([lane_pad(x) for x in operands], axis=1)
    # window-overrun handling: when N is 8-aligned and tall enough, clamp
    # the window start in-kernel (LIM) instead of padding — the +TNW slack
    # pad is a full [N, 6D] HBM copy (XLA materializes pads)
    if N % 8 == 0 and N >= TNW:
        LIM = N - TNW                  # multiple of 8 (TNW is 128-aligned)
    else:
        packed = jnp.pad(packed, ((0, TNW), (0, 0)))          # window slack
        LIM = -1

    NT = (E + TE - 1) // TE
    Ep = NT * TE
    msg_p = messages.astype(jnp.bfloat16)
    if msg_p.shape[1] < DC:
        msg_p = jnp.pad(msg_p, ((0, 0), (0, DC - D)))
    if Ep > E:
        msg_p = jnp.pad(msg_p, ((0, Ep - E), (0, 0)))
    recv_p = jnp.pad(receivers.astype(jnp.int32), (0, Ep - E),
                     constant_values=-1).reshape(Ep, 1)
    # per-edge slot within its receiver's CSR range (values < max_deg <= 16,
    # exact in bf16); padding rows get slot -1 (matches nothing).  The
    # batcher precomputes it (csr_pos) — the in-jit fallback's 1D
    # take(row_ptr, receivers) gather measured 131 us/step on v5e.
    if pos is None:
        pos = (np.arange(E, dtype=np.float32)
               - jnp.take(row_ptr,
                          receivers.clip(0, N - 1)).astype(jnp.float32))
    pos = jnp.pad(pos.astype(jnp.bfloat16), (0, Ep - E),
                  constant_values=-1.0).reshape(Ep, 1)
    # block window start = receiver of the block's first edge (edges are
    # receiver-sorted, so no searchsorted is needed)
    bns = jnp.clip(recv_p[::TE, 0], 0, N - 1)

    blk = lambda h, w: pl.BlockSpec((h, w), lambda t, *_: (t, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), blk(TE, DC),
                blk(TE, 1), blk(TE, 1)]
    inputs = [bns, packed, msg_p, recv_p, pos]
    out_shape = [jax.ShapeDtypeStruct((Ep, DC), jnp.bfloat16)]
    out_specs = [blk(TE, DC)]
    if affine is not None:
        a, b = affine
        aff = jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])
        if aff.shape[1] < DC:
            aff = jnp.concatenate(
                [aff, jnp.stack([jnp.ones(DC - aff.shape[1], jnp.float32),
                                 jnp.zeros(DC - aff.shape[1],
                                           jnp.float32)])], axis=1)
        in_specs.append(pl.BlockSpec((2, DC), lambda t, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(aff)
        # per-block column partials of the affine cotangents (8 sublane
        # rows per block — Mosaic minimum; rows 1-7 are written zero)
        out_shape += [jax.ShapeDtypeStruct((NT * 8, DC), jnp.float32)] * 2
        out_specs += [blk(8, DC)] * 2
    body = _stats_bwd_kernel if affine is None else _stats_bwd_kernel_aff
    kernel = functools.partial(body, TE=TE, TNW=TNW, DC=DC,
                               N=N, NT=NT, LIM=LIM)
    outs = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NT,), in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((3, TNW, 6 * DC), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((3,))]),
        interpret=interpret)(*inputs)
    if affine is not None:
        return (outs[0][:E, :D], outs[1].sum(axis=0)[:D],
                outs[2].sum(axis=0)[:D])
    return outs[0][:E, :D], None, None
