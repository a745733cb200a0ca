"""Node-sharded edge partitioning (parallel/node_partition.py): equality vs
the single-device computation and genuine 1/k per-device memory.

Two workloads on the virtual 8-device mesh:
* a molecular batch (independent components — near-zero halo), and
* ONE giant connected graph spanning all shards (the "graphs too big for a
  chip" case — halo exchange actually carries boundary features).

The computation is a Net3D-style message-passing layer (gather src/dst,
message MLP math, sum+mean aggregation) built from the partition
primitives, compared against the identical full-graph math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.parallel.node_partition import (
    build_node_partition, halo_exchange, local_segment_reduce)

NDEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:NDEV]), ("graph",))


def _full_reference(h, w, senders, receivers, edge_mask, N):
    """single-device math: msg = tanh((h[s] + 2 h[r]) @ w); sum & mean."""
    msg = jnp.tanh((h[senders] + 2.0 * h[receivers]) @ w)
    msg = jnp.where(edge_mask[:, None], msg, 0.0)
    s = jax.ops.segment_sum(msg, receivers, num_segments=N)
    deg = jax.ops.segment_sum(edge_mask.astype(h.dtype), receivers,
                              num_segments=N)
    return s, s / jnp.maximum(deg, 1.0)[:, None]


def _partitioned(plan, h_full, w):
    """the same math through the node-sharded primitives."""
    k = plan.k
    Nl = plan.n_local
    h_sh = jnp.asarray(h_full[np.minimum(plan.node_idx, h_full.shape[0] - 1)]
                       * plan.node_mask[..., None])          # [k, Nl, D]
    si = [jnp.asarray(s) for s in plan.send_idx]
    sl = jnp.asarray(plan.senders_loc)
    rl = jnp.asarray(plan.receivers_loc)
    em = jnp.asarray(plan.edge_mask)

    def f(h_loc, sl_s, rl_s, em_s, *si_s):
        h_loc, sl_s, rl_s, em_s = h_loc[0], sl_s[0], rl_s[0], em_s[0]
        si_s = [x[0] for x in si_s]
        h_ext = halo_exchange(h_loc, si_s, "graph", k)
        msg = jnp.tanh((h_ext[sl_s] + 2.0 * h_loc[rl_s]) @ w)
        s = local_segment_reduce(msg, rl_s, em_s, Nl, "sum")
        m = local_segment_reduce(msg, rl_s, em_s, Nl, "mean")
        return s[None], m[None]

    with _mesh() as mesh:
        s, m = jax.jit(jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("graph"),) * (4 + len(si)),
            out_specs=(P("graph"), P("graph")), check_vma=False))(
            h_sh, sl, rl, em, *si)
    return np.asarray(s), np.asarray(m)


def _gather_back(plan, out_sh, N):
    """shard-stacked [k, Nl, D] -> full [N, D] by owned global ids."""
    D = out_sh.shape[-1]
    full = np.zeros((N, D), out_sh.dtype)
    for s in range(plan.k):
        sel = plan.node_mask[s]
        full[plan.node_idx[s][sel]] = out_sh[s][sel]
    return full


def _check(senders, receivers, edge_mask, N, seed=0):
    rng = np.random.default_rng(seed)
    D = 24
    h = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.3)
    plan = build_node_partition(senders, receivers, edge_mask, N, NDEV)

    s_ref, m_ref = _full_reference(h, w, jnp.asarray(senders),
                                   jnp.asarray(receivers),
                                   jnp.asarray(edge_mask), N)
    s_sh = _gather_back(plan, *(lambda o: (o[0], N))(
        _partitioned(plan, np.asarray(h), w)))
    out_s, out_m = _partitioned(plan, np.asarray(h), w)
    np.testing.assert_allclose(_gather_back(plan, out_s, N),
                               np.asarray(s_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(_gather_back(plan, out_m, N),
                               np.asarray(m_ref), rtol=2e-5, atol=2e-5)
    return plan


def test_molecular_batch_equality_and_memory():
    ds = SyntheticMolecules(64, seed=3, n_min=8, n_max=20)
    mols = [ds.graph2d(i) for i in range(64)]
    off, src, dst = 0, [], []
    for m in mols:
        src.append(m["senders"] + off)
        dst.append(m["receivers"] + off)
        off += m["node_feat"].shape[0]
    senders = np.concatenate(src).astype(np.int32)
    receivers = np.concatenate(dst).astype(np.int32)
    N = off
    plan = _check(senders, receivers, np.ones_like(senders, bool), N)

    # per-device memory genuinely ~1/k: owned rows + halo << N
    assert plan.n_local <= int(np.ceil(N / NDEV / 8) * 8)
    assert plan.extended_rows < N / 2, \
        (f"extended table {plan.extended_rows} rows not << N={N} — node "
         f"arrays would not shrink")
    # per-shard edge arrays ~E/k (receiver-owned, contiguous shards)
    assert plan.senders_loc.shape[1] < senders.shape[0] / 2


def test_single_giant_graph_halo_exchange():
    """One connected graph spanning every shard: boundary features must
    actually travel through the ppermute rounds."""
    rng = np.random.default_rng(7)
    N = 512
    # ring + random chords => connected, boundary edges on every shard cut
    src = np.arange(N)
    dst = (np.arange(N) + 1) % N
    chord_a = rng.integers(0, N, 300)
    chord_b = rng.integers(0, N, 300)
    keep = chord_a != chord_b
    senders = np.concatenate([src, dst, chord_a[keep], chord_b[keep]])
    receivers = np.concatenate([dst, src, chord_b[keep], chord_a[keep]])
    senders = senders.astype(np.int32)
    receivers = receivers.astype(np.int32)
    plan = _check(senders, receivers, np.ones_like(senders, bool), N, seed=1)
    # the halo is non-trivial here (cross-shard chords everywhere)
    assert sum(plan.halo_sizes) >= 8 * (NDEV - 1)


def test_padding_edges_are_inert():
    ds = SyntheticMolecules(16, seed=5, n_min=6, n_max=12)
    mols = [ds.graph2d(i) for i in range(16)]
    off, src, dst = 0, [], []
    for m in mols:
        src.append(m["senders"] + off)
        dst.append(m["receivers"] + off)
        off += m["node_feat"].shape[0]
    senders = np.concatenate(src).astype(np.int32)
    receivers = np.concatenate(dst).astype(np.int32)
    mask = np.ones_like(senders, bool)
    # append masked-out padding edges pointing anywhere
    pad = 32
    senders = np.concatenate([senders, np.zeros(pad, np.int32)])
    receivers = np.concatenate([receivers,
                                np.full(pad, off - 1, np.int32)])
    mask = np.concatenate([mask, np.zeros(pad, bool)])
    _check(senders, receivers, mask, off, seed=2)
