"""Pallas CSR fused aggregation: parity vs segment ops (interpret mode on the
CPU mesh; the same kernel compiles for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infomax3d_tpu.ops.pallas.spmm import (
    csr_multi_reduce, csr_sum, pna_csr_aggregate,
)
from infomax3d_tpu.ops.segment import (
    pna_multi_aggregate, segment_max, segment_min, segment_sum,
)


def make_csr(rng, N=40, deg_max=6, D=32):
    degs = rng.integers(0, deg_max + 1, size=N)
    E_real = int(degs.sum())
    E = E_real + 17                     # padding edges
    receivers = np.concatenate([np.repeat(np.arange(N), degs),
                                np.full(17, N)]).astype(np.int32)
    row_ptr = np.zeros(N + 1, np.int32)
    np.cumsum(degs, out=row_ptr[1:])
    messages = rng.normal(size=(E, D)).astype(np.float32)
    return (jnp.asarray(messages), jnp.asarray(row_ptr),
            jnp.asarray(receivers), int(deg_max))


def test_csr_reduce_matches_segment(rng):
    msgs, row_ptr, recv, K = make_csr(rng)
    N = row_ptr.shape[0] - 1
    s, s2, mx, mn = csr_multi_reduce(msgs, row_ptr, recv, K, True)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(segment_sum(msgs, recv, N)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(segment_sum(msgs * msgs, recv, N)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx),
                               np.asarray(segment_max(msgs, recv, N)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mn),
                               np.asarray(segment_min(msgs, recv, N)),
                               rtol=1e-5, atol=1e-5)


def test_csr_gradients_match(rng):
    msgs, row_ptr, recv, K = make_csr(rng, N=24, deg_max=5, D=16)
    N = row_ptr.shape[0] - 1
    w = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def f_pallas(m):
        s, s2, mx, mn = csr_multi_reduce(m, row_ptr, recv, K, True)
        return (w[0] * s ** 2 + w[1] * s2 + w[2] * mx ** 2 +
                w[3] * mn ** 2).sum()

    def f_ref(m):
        s = segment_sum(m, recv, N)
        s2 = segment_sum(m * m, recv, N)
        mx = segment_max(m, recv, N)
        mn = segment_min(m, recv, N)
        return (w[0] * s ** 2 + w[1] * s2 + w[2] * mx ** 2 +
                w[3] * mn ** 2).sum()

    g_p = jax.grad(f_pallas)(msgs)
    g_r = jax.grad(f_ref)(msgs)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=1e-4,
                               atol=1e-4)


def test_pna_csr_aggregate_matches(rng):
    msgs, row_ptr, recv, K = make_csr(rng, N=32, deg_max=7, D=24)
    N = row_ptr.shape[0] - 1
    aggs = ["mean", "max", "min", "std"]
    scalers = ["identity", "amplification", "attenuation"]
    got = pna_csr_aggregate(msgs, row_ptr, recv, K, aggs, scalers, 1.0,
                            interpret=True)
    ref = pna_multi_aggregate(msgs, recv, N, aggs, scalers, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_csr_batcher_integration(rng):
    """csr=True buckets: sorted edges + row_ptr consistent; model outputs
    unchanged by the edge permutation."""
    import jax
    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
    from infomax3d_tpu.models import PNA
    ds = SyntheticMolecules(5, seed=0)
    graphs = [ds.graph2d(i) for i in range(5)]
    plain = to_graph_batch(batch_graphs(graphs, BucketSpec(5, 160, 512)))
    csr = to_graph_batch(batch_graphs(
        graphs, BucketSpec(5, 160, 512, max_deg=10, csr=True)))
    rp = np.asarray(csr.extras["csr_row_ptr"])
    recv = np.asarray(csr.receivers)
    for n in range(csr.num_nodes):
        seg = recv[rp[n]:rp[n + 1]]
        assert (seg == n).all()
    model = PNA(hidden_dim=16, target_dim=4, aggregators=["mean", "max"],
                scalers=["identity"], readout_aggregators=["mean"],
                propagation_depth=1, readout_layers=1, readout_batchnorm=False)
    vs = model.init(jax.random.key(0), plain, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(model.apply(vs, plain, deterministic=True)),
        np.asarray(model.apply(vs, csr, deterministic=True)),
        rtol=1e-4, atol=1e-5)


def test_csr_pna_stats_forward():
    rng = np.random.default_rng(42)
    """bf16 fused-stats kernel (csr_pna_stats): final aggregates match the
    XLA segment path on bf16-rounded inputs within bf16 tolerance."""
    from infomax3d_tpu.ops.pallas.spmm import csr_pna_stats
    msgs, row_ptr, recv, K = make_csr(rng)
    N = row_ptr.shape[0] - 1
    msgb = msgs.astype(jnp.bfloat16)
    s1, mean, std, mx, mn = csr_pna_stats(msgb, row_ptr, recv, None, K, True)
    ref = pna_multi_aggregate(msgb.astype(jnp.float32), recv, N,
                              ["sum", "mean", "std", "max", "min"])
    D = msgs.shape[1]
    for k, got in enumerate([s1, mean, std, mx, mn]):
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(ref[:, k * D:(k + 1) * D]), rtol=0.02, atol=0.02)


def test_csr_pna_stats_grad():
    rng = np.random.default_rng(42)
    """Analytic bf16 backward: per-edge grads match the XLA path for
    sum/mean/std (bf16 tolerance); max/min grads match as PER-NODE SUMS
    (this kernel routes extrema cotangents to one argmax winner, the XLA
    path splits evenly among bf16 ties)."""
    from infomax3d_tpu.ops.pallas.spmm import csr_pna_stats
    msgs, row_ptr, recv, K = make_csr(rng)
    N = row_ptr.shape[0] - 1
    D = msgs.shape[1]
    msgb = msgs.astype(jnp.bfloat16)
    recv_np = np.asarray(recv)
    w = 1.0 + 0.1 * jnp.arange(D)
    for k, name in enumerate(["sum", "mean", "std", "max", "min"]):
        def loss_pallas(m):
            outs = csr_pna_stats(m, row_ptr, recv, None, K, True)
            return jnp.sum(outs[k].astype(jnp.float32) * w)

        def loss_ref(m):
            h = pna_multi_aggregate(m.astype(jnp.float32), recv, N, [name])
            return jnp.sum(h * w)

        g1 = np.asarray(jax.grad(loss_pallas)(msgb).astype(jnp.float32))
        g2 = np.asarray(jax.grad(loss_ref)(msgb.astype(jnp.float32)))
        scale = np.abs(g2).max() + 1e-9
        if name in ("max", "min"):
            gs1 = np.zeros((N + 1, D))
            gs2 = np.zeros((N + 1, D))
            np.add.at(gs1, recv_np.clip(0, N), g1)
            np.add.at(gs2, recv_np.clip(0, N), g2)
            assert np.abs(gs1 - gs2).max() / scale < 0.02, name
        else:
            assert np.abs(g1 - g2).max() / scale < 0.12, name
        # padding edges always get zero gradient
        assert (g1[recv_np >= N] == 0).all(), name


def test_csr_pna_stats_tie_routing():
    """Extremum ties: exactly one edge (the first CSR slot holding the
    extremum) receives the full cotangent — torch/DGL argmax semantics."""
    from infomax3d_tpu.ops.pallas.spmm import csr_pna_stats
    recv = jnp.asarray(np.array([0, 0, 0, 1, 1], np.int32))
    row_ptr = jnp.asarray(np.array([0, 3, 5], np.int32))
    msgs = jnp.asarray(np.array([[1.0], [0.5], [1.0], [2.0], [2.0]]),
                       jnp.bfloat16)

    def loss(m, k):
        return jnp.sum(csr_pna_stats(m, row_ptr, recv, None, 3, True)[k]
                       .astype(jnp.float32))

    gmax = np.asarray(jax.grad(loss)(msgs, 3).astype(jnp.float32)).ravel()
    gmin = np.asarray(jax.grad(loss)(msgs, 4).astype(jnp.float32)).ravel()
    np.testing.assert_array_equal(gmax, [1, 0, 0, 1, 0])
    np.testing.assert_array_equal(gmin, [0, 1, 0, 1, 0])


def test_pna_csr_aggregate_bf16_path():
    rng = np.random.default_rng(42)
    """pna_csr_aggregate dispatches bf16 messages through the fused-stats
    kernel; result matches the XLA multi-aggregate within bf16 tolerance,
    including degree scalers."""
    msgs, row_ptr, recv, K = make_csr(rng)
    N = row_ptr.shape[0] - 1
    msgb = msgs.astype(jnp.bfloat16)
    aggs = ["mean", "max", "min", "std"]
    scalers = ["identity", "amplification", "attenuation"]
    got = pna_csr_aggregate(msgb, row_ptr, recv, K, aggs, scalers, 1.1, True)
    ref = pna_multi_aggregate(msgb.astype(jnp.float32), recv, N, aggs,
                              scalers, 1.1)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(ref), rtol=0.03, atol=0.03)


def test_compacted_tile_window_matches_worst_case(rng):
    """The batcher-measured per-tile window (csr_tile_win) must be value-
    identical to the worst-case TN*max_deg window — it only changes how
    much of the edge stream each node tile DMAs."""
    import jax.numpy as jnp

    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import (BucketSpec, batch_graphs,
                                            to_graph_batch)

    ds = SyntheticMolecules(40, seed=4, n_min=6, n_max=20)
    mols = [ds.graph2d(i) for i in range(40)]
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols)
    n_tot = sum(m["node_feat"].shape[0] for m in mols)
    e_tot = sum(m["senders"].shape[0] for m in mols)
    g = to_graph_batch(batch_graphs(mols, BucketSpec(
        40, n_tot + 16, e_tot + 16, max_deg=maxdeg, csr=True,
        nmax=max(m["node_feat"].shape[0] for m in mols))))
    tw = g.extras["csr_tile_win"].shape[0]
    assert tw % 128 == 0
    rp = g.extras["csr_row_ptr"]
    msgs = jnp.asarray(
        rng.normal(size=(g.senders.shape[0], 40)).astype(np.float32),
        jnp.bfloat16)
    aggs = ["mean", "max", "min", "std"]
    a = pna_csr_aggregate(msgs, rp, g.receivers, maxdeg, aggs,
                          ["identity"], 1.0, True, tile_win=tw)
    b = pna_csr_aggregate(msgs, rp, g.receivers, maxdeg, aggs,
                          ["identity"], 1.0, True, tile_win=0)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_stats_bwd_kernel_interpret_parity(rng):
    """The Pallas edge-block backward (_csr_stats_bwd_raw) is value-
    identical to the XLA gather backward (on v5e hardware it is bit-exact;
    interpret mode validates the same math on CPU)."""
    import jax
    import jax.numpy as jnp

    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import (BucketSpec, batch_graphs,
                                            to_graph_batch)
    from infomax3d_tpu.ops.pallas import spmm

    ds = SyntheticMolecules(48, seed=6, n_min=6, n_max=18)
    mols = [ds.graph2d(i) for i in range(48)]
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols)
    n_tot = sum(m["node_feat"].shape[0] for m in mols)
    e_tot = sum(m["senders"].shape[0] for m in mols)
    g = to_graph_batch(batch_graphs(mols, BucketSpec(
        48, n_tot + 16, e_tot + 16, max_deg=maxdeg, csr=True,
        nmax=max(m["node_feat"].shape[0] for m in mols))))
    rp = g.extras["csr_row_ptr"]
    bs = g.extras["csr_bwd_span"].shape[0]
    E = g.senders.shape[0]
    N = rp.shape[0] - 1
    D = 40
    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                       jnp.bfloat16)
    # forward residuals via the mailbox reference impl
    s1, mean, std, mx, mn, enc = spmm._csr_stats_mailbox_raw(
        msgs, rp, maxdeg)
    cts = [jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
           for _ in range(5)]
    d_sum, d_mean, d_std, d_mx, d_mn = [c.astype(jnp.bfloat16) for c in cts]
    deg = (rp[1:] - rp[:-1]).astype(jnp.float32)[:, None]
    inv = 1.0 / jnp.maximum(deg, 1.0)
    std_safe = jnp.maximum(std.astype(jnp.float32), jnp.sqrt(spmm.EPS))
    B = (d_std.astype(jnp.float32) * inv / std_safe).astype(jnp.bfloat16)
    A = (d_sum.astype(jnp.float32)
         + d_mean.astype(jnp.float32) * inv).astype(jnp.bfloat16)
    got, _, _ = spmm._csr_stats_bwd_raw(
        msgs, g.receivers, rp, g.extras["csr_pos"],
        (A, B, mean, d_mx, d_mn, enc), bs, True)
    # the in-jit pos fallback (no batcher csr_pos) must agree
    got_nopos, _, _ = spmm._csr_stats_bwd_raw(
        msgs, g.receivers, rp, None, (A, B, mean, d_mx, d_mn, enc),
        bs, True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(got_nopos, np.float32))

    # reference: the same gather formula in an f32 chain with ONE final
    # bf16 cast — the kernel's arithmetic (on v5e hardware the XLA gather
    # backward matches it bit-exactly too, via excess-precision fusions;
    # CPU's strict per-op bf16 rounding would differ at the last bit)
    packed = jnp.concatenate([A, B, mean, d_mx, d_mn, enc], axis=1)
    recv = g.receivers.clip(0, N - 1)
    rows = jnp.take(packed, recv, axis=0).astype(jnp.float32)
    Ae, Be, mean_e, dmx_e, dmn_e, enc_e = [
        jax.lax.dynamic_slice_in_dim(rows, k * D, D, axis=1)
        for k in range(6)]
    amin_e = jnp.floor(enc_e / 16.0)
    amax_e = enc_e - 16.0 * amin_e
    d_msg = Ae + Be * (msgs.astype(jnp.float32) - mean_e)
    pos = (jnp.arange(E, dtype=jnp.float32)
           - jnp.take(rp, recv).astype(jnp.float32))[:, None]
    d_msg = d_msg + dmx_e * (pos == amax_e)
    d_msg = d_msg + dmn_e * (pos == amin_e)
    want = jnp.where((g.receivers < N)[:, None], d_msg,
                     0.0).astype(jnp.bfloat16)

    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_seg_sum_kernel_interpret_parity(rng):
    """csr_segment_sum_bf16 (the take_rows Pallas backward) == XLA
    segment_sum over CSR-sorted rows, incl. padding rows past row_ptr[-1]
    and the compacted tile window."""
    import jax.numpy as jnp

    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import (BucketSpec, batch_graphs,
                                            to_graph_batch)
    from infomax3d_tpu.ops.pallas.spmm import csr_segment_sum_bf16

    ds = SyntheticMolecules(24, seed=7, n_min=4, n_max=18)
    mols = [ds.graph2d(i) for i in range(24)]
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols)
    n_tot = sum(m["node_feat"].shape[0] for m in mols)
    e_tot = sum(m["senders"].shape[0] for m in mols)
    g = to_graph_batch(batch_graphs(mols, BucketSpec(
        24, n_tot + 24, e_tot + 40, max_deg=maxdeg, csr=True)))
    rp = g.extras["csr_row_ptr"]
    N = g.num_nodes
    E = g.senders.shape[0]
    ct = jnp.asarray(rng.normal(size=(E, 72)).astype(np.float32),
                     jnp.bfloat16)
    for tw in (0, g.extras["csr_tile_win"].shape[0]):
        got = csr_segment_sum_bf16(ct, rp, maxdeg, tw, interpret=True)
        ref = jax.ops.segment_sum(
            ct.astype(jnp.float32),
            np.minimum(np.asarray(g.receivers), N),  # pad rows -> dropped
            num_segments=N + 1)[:N].astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))
    # CSC side: sender-sorted permutation + csc_row_ptr
    perm = g.extras["csc_perm"]
    cp = g.extras["csc_row_ptr"]
    cw = g.extras["csc_tile_win"].shape[0]
    got = csr_segment_sum_bf16(jnp.take(ct, perm, axis=0), cp, maxdeg, cw,
                               interpret=True)
    ref = jax.ops.segment_sum(
        ct.astype(jnp.float32), np.minimum(np.asarray(g.senders), N),
        num_segments=N + 1)[:N].astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    # sender-keyed variant: identical result straight from csr order (no
    # csc permutation gather); f32 accumulation of <=K bf16 values is
    # order-independent-exact
    from infomax3d_tpu.ops.pallas.spmm import (pair_segment_sum_bf16,
                                               snd_segment_sum_bf16)
    pb = g.extras["csr_pair_base"]
    pw = g.extras["csr_pair_win"].shape[0]
    got = snd_segment_sum_bf16(ct, g.senders, pb, pw, interpret=True)[:N]
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    # paired variant: both halves from one window stream
    d_hd, d_hs = pair_segment_sum_bf16(ct, g.senders, rp, pb, pw,
                                       interpret=True)
    ref_hd = jax.ops.segment_sum(
        ct.astype(jnp.float32), np.minimum(np.asarray(g.receivers), N),
        num_segments=N + 1)[:N].astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(d_hd, np.float32),
                                  np.asarray(ref_hd, np.float32))
    np.testing.assert_array_equal(np.asarray(d_hs, np.float32),
                                  np.asarray(ref, np.float32))


def test_edge_combine_kernel_interpret_parity(rng):
    """csr_edge_combine fwd (raw kernel, interpret) == take+take+add on
    real edges; custom-VJP grads match the take-based formula."""
    import jax.numpy as jnp

    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import (BucketSpec, batch_graphs,
                                            to_graph_batch)
    from infomax3d_tpu.ops.pallas.spmm import (_csr_edge_combine_raw,
                                               csr_edge_combine)

    ds = SyntheticMolecules(32, seed=9, n_min=5, n_max=16)
    mols = [ds.graph2d(i) for i in range(32)]
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols)
    n_tot = sum(m["node_feat"].shape[0] for m in mols)
    e_tot = sum(m["senders"].shape[0] for m in mols)
    g = to_graph_batch(batch_graphs(mols, BucketSpec(
        32, n_tot + 24, e_tot + 48, max_deg=maxdeg, csr=True)))
    rp = g.extras["csr_row_ptr"]
    N, E, D = g.num_nodes, g.senders.shape[0], 56
    hd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    hs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    pe = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), jnp.bfloat16)
    cspan = g.extras["csr_cmb_span"].shape[0]

    got = _csr_edge_combine_raw(hd, hs, pe, g.receivers, g.senders,
                                cspan, True)
    want = (jnp.take(hd, g.receivers.clip(0, N - 1), axis=0).astype(jnp.float32)
            + jnp.take(hs, g.senders.clip(0, N - 1), axis=0).astype(jnp.float32)
            + pe.astype(jnp.float32)).astype(jnp.bfloat16)
    e_real = int(np.asarray(rp)[-1])
    np.testing.assert_array_equal(np.asarray(got, np.float32)[:e_real],
                                  np.asarray(want, np.float32)[:e_real])

    # custom-VJP grads (sorted seg-sum fallback on CPU) vs take formula
    w = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    emask = (np.asarray(g.receivers) < N).astype(np.float32)[:, None]
    wm = w * emask

    def fused(hd, hs, pe):
        z = csr_edge_combine(hd, hs, pe, g.receivers, g.senders, rp,
                             g.extras["csc_row_ptr"], g.extras["csc_perm"],
                             g.extras["csr_pair_base"],
                             maxdeg, g.extras["csr_tile_win"].shape[0],
                             g.extras["csc_tile_win"].shape[0], cspan,
                             False, g.extras["csr_pair_win"].shape[0])
        return (z.astype(jnp.float32) * wm).sum()

    def plain(hd, hs, pe):
        z = (jnp.take(hd, g.receivers.clip(0, N - 1), axis=0)
             + jnp.take(hs, g.senders.clip(0, N - 1), axis=0) + pe)
        return (z.astype(jnp.float32) * wm).sum()

    g1 = jax.grad(fused, argnums=(0, 1, 2))(hd, hs, pe)
    g2 = jax.grad(plain, argnums=(0, 1, 2))(hd, hs, pe)
    for a, b, nm in zip(g1, g2, "hd hs pe".split()):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.02, atol=0.02, err_msg=nm)


def test_window_clamp_no_slack_pad(rng):
    """The node-window kernels (stats backward, edge combine) clamp their
    window start to rows-TNW when N is 8-aligned instead of slack-padding
    the operand array (the +TNW pad was a full [N, 6D] HBM copy).  This
    case forces the clamp: the last edge block touches only nodes near
    N-1, so its unclamped window [bns, bns+TNW) would overrun the array."""
    import jax.numpy as jnp

    from infomax3d_tpu.ops.pallas import spmm

    N, TNW, D = 256, 128, 40
    maxdeg = 8
    # block 1 (TE=128 edges): receivers 0..63 deg 2; block 2: receivers
    # 240..255 deg 8 -> bns=240 > N-TNW=128 -> clamp active
    recv = np.concatenate([np.repeat(np.arange(64), 2),
                           np.repeat(np.arange(240, 256), 8)]).astype(np.int32)
    E = recv.shape[0]
    assert E == 2 * spmm.CSR_TILE_E
    rp = np.zeros(N + 1, np.int32)
    np.cumsum(np.bincount(recv, minlength=N), out=rp[1:])
    recv_j = jnp.asarray(recv)
    rp_j = jnp.asarray(rp)

    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                       jnp.bfloat16)
    s1, mean, std, mx, mn, enc = spmm._csr_stats_mailbox_raw(
        msgs, rp_j, maxdeg)
    cts = [jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
           for _ in range(5)]
    d_sum, d_mean, d_std, d_mx, d_mn = [c.astype(jnp.bfloat16) for c in cts]
    deg = (rp_j[1:] - rp_j[:-1]).astype(jnp.float32)[:, None]
    inv = 1.0 / jnp.maximum(deg, 1.0)
    std_safe = jnp.maximum(std.astype(jnp.float32), jnp.sqrt(spmm.EPS))
    B = (d_std.astype(jnp.float32) * inv / std_safe).astype(jnp.bfloat16)
    A = (d_sum.astype(jnp.float32)
         + d_mean.astype(jnp.float32) * inv).astype(jnp.bfloat16)
    got, _, _ = spmm._csr_stats_bwd_raw(
        msgs, recv_j, rp_j, None, (A, B, mean, d_mx, d_mn, enc), TNW, True)

    packed = jnp.concatenate([A, B, mean, d_mx, d_mn, enc], axis=1)
    rows = jnp.take(packed, recv_j, axis=0).astype(jnp.float32)
    Ae, Be, mean_e, dmx_e, dmn_e, enc_e = [
        jax.lax.dynamic_slice_in_dim(rows, k * D, D, axis=1)
        for k in range(6)]
    amin_e = jnp.floor(enc_e / 16.0)
    amax_e = enc_e - 16.0 * amin_e
    d_msg = Ae + Be * (msgs.astype(jnp.float32) - mean_e)
    pos = (jnp.arange(E, dtype=jnp.float32)
           - jnp.take(rp_j, recv_j).astype(jnp.float32))[:, None]
    d_msg = d_msg + dmx_e * (pos == amax_e)
    d_msg = d_msg + dmn_e * (pos == amin_e)
    want = d_msg.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    # edge combine: senders one below receivers (span stays inside TNW)
    send = np.maximum(recv - 1, 0).astype(np.int32)
    send_j = jnp.asarray(send)
    hd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    hs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    pe = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), jnp.bfloat16)
    got = spmm._csr_edge_combine_raw(hd, hs, pe, recv_j, send_j, TNW, True)
    want = (jnp.take(hd, recv_j, axis=0).astype(jnp.float32)
            + jnp.take(hs, send_j, axis=0).astype(jnp.float32)
            + pe.astype(jnp.float32)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_csr_pna_stats_affine_fold(rng):
    """csr_pna_stats with a folded column affine (AffinePart): forward and
    ALL gradients (x, scale, shift) match materializing m = x*a + b in bf16
    first.  Exercised through both the Pallas fwd/bwd kernels (interpret)
    and the full aggregate-parts entry."""
    from infomax3d_tpu.ops.pallas.spmm import csr_pna_stats

    msgs, row_ptr, recv, K = make_csr(rng, N=48, deg_max=6, D=40)
    N = row_ptr.shape[0] - 1
    D = msgs.shape[1]
    x = msgs.astype(jnp.bfloat16)
    a = jnp.asarray(0.5 + rng.random(D).astype(np.float32))
    b = jnp.asarray(rng.normal(size=D).astype(np.float32))
    w = [jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
         for _ in range(5)]

    def fused(x, a, b):
        outs = csr_pna_stats(x, row_ptr, recv, None, K, True, 0, 128, True,
                             (a, b))
        return sum((o.astype(jnp.float32) * wi).sum()
                   for o, wi in zip(outs, w))

    def materialized(x, a, b):
        m = (x.astype(jnp.float32) * a + b).astype(jnp.bfloat16)
        outs = csr_pna_stats(m, row_ptr, recv, None, K, True)
        return sum((o.astype(jnp.float32) * wi).sum()
                   for o, wi in zip(outs, w))

    v1 = fused(x, a, b)
    v2 = materialized(x, a, b)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(fused, argnums=(0, 1, 2))(x, a, b)
    g2 = jax.grad(materialized, argnums=(0, 1, 2))(x, a, b)
    for got, want, nm in zip(g1, g2, ["x", "scale", "shift"]):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.03, atol=0.03, err_msg=nm)
