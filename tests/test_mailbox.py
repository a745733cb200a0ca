"""Mailbox (scatter-free) aggregation: value/gradient parity vs segment ops."""
import jax
import jax.numpy as jnp
import numpy as np

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import PNA, Net3D
from infomax3d_tpu.ops.mailbox import (
    build_mailbox, mailbox_sum, pna_mailbox_aggregate,
)
from infomax3d_tpu.ops.segment import pna_multi_aggregate, segment_sum


def test_build_mailbox_roundtrip(rng):
    E, N = 300, 40
    recv = rng.integers(0, N + 1, size=E).astype(np.int32)  # incl. out-of-range
    edges, mask, slot = build_mailbox(recv, N, E, max_deg=32)
    # every in-range edge appears exactly once at its slot
    for e in range(E):
        if recv[e] < N:
            n, k = divmod(int(slot[e]), 32)
            assert n == recv[e] and edges[n, k] == e and mask[n, k]
        else:
            assert slot[e] == N * 32
    assert mask.sum() == (recv < N).sum()


def test_mailbox_matches_segment_ops(rng):
    E, N, D, K = 256, 48, 16, 16
    recv = rng.integers(0, N + 1, size=E).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    edges, mask, slot = build_mailbox(recv, N, E, max_deg=K)
    edges, mask, slot = map(jnp.asarray, (edges, mask, slot))

    s_ref = segment_sum(msgs, jnp.asarray(recv), N)
    s_mb = mailbox_sum(msgs, edges, slot, mask)
    np.testing.assert_allclose(np.asarray(s_mb), np.asarray(s_ref), rtol=1e-5,
                               atol=1e-5)

    aggs = ["mean", "max", "min", "std", "var", "moment3", "sum"]
    scalers = ["identity", "amplification", "attenuation"]
    a_ref = pna_multi_aggregate(msgs, jnp.asarray(recv), N, aggs, scalers, 1.3)
    a_mb = pna_mailbox_aggregate(msgs, edges, slot, mask, aggs, scalers, 1.3)
    np.testing.assert_allclose(np.asarray(a_mb), np.asarray(a_ref), rtol=1e-4,
                               atol=1e-4)

    # gradient parity (custom VJPs)
    def f_ref(m):
        return (pna_multi_aggregate(m, jnp.asarray(recv), N, aggs, scalers,
                                    1.3) ** 2).sum()

    def f_mb(m):
        return (pna_mailbox_aggregate(m, edges, slot, mask, aggs, scalers,
                                      1.3) ** 2).sum()

    g_ref = jax.grad(f_ref)(msgs)
    g_mb = jax.grad(f_mb)(msgs)
    np.testing.assert_allclose(np.asarray(g_mb), np.asarray(g_ref), rtol=1e-3,
                               atol=1e-3)


def _batches(max_deg):
    ds = SyntheticMolecules(6, seed=0)
    g2 = [ds.graph2d(i) for i in range(6)]
    g3 = [ds.graph3d(i) for i in range(6)]
    b2 = BucketSpec(6, 192, 768, max_deg=max_deg)
    b3 = BucketSpec(6, 192, 6144, max_deg=32 if max_deg else 0)
    return (to_graph_batch(batch_graphs(g2, b2)),
            to_graph_batch(batch_graphs(g3, b3)))

PNA_KW = dict(hidden_dim=24, target_dim=8, aggregators=["mean", "max", "min", "std"],
              scalers=["identity", "amplification", "attenuation"],
              readout_aggregators=["min", "max", "mean"], mid_batch_norm=True,
              last_batch_norm=True, readout_batchnorm=True,
              propagation_depth=2, readout_layers=1, pretrans_layers=2,
              posttrans_layers=1)


def test_models_mailbox_parity():
    """PNA/Net3D forward + gradients identical with and without mailbox."""
    g2_plain, g3_plain = _batches(max_deg=0)
    g2_mb, g3_mb = _batches(max_deg=8)
    assert g2_mb.extras.get("mb_in_edges") is not None
    model = PNA(**PNA_KW)
    vs = model.init(jax.random.key(0), g2_plain, deterministic=True)
    o_plain = model.apply(vs, g2_plain, deterministic=True)
    o_mb = model.apply(vs, g2_mb, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_plain), np.asarray(o_mb),
                               rtol=1e-4, atol=1e-5)

    def loss(p, g):
        return (model.apply({"params": p,
                             "batch_stats": vs.get("batch_stats", {})},
                            g, deterministic=True) ** 2).mean()

    gp = jax.grad(loss)(vs["params"], g2_plain)
    gm = jax.grad(loss)(vs["params"], g2_mb)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5)

    net = Net3D(hidden_dim=12, target_dim=8, readout_aggregators=["mean"],
                fourier_encodings=4, propagation_depth=1, readout_layers=1,
                readout_batchnorm=False, reduce_func="mean")
    vn = net.init(jax.random.key(1), g3_plain, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(net.apply(vn, g3_plain, deterministic=True)),
        np.asarray(net.apply(vn, g3_mb, deterministic=True)),
        rtol=1e-4, atol=1e-5)
