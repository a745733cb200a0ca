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
