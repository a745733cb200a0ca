"""Net3DDense == Net3D under shared parameters (dense complete-graph path,
reference models/net3d.py:14-125 semantics)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.graphs.dense import dense_batch, to_dense_batch
from infomax3d_tpu.models.net3d import Net3D, Net3DDense

KW = dict(hidden_dim=16, target_dim=5, readout_aggregators=["min", "max", "mean"],
          batch_norm=True, readout_batchnorm=True, batch_norm_momentum=0.93,
          node_wise_output_layers=0, fourier_encodings=4, propagation_depth=2,
          readout_layers=1, readout_hidden_dim=16)


def _batches(num=6, seed=0):
    ds = SyntheticMolecules(num, seed=seed)
    mols = [ds.graph3d(i) for i in range(num)]
    n = sum(m["node_feat"].shape[0] for m in mols) + 7
    e = sum(m["senders"].shape[0] for m in mols) + 11
    flat = to_graph_batch(batch_graphs(mols, BucketSpec(num + 1, n, e)))
    nmax = max(m["node_feat"].shape[0] for m in mols) + 2
    dense = to_dense_batch(dense_batch(mols, num + 1, nmax, with_edges=False))
    return flat, dense


def test_dense_matches_flat_forward_and_stats():
    flat, dense = _batches()
    m_flat = Net3D(**KW)
    m_dense = Net3DDense(**KW)
    vs = m_flat.init(jr.key(0), flat, deterministic=True)
    out_f, mut_f = m_flat.apply(vs, flat, deterministic=False,
                                mutable=["batch_stats"])
    out_d, mut_d = m_dense.apply(vs, dense, deterministic=False,
                                 mutable=["batch_stats"])
    gm = np.asarray(flat.graph_mask)
    np.testing.assert_allclose(np.asarray(out_f)[gm], np.asarray(out_d)[gm],
                               rtol=2e-4, atol=2e-4)
    # running statistics must agree too (same masked elements)
    for (k1, v1), (k2, v2) in zip(
            jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(mut_d["batch_stats"])):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=2e-4, atol=2e-4)


def test_dense_matches_flat_gradients():
    flat, dense = _batches()
    m_flat = Net3D(**KW)
    m_dense = Net3DDense(**KW)
    vs = m_flat.init(jr.key(0), flat, deterministic=True)

    def loss(params, model, g, gm):
        out = model.apply({"params": params,
                           "batch_stats": vs["batch_stats"]}, g,
                          deterministic=False, mutable=["batch_stats"])[0]
        return jnp.sum(jnp.where(gm[:, None], out, 0.0) ** 2)

    gm = flat.graph_mask
    g_f = jax.grad(loss)(vs["params"], m_flat, flat, gm)
    g_d = jax.grad(loss)(vs["params"], m_dense, dense,
                         dense.extras["graph_mask"])
    for (k1, v1), (k2, v2) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_d)):
        scale = max(float(jnp.abs(v1).max()), 1.0)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=5e-4 * scale,
                                   err_msg=jax.tree_util.keystr(k1))


def test_dense_registry_entry():
    from infomax3d_tpu.models import MODEL_REGISTRY
    assert MODEL_REGISTRY["Net3DDense"] is Net3DDense
