"""PNAOriginal(-Simple) and PNARandom tests."""
import jax
import numpy as np
import pytest

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import PNAOriginal, PNAOriginalSimple, PNARandom


def batch(num=5, seed=0):
    ds = SyntheticMolecules(num, seed=seed)
    graphs = [ds.graph2d(i) for i in range(num)]
    return to_graph_batch(batch_graphs(graphs, BucketSpec(num, 160, 512)))


def test_pna_original_towers_gru():
    g = batch()
    model = PNAOriginal(hidden_dim=32, last_layer_dim=32, target_dim=5,
                        readout_aggregators=["mean", "max"], towers=2,
                        propagation_depth=2, gru_enable=True, graph_norm=True,
                        residual=True, avg_d=1.2,
                        aggregators=["mean", "max", "min", "std"],
                        scalers=["identity", "amplification", "attenuation"])
    vs = model.init(jax.random.key(0), g, deterministic=True)
    out, _ = model.apply(vs, g, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (5, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_pna_original_simple():
    g = batch()
    model = PNAOriginalSimple(hidden_dim=24, last_layer_dim=24, target_dim=3,
                              readout_aggregators=["mean"], avg_d=1.0,
                              propagation_depth=2, mid_batch_norm=True,
                              aggregators=["mean", "max"],
                              scalers=["identity", "amplification"])
    vs = model.init(jax.random.key(0), g, deterministic=True)
    out, _ = model.apply(vs, g, deterministic=False, mutable=["batch_stats"])
    assert out.shape == (5, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pna_original_rejects_moments():
    g = batch()
    model = PNAOriginalSimple(hidden_dim=8, last_layer_dim=8, target_dim=1,
                              readout_aggregators=["mean"],
                              aggregators=["moment3"], scalers=["identity"],
                              propagation_depth=2)
    with pytest.raises(ValueError, match="moment"):
        model.init(jax.random.key(0), g, deterministic=True)


def test_pna_random_noise_changes_output():
    g = batch()
    model = PNARandom(hidden_dim=24, target_dim=6, random_vec_dim=8,
                      random_vec_std=1.0, aggregators=["mean", "max"],
                      scalers=["identity"], readout_aggregators=["mean"],
                      propagation_depth=2, readout_batchnorm=False)
    vs = model.init(jax.random.key(0), g, deterministic=True)
    o1 = model.apply(vs, g, deterministic=True,
                     rngs={"random": jax.random.key(1)})
    o2 = model.apply(vs, g, deterministic=True,
                     rngs={"random": jax.random.key(2)})
    o1b = model.apply(vs, g, deterministic=True,
                      rngs={"random": jax.random.key(1)})
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))


def test_geomol_wrappers():
    import jax
    from infomax3d_tpu.models import GeomolGNNWrapper, GeomolGNNWrapperOGBFeat
    from infomax3d_tpu.models.geomol_mpnn import GeomolGNNWrapperOGBFeatRandom
    g = batch()
    # plain OGBFeat wrapper has NO random vectors (reference
    # geomol_mpnn_ogb_feat.py:52-56 — noise belongs to the Random sibling)
    m1 = GeomolGNNWrapperOGBFeat(hidden_dim=32, depth=2, n_layers=2,
                                 target_dim=3)
    vs = m1.init(jax.random.key(0), g, deterministic=True)
    o1 = m1.apply(vs, g, deterministic=True,
                  rngs={"random": jax.random.key(1)})
    o2 = m1.apply(vs, g, deterministic=True,
                  rngs={"random": jax.random.key(2)})
    assert o1.shape == (5, 3)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    # the Random sibling IS noise-dependent (geomol_mpnn_ogb_feat_random.py)
    mr = GeomolGNNWrapperOGBFeatRandom(hidden_dim=32, depth=2, n_layers=2,
                                       target_dim=3)
    vsr = mr.init(jax.random.key(0), g, deterministic=True)
    r1 = mr.apply(vsr, g, deterministic=True,
                  rngs={"random": jax.random.key(1)})
    r2 = mr.apply(vsr, g, deterministic=True,
                  rngs={"random": jax.random.key(2)})
    assert np.isfinite(np.asarray(r1)).all()
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-7

    # float one-hot variant
    import jax.numpy as jnp
    g_float = g.replace(node_feat=g.node_feat.astype(jnp.float32),
                        edge_feat=g.edge_feat.astype(jnp.float32))
    m2 = GeomolGNNWrapper(hidden_dim=32, node_dim=9, edge_dim=3, depth=2,
                          target_dim=2)
    vs2 = m2.init(jax.random.key(0), g_float, deterministic=True)
    o = m2.apply(vs2, g_float, deterministic=True)
    assert o.shape == (5, 2)
