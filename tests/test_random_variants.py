"""Random-feature model variants (reference pna_original_random.py,
pna_edge_update_random.py, gin_random.py,
geomol_mpnn_ogb_feat_random_non_shared.py)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
from infomax3d_tpu.models import MODEL_REGISTRY


def _batch(num=5, seed=0):
    ds = SyntheticMolecules(num, seed=seed)
    graphs = [ds.graph2d(i) for i in range(num)]
    n = sum(g["node_feat"].shape[0] for g in graphs) + 5
    e = sum(g["senders"].shape[0] for g in graphs) + 9
    return to_graph_batch(batch_graphs(graphs, BucketSpec(num + 1, n, e)))


CASES = [
    ("PNAOriginalRandom",
     dict(hidden_dim=32, target_dim=3, last_layer_dim=32,
          readout_aggregators=["mean", "max"], propagation_depth=2)),
    ("PNAOriginalSimpleRandom",
     dict(hidden_dim=32, target_dim=3, last_layer_dim=32,
          readout_aggregators=["mean", "max"], propagation_depth=1,
          residual=True)),
    ("PNARandomEdgeUpdate",
     dict(hidden_dim=32, target_dim=3, aggregators=["mean", "max"],
          scalers=["identity"], readout_aggregators=["mean", "max"],
          propagation_depth=2)),
    ("OGBGNNRandom", dict(hidden_dim=32, target_dim=3, num_layers=2)),
    ("GeomolGNNWrapperOGBFeatRandomNonShared",
     dict(hidden_dim=32, target_dim=3, depth=2)),
]


@pytest.mark.parametrize("name,kw", CASES)
def test_forward_finite_and_padding_invariant(name, kw):
    g = _batch()
    cls = MODEL_REGISTRY[name]
    m = cls(**kw)
    vs = m.init({"params": jr.key(0), "random": jr.key(1)}, g,
                deterministic=False)
    out = m.apply(vs, g, deterministic=True, rngs={"random": jr.key(2)},
                  mutable=["batch_stats"])[0]
    assert out.shape == (g.num_graphs, 3)
    assert np.isfinite(np.asarray(out)[np.asarray(g.graph_mask)]).all()


@pytest.mark.parametrize(
    "name,kw", [c for c in CASES if c[0] != "PNAOriginalRandom"])
def test_noise_changes_output(name, kw):
    """Different 'random' keys must give different real-graph outputs.

    Note: with deep non-residual stacks the perturbation decays ~500x per
    PNASimpleLayer at init (the reference behaves identically), so the
    configs above keep depth small / residual on.
    """
    g = _batch()
    m = MODEL_REGISTRY[name](**kw)
    vs = m.init({"params": jr.key(0), "random": jr.key(1)}, g,
                deterministic=False)
    o1 = m.apply(vs, g, deterministic=True, rngs={"random": jr.key(2)},
                 mutable=["batch_stats"])[0]
    o2 = m.apply(vs, g, deterministic=True, rngs={"random": jr.key(3)},
                 mutable=["batch_stats"])[0]
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_no_rng_is_deterministic_zero_noise():
    g = _batch()
    m = MODEL_REGISTRY["OGBGNNRandom"](hidden_dim=32, target_dim=3,
                                       num_layers=2)
    vs = m.init(jr.key(0), g, deterministic=True)
    o1 = m.apply(vs, g, deterministic=True, mutable=["batch_stats"])[0]
    o2 = m.apply(vs, g, deterministic=True, mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_pna_original_random_matches_pna_original():
    """Reference PNAOriginalRandom draws no noise in forward — it must be
    numerically identical to PNAOriginal under shared parameters."""
    g = _batch()
    kw = dict(hidden_dim=32, target_dim=3, last_layer_dim=32,
              readout_aggregators=["mean", "max"], propagation_depth=2)
    m_r = MODEL_REGISTRY["PNAOriginalRandom"](**kw)
    m_o = MODEL_REGISTRY["PNAOriginal"](**kw)
    vs = m_o.init(jr.key(0), g, deterministic=True)
    o_r = m_r.apply(vs, g, deterministic=True, mutable=["batch_stats"])[0]
    o_o = m_o.apply(vs, g, deterministic=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(o_o))


def test_edge_update_layer_updates_edge_state():
    """PNALayerEdgeUpdate must return a *changed* edge state (the whole point
    of the variant, pna_edge_update_random.py:206)."""
    from infomax3d_tpu.models.random_variants import PNALayerEdgeUpdate
    g = _batch()
    h = jnp.ones((g.num_nodes, 16))
    e = jnp.ones((g.num_edges, 16))
    layer = PNALayerEdgeUpdate(in_dim=16, out_dim=16,
                               aggregators=["mean"], scalers=["identity"])
    vs = layer.init(jr.key(0), g, h, e, deterministic=True)
    (h2, e2), _ = layer.apply(vs, g, h, e, deterministic=True,
                              mutable=["batch_stats"])
    assert float(jnp.abs(e2 - e).max()) > 1e-3
    # node update passes through two small-gain (1/in_dim xavier) MLPs, so it
    # is tiny at init — just require it to be a real change
    assert float(jnp.abs(h2 - h).max()) > 1e-7
