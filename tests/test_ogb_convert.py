"""tools/ogb_convert.py — real-OGB ingestion (gated on the `ogb` package +
network; the converter's cache contract is validated against a faked
GraphPropPredDataset either way)."""
import os
import sys
import types

import numpy as np
import pytest


def _fake_ogb(monkeypatch, n_graphs=12, seed=0):
    """Install a minimal ogb.graphproppred.GraphPropPredDataset stand-in
    producing OGB-shaped graphs + a scaffold-style split."""
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(4, 12))
        e = 2 * (n - 1)
        src = np.repeat(np.arange(1, n), 1)
        ei = np.stack([np.concatenate([src, src - 1]),
                       np.concatenate([src - 1, src])])
        graphs.append((dict(node_feat=rng.integers(0, 5, (n, 9)),
                            edge_feat=rng.integers(0, 3, (e, 3)),
                            edge_index=ei, num_nodes=n),
                       rng.normal(size=(1,))))
    idx = np.arange(n_graphs)

    class FakeDS:
        def __init__(self, name, root):
            self.name = name

        def __iter__(self):
            return iter(graphs)

        def __len__(self):
            return n_graphs

        def get_idx_split(self):
            return {"train": idx[:8], "valid": idx[8:10], "test": idx[10:]}

    mod = types.ModuleType("ogb.graphproppred")
    mod.GraphPropPredDataset = FakeDS
    pkg = types.ModuleType("ogb")
    pkg.graphproppred = mod
    monkeypatch.setitem(sys.modules, "ogb", pkg)
    monkeypatch.setitem(sys.modules, "ogb.graphproppred", mod)
    return graphs


def test_converter_cache_contract(tmp_path, monkeypatch):
    graphs = _fake_ogb(monkeypatch)
    from tools.ogb_convert import convert

    out = convert("ogbg-molfreesolv", str(tmp_path))
    assert out.endswith(os.path.join("ogbg_molfreesolv", "processed.npz"))

    # the cache loads through the real dataset class and drives a loader
    from infomax3d_tpu.data.cached import CachedMoleculeDataset
    from infomax3d_tpu.data.splits import get_idx_split

    ds = CachedMoleculeDataset(out)
    assert len(ds) == len(graphs)
    g0 = ds.graph2d(0)
    np.testing.assert_array_equal(g0["node_feat"],
                                  graphs[0][0]["node_feat"])
    split = get_idx_split(ds, os.path.dirname(out))
    # embedded OGB indices take first precedence — exact parity
    np.testing.assert_array_equal(split["train"], np.arange(8))
    np.testing.assert_array_equal(split["test"], np.arange(10, 12))


@pytest.mark.slow
def test_real_ogb_download(tmp_path):
    """Runs only where the real ogb package + network exist."""
    ogb = pytest.importorskip("ogb")   # noqa: F841
    import urllib.request
    try:
        urllib.request.urlopen("https://snap.stanford.edu", timeout=5)
    except Exception:
        pytest.skip("no network egress")
    from tools.ogb_convert import convert

    out = convert("ogbg-molfreesolv", str(tmp_path))
    z = np.load(out)
    assert z["targets"].shape[0] == 642    # freesolv's published size
