"""Per-layer golden parity vs the mounted PyTorch reference (BASELINE.md
north star: per-layer activations allclose).

The reference layers run with their REAL torch code (models/base_layers.py,
models/pna.py, models/net3d.py); DGL is replaced by a ~40-line emulator with
the exact apply_edges / update_all mailbox semantics (degree-bucketed dense
mailboxes, zero for 0-degree nodes).  Weights are copied torch -> flax, and
activations compared in both eval and train (BatchNorm batch-stats) modes.
"""
import sys
import types

import numpy as np
import pytest
import torch

# py>=3.10 shim for the reference's `from collections import MutableMapping`
import collections
import collections.abc

collections.MutableMapping = collections.abc.MutableMapping

# ---- stub dgl & ogb before importing reference modules --------------------
if "dgl" not in sys.modules:
    dgl_stub = types.ModuleType("dgl")
    dgl_stub.DGLGraph = object
    fn_stub = types.ModuleType("dgl.function")

    class _Field:
        def __init__(self, msg, out):
            self.msg, self.out = msg, out

    fn_stub.sum = lambda msg, out: ("sum", msg, out)
    fn_stub.mean = lambda msg, out: ("mean", msg, out)
    dgl_stub.function = fn_stub
    sys.modules["dgl"] = dgl_stub
    sys.modules["dgl.function"] = fn_stub
if "ogb" not in sys.modules:
    ogb = types.ModuleType("ogb")
    utils = types.ModuleType("ogb.utils")
    feats = types.ModuleType("ogb.utils.features")
    feats.get_atom_feature_dims = lambda: [119, 5, 12, 12, 10, 6, 6, 2, 2]
    feats.get_bond_feature_dims = lambda: [5, 6, 2]
    utils.features = feats
    ogb.utils = utils
    sys.modules["ogb"] = ogb
    sys.modules["ogb.utils"] = utils
    sys.modules["ogb.utils.features"] = feats

# import reference submodules WITHOUT executing models/__init__.py (it
# star-imports every model incl. torch_geometric-dependent ones): register
# bare packages that only carry __path__
for name, path in (("models", "/root/reference/models"),
                   ("commons", "/root/reference/commons")):
    if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg
sys.path.insert(0, "/root/reference")
from models.base_layers import MLP as RefMLP  # noqa: E402
from models.pna import PNALayer as RefPNALayer  # noqa: E402
from models.net3d import Net3DLayer as RefNet3DLayer  # noqa: E402

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch  # noqa: E402
from infomax3d_tpu.models.base import MLP  # noqa: E402
from infomax3d_tpu.models.net3d import Net3DLayer  # noqa: E402
from infomax3d_tpu.models.pna import PNALayer  # noqa: E402


class FakeDGLGraph:
    """Minimal DGL emulation: edge/node data dicts, apply_edges, update_all
    with degree-bucketed mailboxes (exact DGL semantics for these layers)."""

    def __init__(self, src, dst, n_nodes):
        self.src = torch.as_tensor(src, dtype=torch.long)
        self.dst = torch.as_tensor(dst, dtype=torch.long)
        self.n = n_nodes
        self.ndata = {}
        self.edata = {}

    class _EdgeBatch:
        def __init__(self, g):
            self.src = {k: v[g.src] for k, v in g.ndata.items()}
            self.dst = {k: v[g.dst] for k, v in g.ndata.items()}
            self.data = g.edata

    class _NodeBatch:
        def __init__(self, data, mailbox):
            self.data = data
            self.mailbox = mailbox

    def apply_edges(self, fn):
        out = fn(self._EdgeBatch(self))
        self.edata.update(out)

    def update_all(self, message_func, reduce_func, apply_node_func=None):
        msgs = message_func(self._EdgeBatch(self))
        if isinstance(reduce_func, tuple):          # dgl.function sum/mean
            op, msg_key, out_key = reduce_func
            val = msgs[msg_key]
            agg = torch.zeros(self.n, val.shape[1], dtype=val.dtype)
            agg.index_add_(0, self.dst, val)
            if op == "mean":
                deg = torch.zeros(self.n).index_add_(
                    0, self.dst, torch.ones(len(self.dst)))
                agg = agg / deg.clamp(min=1).unsqueeze(-1)
            self.ndata[out_key] = agg
        else:                                        # python reduce (PNA)
            # degree-bucketed mailboxes, exactly like DGL
            results = {}
            degs = torch.zeros(self.n, dtype=torch.long).index_add_(
                0, self.dst, torch.ones(len(self.dst), dtype=torch.long))
            for d in degs.unique().tolist():
                if d == 0:
                    continue
                nodes = torch.nonzero(degs == d).squeeze(-1)
                msg_key = list(msgs)[0]
                mail = []
                for node in nodes.tolist():
                    eids = torch.nonzero(self.dst == node).squeeze(-1)
                    mail.append(msgs[msg_key][eids])
                mailbox = {msg_key: torch.stack(mail)}
                nb = self._NodeBatch(
                    {k: v[nodes] for k, v in self.ndata.items()}, mailbox)
                out = reduce_func(nb)
                for k, v in out.items():
                    if k not in results:
                        results[k] = torch.zeros(self.n, v.shape[-1])
                    results[k][nodes] = v
            self.ndata.update(results)
        if apply_node_func is not None:
            out = apply_node_func(self._NodeBatch(self.ndata, None))
            self.ndata.update(out)


# ---------------------------------------------------------------------------
# weight copying torch -> flax
# ---------------------------------------------------------------------------

def copy_mlp(ref: RefMLP, prefix_params: dict, prefix_stats: dict):
    """Fill flax MLP param/batch_stats dicts from a reference MLP."""
    for i, fc in enumerate(ref.fully_connected):
        key = f"FCLayer_{i}"
        p = {"Dense_0": {
            "kernel": jnp.asarray(fc.linear.weight.detach().numpy().T),
            "bias": jnp.asarray(fc.linear.bias.detach().numpy())}}
        s = {}
        if fc.batch_norm is not None:
            p["MaskedBatchNorm_0"] = {
                "scale": jnp.asarray(fc.batch_norm.weight.detach().numpy()),
                "bias": jnp.asarray(fc.batch_norm.bias.detach().numpy())}
            s["MaskedBatchNorm_0"] = {
                "mean": jnp.asarray(np.array(fc.batch_norm.running_mean.numpy())),
                "var": jnp.asarray(np.array(fc.batch_norm.running_var.numpy()))}
        prefix_params[key] = p
        if s:
            prefix_stats[key] = s


@pytest.mark.parametrize("train_mode", [False, True])
def test_mlp_fclayer_parity(train_mode):
    torch.manual_seed(0)
    ref = RefMLP(in_dim=12, hidden_size=20, out_dim=8, layers=3,
                 mid_activation="relu", last_activation="none",
                 mid_batch_norm=True, last_batch_norm=True,
                 batch_norm_momentum=0.3)
    mine = MLP(out_dim=8, hidden_size=20, layers=3, mid_activation="relu",
               last_activation="none", mid_batch_norm=True,
               last_batch_norm=True, batch_norm_momentum=0.3)
    x = np.random.default_rng(0).normal(size=(16, 12)).astype(np.float32)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    params, stats = {}, {}
    copy_mlp(ref, params, stats)
    if train_mode:
        ref.train()
        out_ref = ref(torch.from_numpy(x)).detach().numpy()
        out_mine, mut = mine.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            deterministic=False, use_running_average=False,
            mutable=["batch_stats"])
        # torch running stats after one batch must match ours
        rm = ref.fully_connected[0].batch_norm.running_mean.numpy()
        jm = np.asarray(mut["batch_stats"]["FCLayer_0"]["MaskedBatchNorm_0"]["mean"])
        np.testing.assert_allclose(jm, rm, rtol=1e-4, atol=1e-5)
    else:
        ref.eval()
        out_ref = ref(torch.from_numpy(x)).detach().numpy()
        out_mine = mine.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(out_mine), out_ref, rtol=1e-4,
                               atol=1e-5)


def random_graph(rng, n=14):
    tree_src = np.arange(1, n)
    tree_dst = rng.integers(0, np.maximum(np.arange(1, n), 1))
    src = np.concatenate([tree_src, tree_dst]).astype(np.int32)
    dst = np.concatenate([tree_dst, tree_src]).astype(np.int32)
    return src, dst


def test_pna_layer_parity():
    """Reference PNALayer (real torch code, emulated DGL) vs our PNALayer
    with copied weights — the core message-passing math."""
    rng = np.random.default_rng(1)
    n, d = 14, 10
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefPNALayer(in_dim=d, out_dim=d, in_dim_edges=d,
                      aggregators=["mean", "max", "min", "std"],
                      scalers=["identity", "amplification", "attenuation"],
                      avg_d={"log": 1.0}, pretrans_layers=2,
                      posttrans_layers=1, residual=True)
    ref.eval()
    g = FakeDGLGraph(src, dst, n)
    g.ndata["feat"] = torch.from_numpy(h.copy())
    g.edata["feat"] = torch.from_numpy(e.copy())
    ref.forward(g)
    out_ref = g.ndata["feat"].detach().numpy()

    mine = PNALayer(in_dim=d, out_dim=d, in_dim_edges=d,
                    aggregators=["mean", "max", "min", "std"],
                    scalers=["identity", "amplification", "attenuation"],
                    avg_d_log=1.0, pretrans_layers=2, posttrans_layers=1,
                    residual=True)
    gb = to_graph_batch(batch_graphs(
        [dict(node_feat=np.zeros((n, 1), np.int32), senders=src,
              receivers=dst, edge_feat=np.zeros((len(src), 1), np.int32))],
        BucketSpec(1, n + 2, len(src) + 4)))
    h_pad = jnp.asarray(np.pad(h, ((0, 2), (0, 0))))
    e_pad = jnp.asarray(np.pad(e, ((0, 4), (0, 0))))
    variables = mine.init(jax.random.key(0), gb, h_pad, e_pad)
    params = {"pretrans": {}, "posttrans": {}}
    stats = {"pretrans": {}, "posttrans": {}}
    copy_mlp(ref.pretrans, params["pretrans"], stats["pretrans"])
    copy_mlp(ref.posttrans, params["posttrans"], stats["posttrans"])
    out_mine = mine.apply({"params": params}, gb, h_pad, e_pad,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out_mine)[:n], out_ref, rtol=5e-4,
                               atol=5e-4)


def test_net3d_layer_parity():
    rng = np.random.default_rng(2)
    n, d = 12, 8
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefNet3DLayer(edge_dim=d, hidden_dim=d, batch_norm=False,
                        batch_norm_momentum=0.1, dropout=0.0,
                        mid_activation="SiLU", reduce_func="sum",
                        message_net_layers=2, update_net_layers=2)
    ref.eval()
    g = FakeDGLGraph(src, dst, n)
    g.ndata["feat"] = torch.from_numpy(h.copy())
    g.edata["d"] = torch.from_numpy(e.copy())
    ref.forward(g)
    out_ref_h = g.ndata["feat"].detach().numpy()
    out_ref_e = g.edata["d"].detach().numpy()

    mine = Net3DLayer(hidden_dim=d, batch_norm=False, mid_activation="SiLU",
                      reduce_func="sum", message_net_layers=2,
                      update_net_layers=2)
    gb = to_graph_batch(batch_graphs(
        [dict(node_feat=np.zeros((n, 1), np.int32), senders=src,
              receivers=dst)], BucketSpec(1, n + 2, len(src) + 4)))
    variables = mine.init(jax.random.key(0), gb,
                          jnp.asarray(np.pad(h, ((0, 2), (0, 0)))),
                          jnp.asarray(np.pad(e, ((0, 4), (0, 0)))))
    params = {"message_network": {}, "update_network": {},
              "soft_edge_network": {
                  "kernel": jnp.asarray(
                      ref.soft_edge_network.weight.detach().numpy().T),
                  "bias": jnp.asarray(
                      ref.soft_edge_network.bias.detach().numpy())}}
    stats = {"message_network": {}, "update_network": {}}
    copy_mlp(ref.message_network, params["message_network"],
             stats["message_network"])
    copy_mlp(ref.update_network, params["update_network"],
             stats["update_network"])
    h_new, e_new = mine.apply({"params": params}, gb,
                              jnp.asarray(np.pad(h, ((0, 2), (0, 0)))),
                              jnp.asarray(np.pad(e, ((0, 4), (0, 0)))),
                              deterministic=True)
    np.testing.assert_allclose(np.asarray(h_new)[:n], out_ref_h, rtol=5e-4,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(e_new)[:len(src)], out_ref_e,
                               rtol=5e-4, atol=5e-4)
