"""Measure the PyTorch reference's pre-train throughput to anchor bench.py.

Runs the REAL mounted reference code (/root/reference: models/pna.py PNA,
models/net3d.py Net3D, commons/losses.py NTXent) on the same synthetic
molecule distribution and batch size as bench.py, and records
reference graphs/s + edges/s into `.baseline_anchor.json` (consumed by
bench.py's vs_baseline).

Caveats (recorded in the json):
* CPU only — this environment has no CUDA GPU; the reference paper protocol
  ran on one GPU.  The anchor is therefore "reference code on this host's
  CPU", the only like-for-like measurement available.
* DGL is not installed; `g.update_all`/`apply_edges` are emulated with
  vectorized torch segment ops (scatter_reduce / degree-bucketed mailboxes
  built by one argsort) — the same kind of C++-backed kernels DGL's CPU
  backend uses, so the emulation does not handicap the reference.

Usage: python tools/anchor_reference.py [--batch 500] [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import torch

# ---------------------------------------------------------------------------
# import the reference with dgl/ogb stubs (same recipe as tests/test_layer_golden.py)
# ---------------------------------------------------------------------------
import collections
import collections.abc

collections.MutableMapping = collections.abc.MutableMapping

if "dgl" not in sys.modules:
    dgl_stub = types.ModuleType("dgl")
    dgl_stub.DGLGraph = object
    fn_stub = types.ModuleType("dgl.function")
    fn_stub.sum = lambda msg, out: ("sum", msg, out)
    fn_stub.mean = lambda msg, out: ("mean", msg, out)
    dgl_stub.function = fn_stub
    dgl_stub.readout_nodes = None      # patched below, needs graph context
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

for name, path in (("models", "/root/reference/models"),
                   ("commons", "/root/reference/commons")):
    if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg
sys.path.insert(0, "/root/reference")


class FastDGLGraph:
    """Vectorized DGL emulation for throughput anchoring: mailboxes built by
    one argsort + index fill; per-degree buckets call the reference
    reduce_func on stacked tensors (DGL's own degree-bucketing strategy)."""

    def __init__(self, src, dst, n_nodes, batch_num_nodes):
        self.src = torch.as_tensor(src, dtype=torch.long)
        self.dst = torch.as_tensor(dst, dtype=torch.long)
        self.n = n_nodes
        self.ndata = {}
        self.edata = {}
        self._batch_num_nodes = torch.as_tensor(batch_num_nodes)
        # precompute receiver sort + slot positions + degree buckets
        order = torch.argsort(self.dst, stable=True)
        self.order = order
        dst_sorted = self.dst[order]
        deg = torch.zeros(n_nodes, dtype=torch.long).index_add_(
            0, self.dst, torch.ones_like(self.dst))
        self.deg = deg
        starts = torch.zeros(n_nodes + 1, dtype=torch.long)
        starts[1:] = torch.cumsum(deg, 0)
        pos = torch.arange(len(dst_sorted)) - starts[dst_sorted]
        self.K = int(deg.max())
        self.slot = dst_sorted * self.K + pos
        self.buckets = [(int(d), torch.nonzero(deg == d).squeeze(-1))
                        for d in deg.unique().tolist() if d > 0]
        # node -> graph segment ids for readout
        self.seg = torch.repeat_interleave(
            torch.arange(len(batch_num_nodes)), self._batch_num_nodes)

    def batch_num_nodes(self):
        return self._batch_num_nodes

    def number_of_nodes(self):
        return self.n

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
        self.edata.update(fn(self._EdgeBatch(self)))

    def update_all(self, message_func, reduce_func, apply_node_func=None):
        msgs = message_func(self._EdgeBatch(self))
        if isinstance(reduce_func, tuple):           # dgl.function sum/mean
            op, msg_key, out_key = reduce_func
            val = msgs[msg_key]
            agg = torch.zeros(self.n, val.shape[1], dtype=val.dtype)
            agg.index_add_(0, self.dst, val)
            if op == "mean":
                agg = agg / self.deg.clamp(min=1).unsqueeze(-1)
            self.ndata[out_key] = agg
        else:
            msg_key = list(msgs)[0]
            val = msgs[msg_key]
            D = val.shape[-1]
            mail = torch.zeros(self.n * self.K, D, dtype=val.dtype)
            mail[self.slot] = val[self.order]
            mail = mail.view(self.n, self.K, D)
            results = {}
            for d, nodes in self.buckets:
                nb = self._NodeBatch(
                    {k: v[nodes] for k, v in self.ndata.items()},
                    {msg_key: mail[nodes, :d]})
                out = reduce_func(nb)
                for k, v in out.items():
                    if k not in results:
                        results[k] = torch.zeros(self.n, v.shape[-1],
                                                 dtype=v.dtype)
                    results[k][nodes] = v
            self.ndata.update(results)
        if apply_node_func is not None:
            self.ndata.update(
                apply_node_func(self._NodeBatch(self.ndata, None)))


def _readout_nodes(g, key, op="sum"):
    feat = g.ndata[key]
    G = len(g.batch_num_nodes())
    if op in ("sum", "mean"):
        out = torch.zeros(G, feat.shape[-1], dtype=feat.dtype)
        out.index_add_(0, g.seg, feat)
        if op == "mean":
            out = out / g.batch_num_nodes().clamp(min=1).unsqueeze(-1)
        return out
    big = torch.finfo(feat.dtype).max
    fill = -big if op == "max" else big
    out = torch.full((G, feat.shape[-1]), fill, dtype=feat.dtype)
    out.scatter_reduce_(0, g.seg.unsqueeze(-1).expand_as(feat), feat,
                        "amax" if op == "max" else "amin")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".baseline_anchor.json"))
    args = ap.parse_args()

    sys.modules["dgl"].readout_nodes = _readout_nodes

    from models.pna import PNA as RefPNA
    from models.net3d import Net3D as RefNet3D
    from commons.losses import NTXent as RefNTXent

    sys.path.pop(0)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from infomax3d_tpu.data.synthetic import SyntheticMolecules

    B = args.batch
    ds = SyntheticMolecules(B, seed=0, n_min=10, n_max=26)
    mols2 = [ds.graph2d(i) for i in range(B)]
    mols3 = [ds.graph3d(i) for i in range(B)]

    def batch_graphs(mols, feat_key):
        n_per = [m["node_feat"].shape[0] for m in mols]
        off = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        src = np.concatenate([m["senders"] + o for m, o in zip(mols, off)])
        dst = np.concatenate([m["receivers"] + o for m, o in zip(mols, off)])
        g = FastDGLGraph(src, dst, int(sum(n_per)), n_per)
        if feat_key == "2d":
            g.ndata["feat"] = torch.from_numpy(
                np.concatenate([m["node_feat"] for m in mols])).long()
            g.edata["feat"] = torch.from_numpy(
                np.concatenate([m["edge_feat"] for m in mols])).long()
        else:
            g.ndata["feat"] = torch.zeros(g.n, 1)   # Net3D node_dim=0 path
            g.edata["d"] = torch.from_numpy(np.concatenate(
                [m["edge_dist"][:, None] for m in mols])).float()
        return g

    g2 = batch_graphs(mols2, "2d")
    g3 = batch_graphs(mols3, "3d")
    e2 = int(g2.dst.shape[0])
    e3 = int(g3.dst.shape[0])

    # pre-train_QM9.yml architectures (reference configs_clean)
    pna = RefPNA(hidden_dim=200, target_dim=256,
                 aggregators=["mean", "max", "min", "std"],
                 scalers=["identity", "amplification", "attenuation"],
                 readout_aggregators=["min", "max", "mean"],
                 mid_batch_norm=True, last_batch_norm=True,
                 readout_batchnorm=True, batch_norm_momentum=0.93,
                 readout_hidden_dim=200, propagation_depth=7,
                 readout_layers=2, pretrans_layers=2, posttrans_layers=1,
                 dropout=0.0, residual=True)
    net3d = RefNet3D(node_dim=0, edge_dim=1, hidden_dim=20, target_dim=256,
                     readout_aggregators=["min", "max", "mean"],
                     batch_norm=True, readout_batchnorm=True,
                     batch_norm_momentum=0.93, readout_hidden_dim=20,
                     node_wise_output_layers=0, message_net_layers=1,
                     update_net_layers=1, reduce_func="mean",
                     fourier_encodings=4, propagation_depth=1,
                     readout_layers=1, dropout=0.0)
    loss_fn = RefNTXent(tau=0.1)
    opt = torch.optim.Adam(list(pna.parameters()) + list(net3d.parameters()),
                           lr=8e-5)

    feat2, efeat2 = g2.ndata["feat"], g2.edata["feat"]
    d3 = g3.edata["d"]

    def step():
        opt.zero_grad()
        # the models mutate graph data dicts in place; reset the inputs each
        # step like a collate would
        g2.ndata = {"feat": feat2}
        g2.edata = {"feat": efeat2}
        g3.ndata = {"feat": torch.zeros(g3.n, 1)}
        g3.edata = {"d": d3.clone()}
        z1 = pna(g2)
        z2 = net3d(g3)
        loss = loss_fn(z1, z2)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters

    out = {
        "reference_graphs_per_s": B / dt,
        "reference_edges_per_s": (e2 + e3) / dt,
        "step_ms": dt * 1e3,
        "batch": B,
        "edges_per_step": e2 + e3,
        "hardware": "cpu-torch (no CUDA GPU in this environment)",
        "threads": torch.get_num_threads(),
        "note": ("real mounted reference code (models/pna.py, models/net3d.py,"
                 " commons/losses.py) with vectorized torch DGL emulation; "
                 "see tools/anchor_reference.py"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
