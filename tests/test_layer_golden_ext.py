"""Extended per-layer golden parity vs the mounted PyTorch reference
(VERDICT round-1 item 4): GINConv / GCNConv (models/gin.py:85-143), EGCLayer
(models/egnn.py:88-140), SAN MultiHeadAttentionLayer (models/san.py:78-177),
PNAOriginal tower layer (models/pna_original.py:200-322), SMP init/update_e
blocks (models/spherical_message_passing.py:63-188), plus a model-level
CSR-bucket (Pallas kernel path) PNALayer parity run with explicit bf16
max/min tolerance.

Reference layers run their REAL torch code; dgl / ogb / torch_geometric /
torch_scatter / torch_sparse are stubbed (the stubs re-implement only the
trivial library primitives the layers call — embedding-sum encoders,
scatter-add, swish — not the layers themselves)."""
import contextlib
import sys
import types

import numpy as np
import pytest
import torch

# test_layer_golden installs the dgl/ogb stubs and the reference import path
from test_layer_golden import FakeDGLGraph, copy_mlp, random_graph

# ---- additional stubs needed by gin.py / spherical_message_passing.py -----

_fn = sys.modules["dgl.function"]
_fn.copy_u = lambda u, out: ("copy_u", u, out)
_fn.copy_e = lambda e, out: ("copy_e", e, out)
_fn.u_mul_v = lambda u, v, out: ("u_mul_v", u, v, out)
_fn.src_mul_edge = lambda u, e, out: ("src_mul_edge", u, e, out)
_fn.copy_edge = lambda e, out: ("copy_edge", e, out)

if "dgl.nn" not in sys.modules:
    dgl_nn = types.ModuleType("dgl.nn")
    dgl_nn_pt = types.ModuleType("dgl.nn.pytorch")

    def _pool_init(self, *args, **kwargs):
        torch.nn.Module.__init__(self)
        # register submodule args (GlobalAttentionPooling's gate_nn) so the
        # owner's state_dict carries their parameters like real dgl
        for i, a in enumerate(args):
            if isinstance(a, torch.nn.Module):
                setattr(self, "gate_nn" if i == 0 else f"arg_{i}", a)
        for k, v in kwargs.items():
            if isinstance(v, torch.nn.Module):
                setattr(self, k, v)

    for cls in ("SumPooling", "AvgPooling", "MaxPooling",
                "GlobalAttentionPooling", "Set2Set"):
        setattr(dgl_nn_pt, cls,
                type(cls, (torch.nn.Module,), {"__init__": _pool_init}))
    dgl_nn.pytorch = dgl_nn_pt
    sys.modules["dgl.nn"] = dgl_nn
    sys.modules["dgl.nn.pytorch"] = dgl_nn_pt
    sys.modules["dgl"].nn = dgl_nn


def _torch_scatter_add(src, index, dim=0, dim_size=None):
    assert dim == 0
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


if "ogb.graphproppred" not in sys.modules:
    gpp = types.ModuleType("ogb.graphproppred")
    enc_mod = types.ModuleType("ogb.graphproppred.mol_encoder")

    class _OgbEncoder(torch.nn.Module):
        """Faithful stand-in for ogb's Atom/BondEncoder: one embedding table
        per categorical column, summed (identical to the reference's own
        commons/mol_encoder.py minus padding)."""

        def __init__(self, dims, emb_dim):
            super().__init__()
            self.embedding_list = torch.nn.ModuleList(
                [torch.nn.Embedding(d, emb_dim) for d in dims])
            for e in self.embedding_list:
                torch.nn.init.xavier_uniform_(e.weight.data)

        def forward(self, x):
            return sum(self.embedding_list[i](x[:, i])
                       for i in range(x.shape[1]))

    enc_mod.AtomEncoder = lambda emb_dim: _OgbEncoder(
        [119, 5, 12, 12, 10, 6, 6, 2, 2], emb_dim)
    enc_mod.BondEncoder = lambda emb_dim: _OgbEncoder([5, 6, 2], emb_dim)
    gpp.mol_encoder = enc_mod
    sys.modules["ogb.graphproppred"] = gpp
    sys.modules["ogb.graphproppred.mol_encoder"] = enc_mod

if "torch_scatter" not in sys.modules:
    ts = types.ModuleType("torch_scatter")
    ts.scatter = _torch_scatter_add
    sys.modules["torch_scatter"] = ts
if "torch_sparse" not in sys.modules:
    tsp = types.ModuleType("torch_sparse")
    tsp.SparseTensor = type("SparseTensor", (), {})
    sys.modules["torch_sparse"] = tsp
if "torch_geometric" not in sys.modules:
    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_acts = types.ModuleType("torch_geometric.nn.acts")
    tg_inits = types.ModuleType("torch_geometric.nn.inits")
    tg_acts.swish = lambda x: x * torch.sigmoid(x)

    def _glorot_orthogonal(tensor, scale):
        torch.nn.init.orthogonal_(tensor.data)
        sc = scale / ((tensor.size(-2) + tensor.size(-1)) * tensor.var())
        tensor.data *= sc.sqrt()

    tg_inits.glorot_orthogonal = _glorot_orthogonal
    tg_nn.radius_graph = None
    tg_nn.acts = tg_acts
    tg_nn.inits = tg_inits
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.acts"] = tg_acts
    sys.modules["torch_geometric.nn.inits"] = tg_inits

sys.path.insert(0, "/root/reference")
from models.gin import GINConv as RefGINConv, GCNConv as RefGCNConv  # noqa: E402
from models.egnn import EGCLayer as RefEGCLayer  # noqa: E402
from models.san import MultiHeadAttentionLayer as RefSANAttention  # noqa: E402
from models.pna import PNALayer as RefPNALayer  # noqa: E402
from models.pna_original import PNALayer as RefPNAOriginalLayer  # noqa: E402
from models.spherical_message_passing import (  # noqa: E402
    init as RefSMPInit, update_e as RefSMPUpdateE)

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infomax3d_tpu.graphs.batch import (  # noqa: E402
    BucketSpec, batch_graphs, to_graph_batch)
from infomax3d_tpu.graphs.dense import DenseGraphBatch  # noqa: E402
from infomax3d_tpu.models.egnn import EGCLayer  # noqa: E402
from infomax3d_tpu.models.gin import GCNConv, GINConv  # noqa: E402
from infomax3d_tpu.models.pna import PNALayer  # noqa: E402
from infomax3d_tpu.models.pna_original import PNAOriginalLayer  # noqa: E402
from infomax3d_tpu.models.san import SANAttention  # noqa: E402
from infomax3d_tpu.models.smp import SMPInit, SMPUpdateE  # noqa: E402


# ---------------------------------------------------------------------------
# emulator extension: edge subsets, send_and_recv, local_scope, tuple funcs
# ---------------------------------------------------------------------------

class DGLSim(FakeDGLGraph):
    def local_scope(self):
        @contextlib.contextmanager
        def scope():
            nd, ed = dict(self.ndata), dict(self.edata)
            try:
                yield self
            finally:
                self.ndata, self.edata = nd, ed
        return scope()

    def out_degrees(self):
        return torch.zeros(self.n).index_add_(
            0, self.src, torch.ones(len(self.src)))

    def edges(self, form=None):
        if form == "eid":
            return torch.arange(len(self.src))
        return self.src, self.dst

    class _SubEdgeBatch:
        def __init__(self, g, eids):
            self.src = {k: v[g.src[eids]] for k, v in g.ndata.items()}
            self.dst = {k: v[g.dst[eids]] for k, v in g.ndata.items()}
            self.data = {k: v[eids] for k, v in g.edata.items()}

    def _edge_msgs(self, fn, eids):
        eb = self._SubEdgeBatch(self, eids)
        if callable(fn):
            return fn(eb)
        if fn[0] == "copy_u":
            return {fn[2]: eb.src[fn[1]]}
        if fn[0] == "copy_e" or fn[0] == "copy_edge":
            return {fn[2]: eb.data[fn[1]]}
        if fn[0] == "u_mul_v":
            return {fn[3]: eb.src[fn[1]] * eb.dst[fn[2]]}
        if fn[0] == "src_mul_edge":
            return {fn[3]: eb.src[fn[1]] * eb.data[fn[2]]}
        raise NotImplementedError(fn)

    def apply_edges(self, fn, edges=None):
        E = len(self.src)
        eids = torch.arange(E) if edges is None else torch.as_tensor(edges)
        out = self._edge_msgs(fn, eids)
        for k, v in out.items():
            if k not in self.edata or self.edata[k].shape != (E,) + v.shape[1:]:
                self.edata[k] = torch.zeros((E,) + v.shape[1:], dtype=v.dtype)
            self.edata[k][eids] = v

    def send_and_recv(self, eids, message_func, reduce_func):
        if isinstance(eids, tuple):          # g.edges() (src, dst) pair
            eids = torch.arange(len(self.src))
        elif not torch.is_tensor(eids):
            eids = torch.as_tensor(eids)
        msgs = self._edge_msgs(message_func, eids)
        op, key, out_key = reduce_func
        val = msgs[key]
        agg = torch.zeros((self.n,) + val.shape[1:], dtype=val.dtype)
        agg.index_add_(0, self.dst[eids], val)
        if op == "mean":
            deg = torch.zeros(self.n).index_add_(
                0, self.dst[eids], torch.ones(len(eids)))
            agg = agg / deg.clamp(min=1).view(-1, *([1] * (val.ndim - 1)))
        self.ndata[out_key] = agg

    def update_all(self, message_func, reduce_func, apply_node_func=None):
        if isinstance(message_func, tuple):
            eids = torch.arange(len(self.src))
            msgs = self._edge_msgs(message_func, eids)
            op, key, out_key = reduce_func
            val = msgs[key]
            agg = torch.zeros((self.n,) + val.shape[1:], dtype=val.dtype)
            agg.index_add_(0, self.dst, val)
            if op == "mean":
                deg = torch.zeros(self.n).index_add_(
                    0, self.dst, torch.ones(len(self.dst)))
                agg = agg / deg.clamp(min=1).view(-1, *([1] * (val.ndim - 1)))
            self.ndata[out_key] = agg
            if apply_node_func is not None:
                out = apply_node_func(self._NodeBatch(self.ndata, None))
                self.ndata.update(out)
            return
        super().update_all(message_func, reduce_func, apply_node_func)


# ---------------------------------------------------------------------------
# weight-copy helpers
# ---------------------------------------------------------------------------

def lin(t):
    p = {"kernel": jnp.asarray(t.weight.detach().numpy().T)}
    if t.bias is not None:
        p["bias"] = jnp.asarray(t.bias.detach().numpy())
    return p


def enc(ogb_encoder):
    mods = (ogb_encoder.embedding_list
            if hasattr(ogb_encoder, "embedding_list")
            else getattr(ogb_encoder, "atom_embedding_list", None)
            or ogb_encoder.bond_embedding_list)
    return {"encoder": {f"emb_{i}": jnp.asarray(e.weight.detach().numpy())
                        for i, e in enumerate(mods)}}


def _batch(src, dst, n, coords=None, edge_feat=None, csr=False, max_deg=0):
    g = dict(node_feat=np.zeros((n, 1), np.int32),
             senders=src, receivers=dst)
    if coords is not None:
        g["coords"] = coords
    if edge_feat is not None:
        g["edge_feat"] = edge_feat
    spec = BucketSpec(1, n + 2, len(src) + 4, max_deg=max_deg, csr=csr)
    return to_graph_batch(batch_graphs([g], spec))


def pad_n(x, extra=2):
    return jnp.asarray(np.pad(x, ((0, extra), (0, 0))))


def pad_e(x, extra=4):
    return jnp.asarray(np.pad(x, ((0, extra), (0, 0))))


# ---------------------------------------------------------------------------
# GIN / GCN convolutions
# ---------------------------------------------------------------------------

def test_ginconv_parity():
    rng = np.random.default_rng(3)
    n, d = 12, 8
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    ea = np.stack([rng.integers(0, 5, len(src)),
                   rng.integers(0, 6, len(src)),
                   rng.integers(0, 2, len(src))], axis=1).astype(np.int32)

    torch.manual_seed(0)
    ref = RefGINConv(hidden_dim=d)
    ref.eps.data = torch.tensor([0.37])
    ref.eval()
    g = DGLSim(src, dst, n)
    out_ref = ref(g, torch.from_numpy(h.copy()),
                  torch.from_numpy(ea.astype(np.int64))).detach().numpy()

    mine = GINConv(hidden_dim=d)
    gb = _batch(src, dst, n, edge_feat=ea)
    params = {
        "bond_encoder": enc(ref.bond_encoder),
        "eps": jnp.asarray([0.37]),
        "Dense_0": lin(ref.mlp[0]),
        "MaskedBatchNorm_0": {
            "scale": jnp.asarray(ref.mlp[1].weight.detach().numpy()),
            "bias": jnp.asarray(ref.mlp[1].bias.detach().numpy())},
        "Dense_1": lin(ref.mlp[3]),
    }
    stats = {"MaskedBatchNorm_0": {
        "mean": jnp.asarray(ref.mlp[1].running_mean.numpy()),
        "var": jnp.asarray(ref.mlp[1].running_var.numpy())}}
    out = mine.apply({"params": params, "batch_stats": stats}, gb,
                     pad_n(h), gb.edge_feat, deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=5e-4,
                               atol=5e-4)


def test_gcnconv_parity():
    rng = np.random.default_rng(4)
    n, d = 12, 8
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    ea = np.stack([rng.integers(0, 5, len(src)),
                   rng.integers(0, 6, len(src)),
                   rng.integers(0, 2, len(src))], axis=1).astype(np.int32)

    torch.manual_seed(1)
    ref = RefGCNConv(hidden_dim=d)
    ref.eval()
    g = DGLSim(src, dst, n)
    out_ref = ref(g, torch.from_numpy(h.copy()),
                  torch.from_numpy(ea.astype(np.int64))).detach().numpy()

    mine = GCNConv(hidden_dim=d)
    gb = _batch(src, dst, n, edge_feat=ea)
    params = {
        "linear": lin(ref.linear),
        "root_emb": jnp.asarray(ref.root_emb.weight.detach().numpy()[0]),
        "bond_encoder": enc(ref.bond_encoder),
    }
    out = mine.apply({"params": params}, gb, pad_n(h), gb.edge_feat,
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=5e-4,
                               atol=5e-4)


# ---------------------------------------------------------------------------
# EGNN EGC layer
# ---------------------------------------------------------------------------

def test_egclayer_parity():
    rng = np.random.default_rng(5)
    n, d = 12, 8
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    x = rng.normal(size=(n, 3)).astype(np.float32)

    torch.manual_seed(2)
    ref = RefEGCLayer(node_dim=d, reduce_func="sum", edge_dim=1, hidden_dim=d,
                      batch_norm=False, batch_norm_momentum=0.1, dropout=0.0,
                      mid_activation="SiLU")
    ref.eval()
    g = DGLSim(src, dst, n)
    g.ndata["feat"] = torch.from_numpy(h.copy())
    g.ndata["x"] = torch.from_numpy(x.copy())
    ref(g)
    out_ref = g.ndata["feat"].detach().numpy()

    mine = EGCLayer(hidden_dim=d, batch_norm=False, mid_activation="SiLU",
                    reduce_func="sum")
    gb = _batch(src, dst, n, coords=x)
    params = {"message_network": {}, "update_network": {},
              "soft_edge_network": lin(ref.soft_edge_network)}
    stats = {"message_network": {}, "update_network": {}}
    copy_mlp(ref.message_network, params["message_network"],
             stats["message_network"])
    copy_mlp(ref.update_network, params["update_network"],
             stats["update_network"])
    out = mine.apply({"params": params}, gb, pad_n(h), deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=5e-4,
                               atol=5e-4)


# ---------------------------------------------------------------------------
# SAN two-channel attention
# ---------------------------------------------------------------------------

def test_san_attention_parity():
    rng = np.random.default_rng(6)
    n, d, H, hd = 6, 8, 2, 4
    gamma = 0.3
    h = rng.normal(size=(n, d)).astype(np.float32)
    # symmetric bond adjacency; complete directed edge list minus self loops
    A = np.zeros((n, n), bool)
    for (i, j) in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 4)]:
        A[i, j] = A[j, i] = True
    src, dst = np.nonzero(~np.eye(n, dtype=bool))
    src, dst = src.astype(np.int32), dst.astype(np.int32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)

    torch.manual_seed(3)
    ref = RefSANAttention(gamma=gamma, in_dim=d, out_dim=hd, num_heads=H,
                          full_graph=True, use_bias=False)
    ref.eval()
    g = DGLSim(src, dst, n)
    g.edata["real"] = torch.from_numpy(A[src, dst].astype(np.int64))
    out_ref = ref(g, torch.from_numpy(h.copy()),
                  torch.from_numpy(e.copy())).detach().numpy()

    # dense side: e_dense[0, dst, src] = e_edge (score[i, j] pairs j->i)
    e_dense = np.zeros((1, n, n, d), np.float32)
    e_dense[0, dst, src] = e
    gb = DenseGraphBatch(
        node_feat=jnp.zeros((1, n, 1), jnp.int32),
        node_mask=jnp.ones((1, n), bool),
        real_edge_mask=jnp.asarray(A[None]))
    mine = SANAttention(gamma=gamma, out_dim=hd, num_heads=H,
                        full_graph=True, use_bias=False)
    params = {k: lin(getattr(ref, k))
              for k in ("Q", "K", "V", "E", "Q_2", "K_2", "E_2")}
    out = mine.apply({"params": params}, gb, jnp.asarray(h[None]),
                     jnp.asarray(e_dense), jnp.asarray(e_dense))
    np.testing.assert_allclose(np.asarray(out)[0], out_ref, rtol=5e-4,
                               atol=5e-4)


# ---------------------------------------------------------------------------
# PNAOriginal tower layer
# ---------------------------------------------------------------------------

def test_pna_original_layer_parity():
    rng = np.random.default_rng(7)
    n, d = 12, 8
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)
    aggs = ["mean", "max", "min", "std"]
    scs = ["identity", "amplification", "attenuation"]
    avg_d = 1.3

    torch.manual_seed(4)
    ref = RefPNAOriginalLayer(
        in_dim=d, out_dim=d, aggregators=aggs, scalers=scs, avg_d=avg_d,
        dropout=0.0, graph_norm=False, mid_batch_norm=False,
        last_batch_norm=False, use_3d=False, towers=2, pretrans_layers=1,
        posttrans_layers=1, divide_input=True, residual=True,
        edge_features=True, edge_hidden_dim=d)
    ref.eval()
    g = DGLSim(src, dst, n)
    out_ref = ref(g, torch.from_numpy(h.copy()), torch.from_numpy(e.copy()),
                  None).detach().numpy()

    mine = PNAOriginalLayer(in_dim=d, out_dim=d, aggregators=aggs,
                            scalers=scs, avg_d=avg_d, towers=2,
                            divide_input=True, residual=True,
                            edge_features=True, edge_hidden_dim=d)
    gb = _batch(src, dst, n)
    params = {"mixing_network": lin(ref.mixing_network)}
    for t in range(2):
        tp = {"pretrans": {}, "posttrans": {}}
        ts = {"pretrans": {}, "posttrans": {}}
        copy_mlp(ref.towers[t].pretrans, tp["pretrans"], ts["pretrans"])
        copy_mlp(ref.towers[t].posttrans, tp["posttrans"], ts["posttrans"])
        params[f"tower_{t}"] = tp
    out = mine.apply({"params": params}, gb, pad_n(h), pad_e(e),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=5e-4,
                               atol=5e-4)


# ---------------------------------------------------------------------------
# SMP init / update_e blocks
# ---------------------------------------------------------------------------

def test_smp_init_parity():
    rng = np.random.default_rng(8)
    n, hidden, num_radial = 10, 8, 6
    src, dst = random_graph(rng, n)
    codes = np.stack([rng.integers(0, dim, n) for dim in
                      [119, 5, 12, 12, 10, 6, 6, 2, 2]], axis=1)
    rbf = rng.normal(size=(len(src), num_radial)).astype(np.float32)

    torch.manual_seed(5)
    ref = RefSMPInit(num_radial=num_radial, hidden_channels=hidden,
                     use_node_features=True)
    ref.eval()
    e1_ref, e2_ref = ref(torch.from_numpy(codes.astype(np.int64)),
                         (torch.from_numpy(rbf.copy()), None, None),
                         torch.from_numpy(dst.astype(np.int64)),
                         torch.from_numpy(src.astype(np.int64)))

    mine = SMPInit(num_radial=num_radial, hidden=hidden,
                   use_node_features=True)
    gb = _batch(src, dst, n)
    gb = gb.replace(node_feat=jnp.asarray(
        np.pad(codes.astype(np.int32), ((0, 2), (0, 0)))))
    params = {
        "emb": enc(ref.emb),
        "lin_rbf_0": lin(ref.lin_rbf_0),
        "lin": lin(ref.lin),
        "lin_rbf_1": lin(ref.lin_rbf_1),
    }
    e1, e2 = mine.apply({"params": params}, gb, pad_e(rbf))
    np.testing.assert_allclose(np.asarray(e1)[:len(src)],
                               e1_ref.detach().numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(e2)[:len(src)],
                               e2_ref.detach().numpy(), rtol=5e-4, atol=5e-4)


def test_smp_update_e_parity():
    rng = np.random.default_rng(9)
    E, T = 20, 30
    hidden, int_emb, basis_emb, n_sph, n_rad = 8, 4, 3, 3, 6
    x1 = rng.normal(size=(E, hidden)).astype(np.float32)
    rbf0 = rng.normal(size=(E, n_rad)).astype(np.float32)
    sbf = rng.normal(size=(T, n_sph * n_rad)).astype(np.float32)
    t_feat = rng.normal(size=(T, n_sph * n_sph * n_rad)).astype(np.float32)
    idx_kj = rng.integers(0, E, T).astype(np.int32)
    idx_ji = rng.integers(0, E, T).astype(np.int32)

    torch.manual_seed(6)
    ref = RefSMPUpdateE(hidden_channels=hidden, int_emb_size=int_emb,
                        basis_emb_size=basis_emb, num_spherical=n_sph,
                        num_radial=n_rad, num_before_skip=1,
                        num_after_skip=2)
    ref.eval()
    e1_ref, e2_ref = ref(
        (torch.from_numpy(x1.copy()), None),
        (torch.from_numpy(rbf0.copy()), torch.from_numpy(sbf.copy()),
         torch.from_numpy(t_feat.copy())),
        torch.from_numpy(idx_kj.astype(np.int64)),
        torch.from_numpy(idx_ji.astype(np.int64)))

    mine = SMPUpdateE(hidden=hidden, int_emb_size=int_emb,
                      basis_emb_size=basis_emb, num_spherical=n_sph,
                      num_radial=n_rad, num_before_skip=1, num_after_skip=2)

    def res(r):
        return {"lin1": lin(r.lin1), "lin2": lin(r.lin2)}

    params = {name: lin(getattr(ref, name)) for name in
              ("lin_rbf1", "lin_rbf2", "lin_sbf1", "lin_sbf2", "lin_t1",
               "lin_t2", "lin_rbf", "lin_kj", "lin_ji", "lin_down",
               "lin_up", "lin")}
    params["res_before_0"] = res(ref.layers_before_skip[0])
    params["res_after_0"] = res(ref.layers_after_skip[0])
    params["res_after_1"] = res(ref.layers_after_skip[1])
    e1, e2 = mine.apply({"params": params}, jnp.asarray(x1),
                        jnp.asarray(rbf0), jnp.asarray(sbf),
                        jnp.asarray(t_feat), jnp.asarray(idx_kj),
                        jnp.asarray(idx_ji), E)
    np.testing.assert_allclose(np.asarray(e1), e1_ref.detach().numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(e2), e2_ref.detach().numpy(),
                               rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# model-level CSR-bucket (Pallas kernel path) parity
# ---------------------------------------------------------------------------

def test_pna_layer_csr_kernel_parity():
    """Our PNALayer on a CSR bucket routes aggregation through the Pallas
    fused kernel (ops/pallas/spmm.py, interpret mode on CPU).  vs the torch
    reference: sum/std stay f32-exact in the kernel, but max/min go through
    the MXU's DEFAULT-precision one-hot selection, i.e. the selected extrema
    are bf16-ROUNDED (relative error up to 2^-8 ~= 0.4%), which then passes
    through the posttrans MLP — hence the 2e-2 tolerance vs the golden
    reference (the XLA-path test above holds 5e-4)."""
    rng = np.random.default_rng(10)
    n, d = 14, 10
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)

    torch.manual_seed(7)
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
    max_deg = int(np.bincount(dst).max())
    gb = _batch(src, dst, n, edge_feat=None, csr=True, max_deg=max_deg)
    assert gb.extras.get("csr_row_ptr") is not None
    # the CSR batcher re-sorts edges by receiver; permute e the same way
    E_pad = len(src) + 4
    recv_pad = np.full(E_pad, n + 2, np.int32)
    recv_pad[:len(src)] = dst
    order = np.argsort(recv_pad, kind="stable")
    e_sorted = np.pad(e, ((0, 4), (0, 0)))[order]

    params = {"pretrans": {}, "posttrans": {}}
    stats = {"pretrans": {}, "posttrans": {}}
    copy_mlp(ref.pretrans, params["pretrans"], stats["pretrans"])
    copy_mlp(ref.posttrans, params["posttrans"], stats["posttrans"])
    out = mine.apply({"params": params}, gb, pad_n(h),
                     jnp.asarray(e_sorted), deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=2e-2,
                               atol=2e-2)


def test_pna_layer_stats_kernel_bf16_parity():
    """bf16 CSR bucket -> the fused-stats kernel (csr_pna_stats) both
    forward and backward.  Forward vs the torch reference within bf16
    tolerance; gradients vs the f32 csr_multi_reduce path
    (INFOMAX3D_STATS_KERNEL=0) compared as PER-NODE sums, since the two
    paths route extremum-tie cotangents differently by design."""
    import os
    import jax
    rng = np.random.default_rng(11)
    n, d = 14, 10
    src, dst = random_graph(rng, n)
    h = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(len(src), d)).astype(np.float32)

    torch.manual_seed(7)
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
    max_deg = int(np.bincount(dst).max())
    gb = _batch(src, dst, n, edge_feat=None, csr=True, max_deg=max_deg)
    E_pad = len(src) + 4
    recv_pad = np.full(E_pad, n + 2, np.int32)
    recv_pad[:len(src)] = dst
    order = np.argsort(recv_pad, kind="stable")
    e_sorted = np.pad(e, ((0, 4), (0, 0)))[order]

    params = {"pretrans": {}, "posttrans": {}}
    stats = {"pretrans": {}, "posttrans": {}}
    copy_mlp(ref.pretrans, params["pretrans"], stats["pretrans"])
    copy_mlp(ref.posttrans, params["posttrans"], stats["posttrans"])

    hb = pad_n(h).astype(jnp.bfloat16)
    eb = jnp.asarray(e_sorted, jnp.bfloat16)

    def run(hq):
        return mine.apply({"params": params}, gb, hq, eb,
                          deterministic=True).astype(jnp.float32)

    out = run(hb)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=4e-2,
                               atol=4e-2)

    def loss(hq):
        return jnp.sum(run(hq) * (1.0 + 0.05 * jnp.arange(d)))

    g_stats = np.asarray(jax.grad(loss)(hb).astype(jnp.float32))
    os.environ["INFOMAX3D_STATS_KERNEL"] = "0"
    try:
        g_f32 = np.asarray(jax.grad(loss)(hb).astype(jnp.float32))
    finally:
        del os.environ["INFOMAX3D_STATS_KERNEL"]
    assert np.isfinite(g_stats).all()
    scale = np.abs(g_f32).max() + 1e-9
    assert np.abs(g_stats - g_f32).max() / scale < 0.15


# ---------------------------------------------------------------------------
# GeoMol OGB-feature GNN family (models/geomol_mpnn.py,
# models/geomol_mpnn_ogb_feat.py) — full wrapper golden parity
# ---------------------------------------------------------------------------

def _global_mean_pool(x, batch):
    B = int(batch.max()) + 1
    out = torch.zeros((B, x.size(1)), dtype=x.dtype)
    cnt = torch.zeros(B, dtype=x.dtype)
    out.index_add_(0, batch, x)
    cnt.index_add_(0, batch, torch.ones(x.size(0), dtype=x.dtype))
    return out / cnt[:, None]


sys.modules["torch_scatter"].scatter_sum = \
    lambda src, index, dim=0, dim_size=None: _torch_scatter_add(
        src, index, dim=dim, dim_size=dim_size)
sys.modules["torch_geometric.nn"].global_mean_pool = _global_mean_pool
sys.modules["torch_geometric"].data = types.SimpleNamespace()


def copy_geomol_mlp(ref_mlp):
    """torch GeomolMLP (alternating Linear/activation ModuleList,
    geomol_mpnn.py:12-45) -> flax GeomolMLP Dense_{i} params."""
    linears = [m for m in ref_mlp.layers if isinstance(m, torch.nn.Linear)]
    return {f"Dense_{i}": lin(m) for i, m in enumerate(linears)}


def test_geomol_wrapper_ogbfeat_golden():
    """Reference GeomolGNNWrapperOGBFeat (real torch code,
    geomol_mpnn_ogb_feat.py:14-56: encoders -> init MLPs -> shared
    meta-layer x depth -> mean pool -> MLP head) vs ours with copied
    weights — validates the round-2 rewrite of this family (the old
    wrapper wrongly injected the Random sibling's noise)."""
    sys.path.insert(0, "/root/reference")
    from models.geomol_mpnn_ogb_feat import (  # noqa: E402
        GeomolGNNWrapperOGBFeat as RefWrapper)
    sys.path.pop(0)
    from test_layer_golden import copy_mlp
    from infomax3d_tpu.models.geomol_mpnn import GeomolGNNWrapperOGBFeat

    rng = np.random.default_rng(7)
    n, hidden, target = 11, 16, 5
    src, dst = random_graph(rng, n)
    atom_codes = np.stack(
        [rng.integers(0, d, n) for d in (119, 5, 12, 12, 10, 6, 6, 2, 2)],
        axis=1).astype(np.int32)
    bond_codes = np.stack(
        [rng.integers(0, d, len(src)) for d in (5, 6, 2)],
        axis=1).astype(np.int32)

    torch.manual_seed(0)
    ref = RefWrapper(hidden_dim=hidden, target_dim=target, depth=2,
                     n_layers=2, readout_batchnorm=False)
    ref.eval()
    data = types.SimpleNamespace(
        z=torch.from_numpy(atom_codes.astype(np.int64)),
        edge_index=torch.stack([torch.from_numpy(src.astype(np.int64)),
                                torch.from_numpy(dst.astype(np.int64))]),
        edge_attr=torch.from_numpy(bond_codes.astype(np.int64)),
        batch=torch.zeros(n, dtype=torch.int64))
    out_ref = ref(data).detach().numpy()

    mine = GeomolGNNWrapperOGBFeat(hidden_dim=hidden, target_dim=target,
                                   depth=2, n_layers=2,
                                   readout_batchnorm=False)
    g = dict(node_feat=atom_codes, senders=src, receivers=dst,
             edge_feat=bond_codes)
    gb = to_graph_batch(batch_graphs([g], BucketSpec(2, n + 3, len(src) + 4)))

    rg = ref.node_gnn
    gnn_params = {
        "node_init": copy_geomol_mlp(rg.node_init),
        "edge_init": copy_geomol_mlp(rg.edge_init),
        "edge_model": {"edge": lin(rg.update.edge_model.edge),
                       "node_in": lin(rg.update.edge_model.node_in),
                       "node_out": lin(rg.update.edge_model.node_out),
                       "mlp": copy_geomol_mlp(rg.update.edge_model.mlp)},
        "node_model": {
            "node_mlp_1": copy_geomol_mlp(rg.update.node_model.node_mlp_1),
            "node_mlp_2": copy_geomol_mlp(rg.update.node_model.node_mlp_2)},
        "edge_eps": jnp.asarray(rg.update.edge_eps.detach().numpy()),
        "node_eps": jnp.asarray(rg.update.node_eps.detach().numpy()),
    }
    out_p, out_s = {}, {}
    copy_mlp(ref.output, out_p, out_s)
    params = {"node_gnn": {"atom_encoder": enc(rg.atom_encoder),
                           "bond_encoder": enc(rg.bond_encoder),
                           "gnn": gnn_params},
              "output": out_p}
    out = mine.apply({"params": params}, gb, deterministic=True)
    # padded graph slot contributes a masked row only
    np.testing.assert_allclose(np.asarray(out)[0], out_ref[0],
                               rtol=2e-4, atol=2e-4)


class _ZeroNormal:
    """Deterministic stand-in for torch.distributions Normal: the reference
    wrappers draw their noise inline, so zeroing the draw (= the flax side
    without a 'random' rng) makes the noise-augmented wrappers exactly
    comparable while still exercising the +rvd widened init MLPs."""

    def __init__(self, loc, scale):
        pass

    def sample(self, shape):
        return torch.zeros(shape)


def _geomol_gnn_params(rg):
    p = {
        "node_init": copy_geomol_mlp(rg.node_init),
        "edge_init": copy_geomol_mlp(rg.edge_init),
    }
    if hasattr(rg, "update"):                      # shared meta-layer
        metas, sfx = [rg.update], [""]
    else:                                          # non-shared ModuleList
        metas = list(rg.layers)
        sfx = [f"_{i}" for i in range(len(metas))]
    for m, s in zip(metas, sfx):
        p[f"edge_model{s}"] = {"edge": lin(m.edge_model.edge),
                               "node_in": lin(m.edge_model.node_in),
                               "node_out": lin(m.edge_model.node_out),
                               "mlp": copy_geomol_mlp(m.edge_model.mlp)}
        p[f"node_model{s}"] = {
            "node_mlp_1": copy_geomol_mlp(m.node_model.node_mlp_1),
            "node_mlp_2": copy_geomol_mlp(m.node_model.node_mlp_2)}
        p[f"edge_eps{s}"] = jnp.asarray(m.edge_eps.detach().numpy())
        p[f"node_eps{s}"] = jnp.asarray(m.node_eps.detach().numpy())
    return p


def test_geomol_wrapper_plain_golden(monkeypatch):
    """Reference GeomolGNNWrapper (geomol_mpnn.py:138-164): raw float
    features + noise columns -> GeomolGNN(node_dim+10) -> mean pool ->
    1-dim MLP head."""
    monkeypatch.setattr(torch.distributions.normal, "Normal", _ZeroNormal)
    sys.path.insert(0, "/root/reference")
    from models.geomol_mpnn import GeomolGNNWrapper as RefPlain  # noqa: E402
    sys.path.pop(0)
    from test_layer_golden import copy_mlp
    from infomax3d_tpu.models.geomol_mpnn import GeomolGNNWrapper

    rng = np.random.default_rng(9)
    n, nd, ed, hidden = 10, 7, 4, 16
    src, dst = random_graph(rng, n)
    x = rng.normal(size=(n, nd)).astype(np.float32)
    ea = rng.normal(size=(len(src), ed)).astype(np.float32)

    torch.manual_seed(1)
    ref = RefPlain(hidden_dim=hidden, node_dim=nd, edge_dim=ed,
                   readout_batchnorm=False, depth=2, n_layers=2)
    ref.eval()
    data = types.SimpleNamespace(
        z=torch.from_numpy(x), edge_index=torch.stack(
            [torch.from_numpy(src.astype(np.int64)),
             torch.from_numpy(dst.astype(np.int64))]),
        edge_attr=torch.from_numpy(ea),
        batch=torch.zeros(n, dtype=torch.int64))
    out_ref = ref(data).detach().numpy()

    mine = GeomolGNNWrapper(hidden_dim=hidden, node_dim=nd, edge_dim=ed,
                            depth=2, n_layers=2, readout_batchnorm=False,
                            target_dim=1)
    g = dict(node_feat=x, senders=src, receivers=dst, edge_feat=ea)
    gb = to_graph_batch(batch_graphs([g], BucketSpec(2, n + 3, len(src) + 4)))
    out_p, out_s = {}, {}
    copy_mlp(ref.output, out_p, out_s)
    params = {"gnn": _geomol_gnn_params(ref.gnn), "output": out_p}
    out = mine.apply({"params": params}, gb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[0], out_ref[0],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("non_shared", [False, True])
def test_geomol_wrapper_ogbfeat_random_golden(monkeypatch, non_shared):
    """Reference GeomolGNNWrapperOGBFeatRandom (+ the NonShared sibling with
    per-depth meta-layers): encoders -> +noise columns -> widened init MLPs
    -> meta-layers -> mean pool -> head."""
    monkeypatch.setattr(torch.distributions.normal, "Normal", _ZeroNormal)
    sys.path.insert(0, "/root/reference")
    if non_shared:
        from models.geomol_mpnn_ogb_feat_random_non_shared import (  # noqa
            GeomolGNNWrapperOGBFeatRandomNonShared as RefW)
    else:
        from models.geomol_mpnn_ogb_feat_random import (  # noqa: E402
            GeomolGNNWrapperOGBFeatRandom as RefW)
    sys.path.pop(0)
    from test_layer_golden import copy_mlp
    from infomax3d_tpu.models.geomol_mpnn import GeomolGNNWrapperOGBFeatRandom
    from infomax3d_tpu.models.random_variants import (
        GeomolGNNWrapperOGBFeatRandomNonShared)

    rng = np.random.default_rng(11)
    n, hidden, target = 9, 16, 3
    src, dst = random_graph(rng, n)
    atom_codes = np.stack(
        [rng.integers(0, d, n) for d in (119, 5, 12, 12, 10, 6, 6, 2, 2)],
        axis=1).astype(np.int32)
    bond_codes = np.stack(
        [rng.integers(0, d, len(src)) for d in (5, 6, 2)],
        axis=1).astype(np.int32)

    torch.manual_seed(2)
    ref = RefW(hidden_dim=hidden, target_dim=target, readout_batchnorm=False,
               gnn_params=dict(hidden_dim=hidden, depth=2, n_layers=2))
    ref.eval()
    data = types.SimpleNamespace(
        z=torch.from_numpy(atom_codes.astype(np.int64)),
        edge_index=torch.stack([torch.from_numpy(src.astype(np.int64)),
                                torch.from_numpy(dst.astype(np.int64))]),
        edge_attr=torch.from_numpy(bond_codes.astype(np.int64)),
        batch=torch.zeros(n, dtype=torch.int64))
    out_ref = ref(data).detach().numpy()

    cls = GeomolGNNWrapperOGBFeatRandomNonShared if non_shared \
        else GeomolGNNWrapperOGBFeatRandom
    mine = cls(hidden_dim=hidden, target_dim=target, depth=2, n_layers=2,
               readout_batchnorm=False)
    g = dict(node_feat=atom_codes, senders=src, receivers=dst,
             edge_feat=bond_codes)
    gb = to_graph_batch(batch_graphs([g], BucketSpec(2, n + 3, len(src) + 4)))
    out_p, out_s = {}, {}
    copy_mlp(ref.output, out_p, out_s)
    params = {"node_gnn": {"atom_encoder": enc(ref.node_gnn.atom_encoder),
                           "bond_encoder": enc(ref.node_gnn.bond_encoder),
                           "gnn": _geomol_gnn_params(ref.node_gnn)},
              "output": out_p}
    out = mine.apply({"params": params}, gb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[0], out_ref[0],
                               rtol=2e-4, atol=2e-4)
