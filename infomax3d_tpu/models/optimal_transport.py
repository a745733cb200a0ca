"""OptimalTransportModel — GeoMol conformer generation with OT matching
(reference `models/optimal_transport_model.py:30-895`).

TPU-native re-design highlights:
* the reference evaluates `batch_molecule_loss` in a python double loop over
  (n_true_confs x n_model_confs); here every stat broadcasts over BOTH
  conformer axes at once — one fused computation of the whole
  [n_true, n_model, batch] cost tensor,
* neighborhoods / hydrogen permutations / dihedral-pair slot maps are padded
  host-side index arrays (`data/geomol_featurize.py`) — no python loops in
  the model; the dihedral-pair set is reference-exact including the
  cycle_basis ring prioritization (golden vs the mounted reference in
  `tests/test_dihedral_pairs_golden.py`),
* randomness (conformer noise, frame auxiliary vectors, random alpha) is an
  explicit 'random' rng collection,
* the exact-EMD plan (reference uses POT's ot.emd on the DETACHED cost) is
  computed host-side by the OptimalTransportTrainer between two jit passes;
  inside the model `loss_type='implicit_mle'` is fully in-jit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from infomax3d_tpu.graphs.batch import GraphBatch
from infomax3d_tpu.models.base import MLP
from infomax3d_tpu.models.attention import TransformerEncoderBlock
from infomax3d_tpu.models.geomol_mpnn import GeomolMLP
from infomax3d_tpu.models.pna_random import PNAGNNRandom
from infomax3d_tpu.models.registry import register_model
from infomax3d_tpu.ops.geomol_geometry import (
    safe_norm,
    batch_dihedrals, batch_local_stats_from_coords, build_alpha_rotation,
    rotation_matrix_v2, signed_volume, von_mises_loss,
)
from infomax3d_tpu.ops.segment import segment_mean, segment_sum

BIG = 9e9


class GINVirtualRandomBackbone(nn.Module):
    """`gnn_model: GNN_node_VirtualnodeRandom` (reference gin_random.py
    virtual-node GIN with per-forward noise columns), node-level output for
    the OT generator (configs/ot_gin.yml)."""
    hidden_dim: int = 300
    num_layers: int = 5
    dropout: float = 0.5
    random_vec_dim: int = 10
    random_vec_std: float = 1.0

    def _noise(self, shape):
        if self.has_rng("random"):
            return self.random_vec_std * jax.random.normal(
                self.make_rng("random"), shape)
        return jnp.zeros(shape)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        from infomax3d_tpu.models.random_variants import GNNNodeRandom
        rand_x = self._noise((g.num_nodes, self.random_vec_dim))
        rand_e = self._noise((g.num_edges, self.random_vec_dim))
        return GNNNodeRandom(self.num_layers, self.hidden_dim,
                             self.random_vec_dim, dropout=self.dropout,
                             virtual_node=True,
                             name="node_gnn")(g, rand_x, rand_e,
                                              deterministic=deterministic)


@register_model("OptimalTransportModel")
class OptimalTransportModel(nn.Module):
    hyperparams: Dict[str, Any]
    gnn_params: Dict[str, Any]
    gnn_model: str = "PNAGNNRandom"
    use_transformer: bool = True
    use_two_gnns: bool = True

    def setup(self):
        hp = self.hyperparams
        self.hidden_dim = hp["hidden_dim"]
        self.random_vec_dim = hp["random_vec_dim"]
        self.random_vec_std = hp["random_vec_std"]
        self.loss_type = hp["loss_type"]
        self.teacher_force = hp.get("teacher_force", False)
        self.random_alpha = hp.get("random_alpha", False)
        self.n_true_confs = hp["n_true_confs"]
        self.n_model_confs = hp["n_model_confs"]
        gp = dict(self.gnn_params)
        gp.setdefault("random_vec_dim", self.random_vec_dim)
        gp.setdefault("random_vec_std", self.random_vec_std)
        # backbone choice (reference OT config `gnn_model:` key resolved via
        # globals(); explicit here).  Unknown kwargs like readout_batchnorm
        # (swallowed by the reference's **kwargs) are filtered.
        if self.gnn_model == "PNAGNNRandom":
            gnn_cls = PNAGNNRandom
        elif self.gnn_model == "PNAGNNRandomEdgeUpdate":
            from infomax3d_tpu.models.random_variants import (
                PNAGNNRandomEdgeUpdate as gnn_cls)
        elif self.gnn_model in ("GeomolGNNOGBFeat", "GeomolGNNOGBFeatRandom",
                                "GeomolGNNOGBFeatRandomNonShared"):
            # configs/ot_geomol_gnn.yml, configs/ot_pyg_in_memory.yml — the
            # plain OGBFeat ignores the noise (reference forward swallows
            # rand_x via **kwargs, geomol_mpnn_ogb_feat.py:29); conformer
            # diversity then comes only from the dihedral noise
            from infomax3d_tpu.models.geomol_mpnn import (
                GeomolGNNOGBFeat, GeomolGNNOGBFeatRandom)
            if self.gnn_model == "GeomolGNNOGBFeat":
                gnn_cls = GeomolGNNOGBFeat
            else:
                gp.setdefault("non_shared",
                              self.gnn_model.endswith("NonShared"))
                gnn_cls = GeomolGNNOGBFeatRandom
        elif self.gnn_model == "GNN_node_VirtualnodeRandom":
            gnn_cls = GINVirtualRandomBackbone     # configs/ot_gin.yml
        else:
            raise KeyError(f"unknown OT gnn_model '{self.gnn_model}'")
        import dataclasses
        allowed = {f.name for f in dataclasses.fields(gnn_cls)}
        gp = {k: v for k, v in gp.items() if k in allowed}
        self.gnn = gnn_cls(**gp)
        if self.use_two_gnns:
            self.gnn2 = gnn_cls(**gp)
        self.use_gnn_output_mlp = gp["hidden_dim"] != self.hidden_dim
        if self.use_gnn_output_mlp:
            self.gnn_output_mlp = MLP(out_dim=self.hidden_dim, layers=1)
            self.gnn2_output_mlp = MLP(out_dim=self.hidden_dim, layers=1)
        if self.use_transformer:
            self.encoder = TransformerEncoderBlock(
                self.hidden_dim * 2, hp.get("encoder", {}).get("n_head", 2),
                self.hidden_dim * 3, dropout=0.0)
        self.coord_pred = GeomolMLP(self.hidden_dim * 2, 3,
                                    hp.get("coord_pred", {}).get("n_layers", 2))
        self.d_mlp = GeomolMLP(self.hidden_dim * 2, 1,
                               hp.get("d_mlp", {}).get("n_layers", 1))
        self.h_mol_mlp = GeomolMLP(self.hidden_dim, self.hidden_dim,
                                   hp.get("h_mol_mlp", {}).get("n_layers", 1))
        alpha_in = self.hidden_dim * 3 + (self.random_vec_dim
                                          if self.random_alpha else 0)
        self.alpha_mlp = GeomolMLP(alpha_in, 1,
                                   hp.get("alpha_mlp", {}).get("n_layers", 2))
        self.c_mlp = GeomolMLP(self.hidden_dim * 4, 1,
                               hp.get("c_mlp", {}).get("n_layers", 1))

    # ------------------------------------------------------------------ embed
    def embed(self, g: GraphBatch, deterministic):
        """Per-conformer GNN embeddings [N, C, D] + molecule reps [G, C, D]."""
        def _nodes(out):
            # the Geomol backbones return (node, edge) embeddings
            return out[0] if isinstance(out, tuple) else out

        xs, xs2 = [], []
        for _ in range(self.n_model_confs):
            x1 = _nodes(self.gnn(g, deterministic=deterministic))
            x2 = _nodes(self.gnn2(g, deterministic=deterministic)) \
                if self.use_two_gnns else x1
            xs.append(x1)
            xs2.append(x2)
        x1 = jnp.stack(xs, axis=1)                    # [N, C, D]
        x2 = jnp.stack(xs2, axis=1)
        if self.use_gnn_output_mlp:
            x1 = self.gnn_output_mlp(x1)
            x2 = self.gnn2_output_mlp(x2)
        pooled = segment_sum(x2, g.node_graph, g.num_graphs)   # [G, C, D]
        h_mol = self.h_mol_mlp(pooled)
        return x1, x2, h_mol

    # ----------------------------------------------------------- local stats
    def model_local_stats(self, g, ex, x, chiral_tag, deterministic):
        N = x.shape[0]
        C = self.n_model_confs
        nbrs = ex["nbh_nbrs"]                          # [NH, 4]
        mask = ex["nbh_mask"]                          # [NH, 4]
        center = ex["nbh_center"]                      # [NH]
        n_h = jnp.take(x, nbrs.clip(0, N - 1), axis=0) * mask[..., None, None]
        x_h = jnp.take(x, center.clip(0, N - 1), axis=0)       # [NH, C, D]
        h = jnp.concatenate([n_h, jnp.broadcast_to(
            x_h[:, None], n_h.shape[:2] + x_h.shape[1:])], axis=-1)
        h = h * mask[..., None, None]                  # [NH, 4, C, 2D]
        NH = h.shape[0]
        if self.use_transformer:
            h_ = h.transpose(0, 2, 1, 3).reshape(NH * C, 4, -1)
            key_mask = jnp.broadcast_to(mask[:, None, :] > 0,
                                        (NH, C, 4)).reshape(NH * C, 4)
            h_new = self.encoder(h_, key_mask, deterministic=deterministic)
            h_new = h_new.reshape(NH, C, 4, -1).transpose(0, 2, 1, 3)
            h_new = h_new * mask[..., None, None]
        else:
            h_new = h
        unit_normals = self.coord_pred(h_new) * mask[..., None, None]
        # chiral flips
        ctag = jnp.take(chiral_tag, center.clip(0, N - 1))      # [NH]
        sv = signed_volume(unit_normals)                        # [NH, C]
        z_flip = jnp.where(ctag[:, None] != 0, sv * ctag[:, None], 1.0)
        flip = jnp.stack([jnp.ones_like(z_flip), jnp.ones_like(z_flip),
                          z_flip], axis=-1)                     # [NH, C, 3]
        unit_normals = unit_normals * flip[:, None, :, :]
        # distances
        h_flipped = jnp.concatenate([jnp.broadcast_to(
            x_h[:, None], n_h.shape[:2] + x_h.shape[1:]), n_h], axis=-1)
        h_flipped = h_flipped * mask[..., None, None]
        d_preds = jax.nn.softplus(self.d_mlp(h) + self.d_mlp(h_flipped))
        d_preds = d_preds * mask[..., None, None]
        model_local_coords = unit_normals / (
            safe_norm(unit_normals, keepdims=True) + 1e-10) * d_preds
        stats = batch_local_stats_from_coords(model_local_coords, mask)
        return stats, model_local_coords

    def true_local_stats(self, ex, pos):
        """pos [N, T, 3]; hydrogen-permuted local coords [NH, 6, 4, T, 3]."""
        N = pos.shape[0]
        perms = ex["nbh_perms"]                        # [NH, 6, 4]
        center = ex["nbh_center"]
        mask = ex["nbh_mask"]
        coords = jnp.take(pos, perms.clip(0, N - 1), axis=0)    # [NH,6,4,T,3]
        centers = jnp.take(pos, center.clip(0, N - 1), axis=0)  # [NH, T, 3]
        coords = (coords - centers[:, None, None]) * mask[:, None, :, None, None]
        return batch_local_stats_from_coords(coords, mask), coords

    # ------------------------------------------------------------ pair stats
    def model_pair_stats(self, ex, x, h_mol, model_local_coords, deterministic):
        N = x.shape[0]
        C = self.n_model_confs
        P = ex["dp_x"].shape[0]
        D = self.hidden_dim
        x_h_rows = ex["dp_x_h"].clip(0, model_local_coords.shape[0] - 1)
        y_h_rows = ex["dp_y_h"].clip(0, model_local_coords.shape[0] - 1)
        xn = jnp.take(model_local_coords, x_h_rows, axis=0)     # [P,4,C,3]
        yn = jnp.take(model_local_coords, y_h_rows, axis=0)
        x_rep = jnp.take(x, ex["dp_x"].clip(0, N - 1), axis=0)  # [P,C,D]
        y_rep = jnp.take(x, ex["dp_y"].clip(0, N - 1), axis=0)
        xn_rep = jnp.take(x, ex["dp_x_nbrs"].clip(0, N - 1), axis=0)  # [P,4,C,D]
        yn_rep = jnp.take(x, ex["dp_y_nbrs"].clip(0, N - 1), axis=0)

        key1 = self.make_rng("random") if self.has_rng("random") else \
            jax.random.key(0)
        key2 = jax.random.fold_in(key1, 1)
        Hx = rotation_matrix_v2(xn, ex["x_map"], key1)          # [P,C,3,3]
        Hy = rotation_matrix_v2(yn, ex["y_map"], key2)
        p_H = jnp.einsum("pcij,pncj->pnci", Hx, xn)
        q_H = jnp.einsum("pcij,pncj->pnci", Hy, yn)

        def take_slots(arr, slots):                    # [P,4,...] x [P,k]
            return jnp.take_along_axis(
                arr, slots[:, :, None, None].clip(0, 3), axis=1)

        p_T_prime = take_slots(p_H, ex["x_other"])              # [P,3,C,3]
        q_Z_prime = take_slots(q_H, ex["y_other"])
        p_Y_prime = jnp.einsum("pn,pnci->pci", ex["x_map"], p_H)
        flip = jnp.asarray([-1.0, -1.0, 1.0])
        q_Z_translated = q_Z_prime * flip + p_Y_prime[:, None]

        h_mol_d = jnp.take(h_mol, ex["dp_mol"].clip(0, h_mol.shape[0] - 1),
                           axis=0)                              # [P,C,D]
        if self.random_alpha and self.has_rng("random"):
            rand = self.random_vec_std * jax.random.normal(
                jax.random.fold_in(key1, 2), (P, C, self.random_vec_dim))
            alpha = self.alpha_mlp(jnp.concatenate(
                [x_rep, y_rep, h_mol_d, rand], -1)) + self.alpha_mlp(
                jnp.concatenate([y_rep, x_rep, h_mol_d, rand], -1))
        else:
            alpha = self.alpha_mlp(jnp.concatenate(
                [x_rep, y_rep, h_mol_d], -1)) + self.alpha_mlp(
                jnp.concatenate([y_rep, x_rep, h_mol_d], -1))
        v_star = jnp.concatenate([jnp.cos(alpha), jnp.sin(alpha)], -1)  # [P,C,2]

        pT_idx = np.repeat(np.arange(3), 3)          # 9 combos
        qZ_idx = np.tile(np.arange(3), 3)
        pT = p_T_prime[:, pT_idx]                      # [P,9,C,3]
        qZ = q_Z_translated[:, qZ_idx]
        pY9 = jnp.broadcast_to(p_Y_prime[:, None], pT.shape)
        curr_sin, curr_cos = batch_dihedrals(pT, jnp.zeros_like(pY9), pY9, qZ)

        p_reps = take_slots(xn_rep, ex["x_other"])               # [P,3,C,D]
        q_reps = take_slots(yn_rep, ex["y_other"])
        cx = jnp.broadcast_to(x_rep[:, None], (P, 9, C, D))
        cy = jnp.broadcast_to(y_rep[:, None], (P, 9, C, D))
        c_ij = self.c_mlp(jnp.concatenate(
            [p_reps[:, pT_idx], cx, q_reps[:, qZ_idx], cy], -1)) + self.c_mlp(
            jnp.concatenate([q_reps[:, qZ_idx], cy, p_reps[:, pT_idx], cx], -1))
        # A matrices (2x2) summed over combos with coefficients
        dmask = ex["dihedral_mask"][:, :, None]        # [P,9,1]
        A = jnp.stack([jnp.stack([curr_cos, curr_sin], -1),
                       jnp.stack([curr_sin, -curr_cos], -1)], -2)  # [P,9,C,2,2]
        A = A * dmask[..., None, None]
        A_curr = jnp.sum(A * c_ij[..., None], axis=1)  # [P,C,2,2]
        det = A_curr[..., 0, 0] * A_curr[..., 1, 1] - \
            A_curr[..., 0, 1] * A_curr[..., 1, 0] + 1e-10
        inv = jnp.stack([
            jnp.stack([A_curr[..., 1, 1], -A_curr[..., 0, 1]], -1),
            jnp.stack([-A_curr[..., 1, 0], A_curr[..., 0, 0]], -1)], -2) / \
            det[..., None, None]
        v_gamma = jnp.einsum("pcij,pcj->pci", inv, v_star)
        v_gamma = v_gamma / (safe_norm(v_gamma, keepdims=True) + 1e-10)
        gamma_cos, gamma_sin = v_gamma[..., 0], v_gamma[..., 1]
        H_gamma = build_alpha_rotation(gamma_sin, gamma_cos)    # [P,C,3,3]
        p_T_alpha = jnp.einsum("pcij,pncj->pnci", H_gamma, p_T_prime)

        pTa = p_T_alpha[:, pT_idx]
        md_sin, md_cos = batch_dihedrals(pTa, jnp.zeros_like(pY9), pY9, qZ)
        model_dihedrals = jnp.stack([md_sin * dmask, md_cos * dmask], axis=0)
        model_three_hop = safe_norm(pTa - qZ) * dmask
        return model_dihedrals, model_three_hop

    def true_pair_stats(self, ex, pos):
        """[2, P, 9, 6, T] dihedrals and [P, 9, 6, T] three-hop distances."""
        N = pos.shape[0]
        xn_perm = ex["dp_xn_perms"]                    # [P, 6, 4] atom ids
        yn_perm = ex["dp_yn_perms"]
        x_id, y_id = ex["dp_x"], ex["dp_y"]
        xn_pos = jnp.take(pos, xn_perm.clip(0, N - 1), axis=0)   # [P,6,4,T,3]
        yn_pos = jnp.take(pos, yn_perm.clip(0, N - 1), axis=0)
        x_pos = jnp.take(pos, x_id.clip(0, N - 1), axis=0)       # [P,T,3]
        y_pos = jnp.take(pos, y_id.clip(0, N - 1), axis=0)

        def slots(arr, sl):                            # [P,6,4,T,3] x [P,3]
            return jnp.take_along_axis(
                arr, sl[:, None, :, None, None].clip(0, 3), axis=2)

        xn3 = slots(xn_pos, ex["x_other"])             # [P,6,3,T,3]
        yn3 = slots(yn_pos, ex["y_other"])
        pT_idx = np.repeat(np.arange(3), 3)
        qZ_idx = np.tile(np.arange(3), 3)
        xn9 = xn3[:, :, pT_idx].transpose(0, 2, 1, 3, 4)         # [P,9,6,T,3]
        yn9 = yn3[:, :, qZ_idx].transpose(0, 2, 1, 3, 4)
        x9 = jnp.broadcast_to(x_pos[:, None, None], xn9.shape)
        y9 = jnp.broadcast_to(y_pos[:, None, None], yn9.shape)
        td_sin, td_cos = batch_dihedrals(xn9, x9, y9, yn9)       # [P,9,6,T]
        dmask = ex["dihedral_mask"][:, :, None, None]
        true_dihedrals = jnp.stack([td_sin * dmask, td_cos * dmask], axis=0)
        true_three_hop = safe_norm(xn9 - yn9) * dmask
        return true_dihedrals, true_three_hop

    # ------------------------------------------------------------------ loss
    def molecule_loss_matrix(self, g, ex, true_stats, model_stats,
                             ignore_neighbors):
        """[T, C, G] loss tensor (the reference's python double loop fused)."""
        (t_one, t_two, t_ang), (t_dih, t_thr) = true_stats
        (m_one, m_two, m_ang), (m_dih, m_thr) = model_stats
        G = g.num_graphs
        nbh_mol = ex["nbh_mol"]
        dp_mol = ex["dp_mol"]

        def nb_mean(v):                                # [NH, T, C] -> [G,T,C]
            return segment_mean(v.reshape(v.shape[0], -1), nbh_mol,
                                G).reshape(G, *v.shape[1:])

        def dp_mean(v):
            return segment_mean(v.reshape(v.shape[0], -1), dp_mol,
                                G).reshape(G, *v.shape[1:])

        # one-hop [NH,6,4,T] vs [NH,4,C] -> [NH,6,T,C]
        se = (t_one[..., None] - m_one[:, None, :, None, :]) ** 2
        cnt = (t_one != 0).sum(axis=2)[..., None] + 1e-10        # [NH,6,T,1]
        one = (se.sum(axis=2) / cnt).min(axis=1)                 # [NH,T,C]
        # two-hop [NH,6,4,4,T] vs [NH,4,4,C]
        se2 = (t_two[..., None] - m_two[:, None, :, :, None, :]) ** 2
        cnt2 = (t_two > 1e-8).sum(axis=(2, 3))[..., None] + 1e-10
        two = (se2.sum(axis=(2, 3)) / cnt2).min(axis=1)
        # angles [NH,6,6,T] vs [NH,6,C] (second 6 = angle combos)
        vm = von_mises_loss(t_ang[..., None], m_ang[:, None, :, None, :])
        amask = (t_ang != 0)
        ang = (jnp.sum(vm * amask[..., None], axis=2) /
               (amask.sum(axis=2)[..., None] + 1e-10)).max(axis=1)
        loss = nb_mean(one) + nb_mean(two) - nb_mean(ang)        # [G,T,C]

        if not ignore_neighbors:
            dmask = ex["dihedral_mask"]                          # [P,9]
            dsum = dmask.sum(axis=-1)[:, None, None] + 1e-10
            # dihedrals: true [2,P,9,6,T], model [2,P,9,C]
            vmd = von_mises_loss(t_dih[1][..., None],
                                 m_dih[1][:, :, None, None, :],
                                 t_dih[0][..., None],
                                 m_dih[0][:, :, None, None, :])  # [P,9,6,T,C]
            dih = (jnp.sum(vmd * dmask[:, :, None, None, None], axis=1) /
                   dsum[..., None]).max(axis=1)                  # [P,T,C]
            se3 = (t_thr[..., None] - m_thr[:, :, None, None, :]) ** 2
            thr = (se3.sum(axis=1) / dsum[..., None]).min(axis=1)
            loss = loss + dp_mean(thr) - dp_mean(dih)
        return loss.transpose(1, 2, 0)                           # [T,C,G]

    def __call__(self, g: GraphBatch, deterministic: bool = True,
                 ignore_neighbors: bool = False,
                 return_cost_matrix: bool = False,
                 ot_plans: Optional[jnp.ndarray] = None):
        ex = g.extras
        pos = ex["pos"]                                # [N, T, 3]
        pos_mask = ex["pos_mask"]                      # [G, T]
        chiral = ex.get("chiral_tag",
                        jnp.zeros(g.num_nodes, jnp.float32))

        x1, x2, h_mol = self.embed(g, deterministic)
        (t_local), true_coords = self.true_local_stats(ex, pos)
        t_pair = self.true_pair_stats(ex, pos)
        (m_local), model_coords = self.model_local_stats(
            g, ex, x1, chiral, deterministic)
        m_pair = self.model_pair_stats(ex, x2, h_mol, model_coords,
                                       deterministic)
        cost = self.molecule_loss_matrix(g, ex, (t_local, t_pair),
                                         (m_local, m_pair), ignore_neighbors)
        # mask: absent true conformers and padded graphs
        valid = pos_mask.T[:, None, :] * g.graph_mask[None, None, :]
        cost_masked = jnp.where(valid > 0, cost, BIG)
        if return_cost_matrix:
            return cost_masked
        if ot_plans is not None:
            # ot_plans [G, T, C] from the host EMD on the detached cost
            per_mol = jnp.sum(ot_plans.transpose(1, 2, 0) *
                              jnp.where(valid > 0, cost, 0.0), axis=(0, 1))
            return jnp.sum(per_mol * g.graph_mask) / \
                jnp.maximum(g.graph_mask.sum(), 1)
        # implicit MLE (reference loss_type='implicit_mle')
        pmL2 = pos_mask.T                              # [T, G]
        L1 = jnp.min(cost_masked, axis=0).sum(axis=0) / self.n_model_confs
        L2_vals = jnp.min(cost_masked, axis=1)         # [T, G]
        L2 = jnp.sum(jnp.where(pmL2 > 0, L2_vals, 0.0), axis=0) / \
            jnp.maximum(pmL2.sum(axis=0), 1)
        gm = g.graph_mask
        L1m = jnp.sum(jnp.where(gm, L1, 0.0)) / jnp.maximum(gm.sum(), 1)
        L2m = jnp.sum(jnp.where(gm, L2, 0.0)) / jnp.maximum(gm.sum(), 1)
        return jnp.maximum(L1m, L2m)
