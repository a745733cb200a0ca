"""Unit tests: scaffold split machinery (data/splits.py) and the
pure-Python chemistry kernel (data/chem.py)."""
import csv
import gzip
import os

import numpy as np
import pytest

from infomax3d_tpu.data import chem
from infomax3d_tpu.data.splits import (
    get_idx_split, murcko_scaffold_mask, read_ogb_split_dir, scaffold_key,
    scaffold_split,
)


def _both_dirs(s, r):
    return (np.concatenate([s, r]).astype(np.int64),
            np.concatenate([r, s]).astype(np.int64))


def test_murcko_mask_ring_plus_substituent():
    # benzene (0-5) with substituents 6 (on 0) and 7 (on 1)
    s, r = _both_dirs(np.array([0, 1, 2, 3, 4, 5, 0, 1]),
                      np.array([1, 2, 3, 4, 5, 0, 6, 7]))
    mask = murcko_scaffold_mask(s, r, 8)
    assert mask[:6].all() and not mask[6:].any()


def test_murcko_mask_acyclic_empty():
    s, r = _both_dirs(np.array([0, 1, 2]), np.array([1, 2, 3]))
    assert not murcko_scaffold_mask(s, r, 4).any()


def test_murcko_mask_linker_between_rings():
    # two triangles (0,1,2) and (5,6,7) joined by linker 2-3-4-5
    bonds_s = np.array([0, 1, 2, 2, 3, 4, 5, 6, 7])
    bonds_r = np.array([1, 2, 0, 3, 4, 5, 6, 7, 5])
    s, r = _both_dirs(bonds_s, bonds_r)
    mask = murcko_scaffold_mask(s, r, 8)
    assert mask.all()      # linker atoms 3,4 belong to the Murcko scaffold


def test_scaffold_key_invariant_to_atom_order():
    # same ring, relabeled
    def graph(perm):
        s0 = np.array([0, 1, 2, 3, 4, 5, 0])
        r0 = np.array([1, 2, 3, 4, 5, 0, 6])
        s, r = _both_dirs(perm[s0], perm[r0])
        nf = np.zeros((7, 9), np.int32)
        nf[:, 0] = 5
        nf[perm[6], 0] = 7    # the substituent is O — outside the scaffold
        return dict(node_feat=nf, senders=s, receivers=r,
                    edge_feat=np.zeros((14, 3), np.int32))
    k1 = scaffold_key(graph(np.arange(7)))
    k2 = scaffold_key(graph(np.array([3, 4, 5, 6, 0, 1, 2])))
    assert k1 == k2 != ""


def test_scaffold_split_partition_and_grouping():
    class DS:
        """10 cyclohexanes + 6 cyclopentanes + 4 acyclic chains."""
        def __len__(self):
            return 20

        def graph2d(self, i):
            if i < 10:
                n = 6
            elif i < 16:
                n = 5
            else:
                s, r = _both_dirs(np.arange(3), np.arange(1, 4))
                return dict(node_feat=np.full((4, 9), 5, np.int32),
                            senders=s, receivers=r,
                            edge_feat=np.zeros((6, 3), np.int32))
            s, r = _both_dirs(np.arange(n), (np.arange(n) + 1) % n)
            return dict(node_feat=np.full((n, 9), 5, np.int32),
                        senders=s, receivers=r,
                        edge_feat=np.zeros((2 * n, 3), np.int32))

    sp = scaffold_split(DS(), 0.5, 0.3, 0.2)
    allidx = np.concatenate([sp["train"], sp["valid"], sp["test"]])
    assert sorted(allidx.tolist()) == list(range(20))
    # scaffold groups never straddle splits: the 10 cyclohexanes go together
    for part in ("train", "valid", "test"):
        inter = set(sp[part]) & set(range(10))
        assert inter in (set(), set(range(10)))
    # deterministic
    sp2 = scaffold_split(DS(), 0.5, 0.3, 0.2)
    assert all(np.array_equal(sp[k], sp2[k]) for k in sp)


def test_read_ogb_split_dir_and_priority(tmp_path):
    d = tmp_path / "split" / "scaffold"
    os.makedirs(d)
    parts = {"train": [0, 2, 4], "valid": [1], "test": [3, 5]}
    for name, rows in parts.items():
        with gzip.open(d / f"{name}.csv.gz", "wt") as f:
            csv.writer(f).writerows([[x] for x in rows])
    got = read_ogb_split_dir(str(d))
    assert all(np.array_equal(got[k], np.array(v)) for k, v in parts.items())

    class DS:
        split_indices = None
    split = get_idx_split(DS(), str(tmp_path))
    assert np.array_equal(split["train"], [0, 2, 4])

    class DS2:
        split_indices = {"train": np.array([9]), "valid": np.array([8]),
                         "test": np.array([7])}
    split = get_idx_split(DS2(), str(tmp_path))
    assert split["train"][0] == 9      # stored split wins over csv dir


# ---------------------------------------------------------------------------
# chem kernel
# ---------------------------------------------------------------------------

def test_smiles_benzene_perception():
    mol = chem.parse_smiles("c1ccccc1")
    assert len(mol.atoms) == 6 and len(mol.bonds) == 6
    assert all(a.aromatic for a in mol.atoms)
    assert all(b.order == 1.5 for b in mol.bonds)
    assert all(mol.implicit_h(i) == 1 for i in range(6))
    assert all(mol.ring_atom_mask())
    assert all(h == "SP2" for h in
               (mol.hybridization(i) for i in range(6)))


def test_smiles_functional_groups():
    mol = chem.parse_smiles("CC(=O)O")       # acetic acid
    assert [mol.implicit_h(i) for i in range(4)] == [3, 0, 0, 1]
    assert mol.hybridization(1) == "SP2"
    mol = chem.parse_smiles("C#N")
    assert mol.implicit_h(0) == 1 and mol.hybridization(0) == "SP"
    mol = chem.parse_smiles("[NH4+]")
    assert mol.atoms[0].charge == 1 and mol.implicit_h(0) == 4
    mol = chem.parse_smiles("[O-]C")
    assert mol.atoms[0].charge == -1


def test_smiles_ring_closures_and_branches():
    mol = chem.parse_smiles("C1CC1C(F)(F)F")   # cyclopropane + CF3
    ra = mol.ring_atom_mask()
    assert ra[:3] == [True, True, True] and not any(ra[3:])
    mol = chem.parse_smiles("C%10CC%10")       # %nn ring closure
    assert len(mol.bonds) == 3
    with pytest.raises(chem.SmilesError):
        chem.parse_smiles("C1CC")              # unclosed ring


def test_smiles_to_graph_feature_codes():
    g = chem.smiles_to_graph("CCO")
    assert g["node_feat"].shape == (3, 9)
    assert g["node_feat"][:, 0].tolist() == [5, 5, 7]   # C,C,O codes
    # total degree (incl. implicit H): CH3=4, CH2=4, OH=2
    assert g["node_feat"][:, 2].tolist() == [4, 4, 2]
    assert g["node_feat"][:, 4].tolist() == [3, 2, 1]   # H counts
    assert g["senders"].shape == (4,)                   # both directions


def test_sdf_roundtrip():
    sdf = """mol1
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.1000    1.2000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  2  0
M  END
>  <homo>
-0.25

$$$$
"""
    mols = chem.parse_sdf(sdf)
    assert len(mols) == 1
    mol, props = mols[0]
    assert [a.symbol for a in mol.atoms] == ["C", "C", "O"]
    assert mol.bonds[1].order == 2.0
    assert props["homo"].strip() == "-0.25"
    g = chem.mol_to_graph_arrays(mol)
    assert g["coords"].shape == (3, 3)
    assert np.isclose(g["coords"][1, 0], 1.5)
    # acetaldehyde-like: C sp2 at the carbonyl
    assert mol.hybridization(1) == "SP2"
