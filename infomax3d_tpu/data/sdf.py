"""Dependency-free MDL V2000 SDF reader with an RDKit-compatible API surface.

Featurization is host-side data prep (reference preprocesses with RDKit:
`datasets/qm9_dataset.py:370-471`).  This module lets `data/preprocess.py`
build the .npz cache from raw SDF files (QM9's `gdb9.sdf`, QMugs SDFs) in
environments WITHOUT RDKit: it parses the V2000 atom/bond/charge blocks and
exposes exactly the accessor surface the OGB-style featurizer
(`preprocess.atom_features` / `bond_features` / `mol_to_arrays`) consumes —
GetAtoms / GetBonds / GetConformers, GetAtomicNum, GetTotalDegree,
GetFormalCharge, GetHybridization, IsInRing, GetBondType, ...

Documented deviations from RDKit sanitization (all categorical embedding
codes, not numerics):
* hybridization comes from a bond-order heuristic (any triple or two doubles
  -> SP, any double/aromatic -> SP2, else SP3 for C/N/O-likes), not VSEPR
  perception;
* aromaticity is taken from explicit type-4 SDF bonds only (kekulized rings
  are NOT re-perceived as aromatic);
* radical electrons are 0 (QM9/QMugs molecules are closed-shell);
* `GetTotalNumHs()` returns 0 — matching RDKit on explicit-hydrogen SDF
  molecules (H neighbors are separate atoms, not implicit counts).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, TextIO

import numpy as np

_SYMBOL_TO_Z = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Br": 35, "I": 53,
}
_BOND_ORDER = {1: "SINGLE", 2: "DOUBLE", 3: "TRIPLE", 4: "AROMATIC"}


class SDFConformer:
    def __init__(self, coords: np.ndarray):
        self._coords = coords

    def GetPositions(self) -> np.ndarray:
        return self._coords


class SDFAtom:
    def __init__(self, mol: "SDFMol", idx: int, symbol: str, charge: int):
        self._mol = mol
        self._idx = idx
        self._symbol = symbol
        self._charge = charge

    def GetAtomicNum(self) -> int:
        return _SYMBOL_TO_Z.get(self._symbol, 0)

    def GetChiralTag(self) -> str:
        return "CHI_UNSPECIFIED"

    def GetTotalDegree(self) -> int:
        return len(self._mol._adj[self._idx])

    def GetFormalCharge(self) -> int:
        return self._charge

    def GetTotalNumHs(self) -> int:
        # explicit-hydrogen molecules: RDKit reports 0 implicit/explicit Hs
        return 0

    def GetNumRadicalElectrons(self) -> int:
        return 0

    def GetHybridization(self) -> str:
        orders = [b._order for b in self._mol._adj[self._idx]]
        if 3 in orders or orders.count(2) >= 2:
            return "SP"
        if 2 in orders or 4 in orders:
            return "SP2"
        return "SP3"

    def GetIsAromatic(self) -> bool:
        return any(b._order == 4 for b in self._mol._adj[self._idx])

    def IsInRing(self) -> bool:
        return any(b.IsInRing() for b in self._mol._adj[self._idx])


class SDFBond:
    def __init__(self, mol: "SDFMol", i: int, j: int, order: int):
        self._mol = mol
        self._i, self._j, self._order = i, j, order
        self._in_ring: Optional[bool] = None

    def GetBeginAtomIdx(self) -> int:
        return self._i

    def GetEndAtomIdx(self) -> int:
        return self._j

    def GetBondType(self) -> str:
        return _BOND_ORDER.get(self._order, "misc")

    def GetStereo(self) -> int:
        return 0          # STEREONONE

    def GetIsConjugated(self) -> bool:
        if self._order == 4:
            return True

        def has_pi(k):
            return any(b._order in (2, 3, 4) for b in self._mol._adj[k]
                       if b is not self)
        return self._order in (2, 3) and (has_pi(self._i) or has_pi(self._j)) \
            or (self._order == 1 and has_pi(self._i) and has_pi(self._j))

    def IsInRing(self) -> bool:
        if self._in_ring is None:
            self._mol._perceive_rings()
        return self._in_ring


class SDFMol:
    """One molecule parsed from a V2000 block."""

    def __init__(self, symbols: List[str], coords: np.ndarray,
                 bonds: List[tuple], charges: Dict[int, int],
                 name: str = "", props: Optional[Dict[str, str]] = None):
        self._symbols = symbols
        self._coords = coords
        self._charges = charges
        self.name = name
        self.props = props or {}
        self._bonds = [SDFBond(self, i, j, o) for i, j, o in bonds]
        self._adj: List[List[SDFBond]] = [[] for _ in symbols]
        for b in self._bonds:
            self._adj[b._i].append(b)
            self._adj[b._j].append(b)
        self._atoms = [SDFAtom(self, k, s, charges.get(k, 0))
                       for k, s in enumerate(symbols)]

    def GetNumAtoms(self) -> int:
        return len(self._atoms)

    def GetAtoms(self) -> List[SDFAtom]:
        return self._atoms

    def GetBonds(self) -> List[SDFBond]:
        return self._bonds

    def GetConformers(self) -> List[SDFConformer]:
        return [SDFConformer(self._coords)]

    def _perceive_rings(self) -> None:
        """A bond is a ring bond iff its endpoints stay connected after
        removing it (cycle edges of the molecular graph)."""
        n = len(self._atoms)
        for b in self._bonds:
            seen = [False] * n
            stack = [b._i]
            seen[b._i] = True
            found = False
            while stack and not found:
                u = stack.pop()
                for nb in self._adj[u]:
                    if nb is b:
                        continue
                    v = nb._j if nb._i == u else nb._i
                    if v == b._j:
                        found = True
                        break
                    if not seen[v]:
                        seen[v] = True
                        stack.append(v)
            b._in_ring = found


def _parse_block(lines: List[str]) -> Optional[SDFMol]:
    if len(lines) < 4:
        return None
    name = lines[0].strip()
    counts = lines[3]
    try:
        n_atoms = int(counts[0:3])
        n_bonds = int(counts[3:6])
    except ValueError:
        return None
    coords = np.zeros((n_atoms, 3), np.float32)
    symbols: List[str] = []
    for k in range(n_atoms):
        ln = lines[4 + k]
        coords[k] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
        symbols.append(ln[30:34].strip())
    bonds = []
    for k in range(n_bonds):
        ln = lines[4 + n_atoms + k]
        bonds.append((int(ln[0:3]) - 1, int(ln[3:6]) - 1, int(ln[6:9])))
    charges: Dict[int, int] = {}
    props: Dict[str, str] = {}
    i = 4 + n_atoms + n_bonds
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("M  CHG"):
            fields = ln.split()
            cnt = int(fields[2])
            for c in range(cnt):
                charges[int(fields[3 + 2 * c]) - 1] = int(fields[4 + 2 * c])
        elif ln.startswith("> "):
            key = ln.split("<")[-1].rstrip(">\n").rstrip(">")
            if i + 1 < len(lines):
                props[key] = lines[i + 1].strip()
            i += 1
        i += 1
    return SDFMol(symbols, coords, bonds, charges, name, props)


def parse_sdf(path_or_file) -> Iterator[Optional[SDFMol]]:
    """Yield molecules from a (possibly multi-record) SDF file; malformed
    records yield None, matching RDKit's SDMolSupplier contract."""
    close = False
    f: TextIO
    if hasattr(path_or_file, "read"):
        f = path_or_file
    else:
        f = open(path_or_file)
        close = True
    try:
        block: List[str] = []
        for line in f:
            if line.startswith("$$$$"):
                if block:
                    try:
                        yield _parse_block(block)
                    except (ValueError, IndexError):
                        yield None
                    block = []
            else:
                block.append(line.rstrip("\n"))
        if any(l.strip() for l in block):
            try:
                yield _parse_block(block)
            except (ValueError, IndexError):
                yield None
    finally:
        if close:
            f.close()
