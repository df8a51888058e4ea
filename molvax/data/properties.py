"""Computed molecular property targets: logP / QED / SAS, offline.

Upgrades SURVEY.md 2.11 from composition surrogates: the reference's
property head regresses RDKit-computed logP/QED/SAS (SURVEY.md 2.11,
BASELINE.json:9). RDKit and the network are unavailable on this machine,
so this module computes real structure-level descriptors on the parsed
molecular graph (`smiles_check.parse_graph`) — per-atom typed
contributions, hydrogen-bond counts, polar surface, ring analysis — not
character statistics. Three documented deviations from the reference's
exact targets, each inherent to the offline environment:

  * ``crippen_logp`` — atomic-contribution logP in the Wildman-Crippen
    style (atom typing -> summed per-type coefficients). The published
    68-type table is not reproducible from memory, so the 16 own atom
    types below were least-squares calibrated against 33 experimental
    logP values of common molecules (fit MAE ~=0.3 log units; the golden
    set is pinned in tests/unit/test_properties.py).
  * ``qed_score`` — Bickerton-style quantitative drug-likeness: geometric
    mean of 8 desirability functions over MW, logP, HBD, HBA, polar
    surface, rotatable bonds, aromatic rings, and structural alerts. The
    construction follows the paper; the desirability parameterization is
    our own (the fitted ADS parameters are not available offline).
  * ``sas_score`` — Ertl-style synthetic accessibility in [1, 10] from
    size, ring complexity, macrocycles, stereo-free branching and
    heteroatom load. The published score's dominant term is a PubChem
    fragment-frequency table — unavailable offline — so this is a
    structural-complexity score, monotone in the same drivers.

All three are deterministic pure functions of the SMILES string, so the
property head trains against real chemistry-bearing targets and latent
optimization (`latent/optimize.py`) can be scored by RE-computing the
property on the decoded molecules (`evaluate.optimization_metrics`) — the
ChemVAE headline loop, closed offline.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .smiles_check import _VALENCE, MolGraph, parse_graph

_ATOMIC_WEIGHT = {
    "H": 1.008, "B": 10.81, "C": 12.011, "N": 14.007, "O": 15.999,
    "F": 18.998, "Na": 22.990, "Mg": 24.305, "Al": 26.982, "Si": 28.085,
    "P": 30.974, "S": 32.06, "Cl": 35.45, "K": 39.098, "Ca": 40.078,
    "Fe": 55.845, "Zn": 65.38, "Se": 78.971, "Br": 79.904, "I": 126.904,
}

_HETERO = frozenset(("N", "O", "S", "P"))
_HALOGENS = frozenset(("F", "Cl", "Br", "I"))


# ---------------------------------------------------------------------------
# graph analysis


@dataclasses.dataclass(frozen=True)
class AtomEnv:
    """Per-atom environment resolved from the graph: element, aromatic flag,
    charge, total hydrogen count (explicit bracket or implicit fill), bond
    orders to heavy neighbors, and ring membership."""

    symbol: str
    aromatic: bool
    charge: int
    h: int
    neighbors: Tuple[int, ...]
    orders: Tuple[int, ...]
    in_ring: bool


def _implicit_h(symbol: str, aromatic: bool, bond_sum: int, hcount: Optional[int]) -> int:
    """SMILES implicit-hydrogen fill. Bracket atoms carry their count
    explicitly; organic-subset aromatic atoms donate one valence unit to
    the pi system (benzene c: 4 - 2 - 1 = 1H; pyridine n: 3 - 2 - 1 = 0H;
    pyrrole N must be written [nH] — exactly the OpenSMILES rule)."""
    if hcount is not None:
        return hcount
    allowed = _VALENCE.get(symbol)
    if allowed is None:
        return 0
    if aromatic:
        return max(min(allowed) - bond_sum - 1, 0)
    for v in sorted(allowed):
        if v >= bond_sum:
            return v - bond_sum
    return 0


def _ring_bond_flags(n_atoms: int, bonds: Sequence[Tuple[int, int, int]]) -> List[bool]:
    """bond index -> lies on a cycle. Bridge-finding DFS (iterative); a
    bond is a ring bond iff it is NOT a bridge."""
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n_atoms)]
    for bi, (a, b, _o) in enumerate(bonds):
        adj[a].append((b, bi))
        adj[b].append((a, bi))
    disc = [-1] * n_atoms
    low = [0] * n_atoms
    is_bridge = [False] * len(bonds)
    timer = 0
    for root in range(n_atoms):
        if disc[root] >= 0:
            continue
        # stack entries: (node, parent_bond_index, neighbor cursor)
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, pbond, ci = stack[-1]
            if ci < len(adj[u]):
                stack[-1] = (u, pbond, ci + 1)
                v, bi = adj[u][ci]
                if bi == pbond:
                    continue
                if disc[v] >= 0:
                    low[u] = min(low[u], disc[v])
                else:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, bi, 0))
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        is_bridge[pbond] = True
    return [not b for b in is_bridge]


def atom_environments(
    g: MolGraph, ring_flags: Optional[List[bool]] = None
) -> List[AtomEnv]:
    n = len(g.atoms)
    nbrs: List[List[int]] = [[] for _ in range(n)]
    orders: List[List[int]] = [[] for _ in range(n)]
    for a, b, o in g.bonds:
        nbrs[a].append(b)
        orders[a].append(o)
        nbrs[b].append(a)
        orders[b].append(o)
    if ring_flags is None:
        ring_flags = _ring_bond_flags(n, g.bonds)
    in_ring = [False] * n
    for bi, (a, b, _o) in enumerate(g.bonds):
        if ring_flags[bi]:
            in_ring[a] = in_ring[b] = True
    out = []
    for i, (sym, arom, charge, hcount) in enumerate(g.atoms):
        h = _implicit_h(sym, arom, sum(orders[i]), hcount)
        out.append(
            AtomEnv(sym, arom, charge, h, tuple(nbrs[i]), tuple(orders[i]), in_ring[i])
        )
    return out


def _ring_stats(
    g: MolGraph, ring_flags: Optional[List[bool]] = None
) -> Tuple[int, int, int]:
    """(n_rings, n_aromatic_rings, max_ring_size).

    Ring count is cyclomatic (E - V + components). Aromatic rings are the
    cyclomatic number of the aromatic-bond subgraph. Ring size per ring
    bond = shortest alternative path between its endpoints + 1 (BFS with
    the bond removed); max over ring bonds — exact for isolated rings,
    lower-bounded for fused systems (good enough for a macrocycle alert)."""
    n = len(g.atoms)
    adj: List[List[int]] = [[] for _ in range(n)]
    for a, b, _o in g.bonds:
        adj[a].append(b)
        adj[b].append(a)
    seen = [False] * n
    components = 0
    for root in range(n):
        if seen[root]:
            continue
        components += 1
        stack = [root]
        seen[root] = True
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if not seen[v]:
                    seen[v] = True
                    stack.append(v)
    n_rings = max(len(g.bonds) - n + components, 0)

    arom_atoms = {i for i, a in enumerate(g.atoms) if a[1]}
    arom_bonds = [(a, b) for a, b, _o in g.bonds if a in arom_atoms and b in arom_atoms]
    arom_nodes = {a for ab in arom_bonds for a in ab}
    arom_adj: Dict[int, List[int]] = {a: [] for a in arom_nodes}
    for a, b in arom_bonds:
        arom_adj[a].append(b)
        arom_adj[b].append(a)
    seen_a: set = set()
    arom_components = 0
    for root in arom_nodes:
        if root in seen_a:
            continue
        arom_components += 1
        stack = [root]
        seen_a.add(root)
        while stack:
            u = stack.pop()
            for v in arom_adj[u]:
                if v not in seen_a:
                    seen_a.add(v)
                    stack.append(v)
    n_arom_rings = max(len(arom_bonds) - len(arom_nodes) + arom_components, 0)

    if ring_flags is None:
        ring_flags = _ring_bond_flags(n, g.bonds)
    max_size = 0
    for bi, (a, b, _o) in enumerate(g.bonds):
        if not ring_flags[bi]:
            continue
        # BFS from a to b avoiding this bond
        dist = {a: 0}
        frontier = [a]
        while frontier and b not in dist:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v in dist:
                        continue
                    if (u, v) in ((a, b), (b, a)) and dist[u] == 0 and v == b:
                        continue
                    dist[v] = dist[u] + 1
                    nxt.append(v)
            frontier = nxt
        if b in dist:
            max_size = max(max_size, dist[b] + 1)
    return n_rings, n_arom_rings, max_size


# ---------------------------------------------------------------------------
# descriptors


@dataclasses.dataclass(frozen=True)
class Descriptors:
    mw: float
    logp: float
    hbd: int
    hba: int
    tpsa: float
    rotatable_bonds: int
    aromatic_rings: int
    rings: int
    heavy_atoms: int
    hetero_fraction: float
    max_ring_size: int
    alerts: int


def molecular_weight(envs: Sequence[AtomEnv]) -> float:
    w = 0.0
    for a in envs:
        w += _ATOMIC_WEIGHT.get(a.symbol, 0.0) + a.h * _ATOMIC_WEIGHT["H"]
    return w


def h_bond_donors(envs: Sequence[AtomEnv]) -> int:
    return sum(1 for a in envs if a.symbol in ("N", "O") and a.h > 0)


def h_bond_acceptors(envs: Sequence[AtomEnv]) -> int:
    # Lipinski convention: every N and O counts.
    return sum(1 for a in envs if a.symbol in ("N", "O"))


def polar_surface(envs: Sequence[AtomEnv]) -> float:
    """TPSA-style polar surface estimate (A^2): Ertl-style fragment
    contributions for the common N/O/S environments (Ertl et al., J Med
    Chem 43:3714, 2000 — values for environments outside this subset fall
    back to the nearest listed one)."""
    t = 0.0
    for a in envs:
        if a.symbol == "O":
            if a.aromatic:
                t += 13.14
            elif 2 in a.orders:
                t += 17.07
            elif a.h > 0:
                t += 20.23
            else:
                t += 9.23
        elif a.symbol == "N":
            if a.aromatic:
                t += 15.79 if a.h > 0 else 12.89
            elif 3 in a.orders:
                t += 23.79
            elif 2 in a.orders:
                t += 12.36
            elif a.h >= 2:
                t += 26.02
            elif a.h == 1:
                t += 12.03
            else:
                t += 3.24
        elif a.symbol == "S":
            if a.aromatic:
                t += 28.24
            elif a.h > 0:
                t += 38.80
            elif 2 in a.orders:
                t += 32.09
            else:
                t += 25.30
    return t


def rotatable_bonds(
    g: MolGraph,
    envs: Sequence[AtomEnv],
    ring_flags: Optional[List[bool]] = None,
) -> int:
    """Single, acyclic bonds between non-terminal heavy atoms, excluding
    amide C-N (the standard RotB definition minus stereo refinements)."""
    if ring_flags is None:
        ring_flags = _ring_bond_flags(len(g.atoms), g.bonds)
    degree = [len(a.neighbors) for a in envs]

    def is_amide(c: int, n: int) -> bool:
        if envs[c].symbol != "C" or envs[n].symbol != "N":
            return False
        return any(
            envs[v].symbol == "O" and o == 2
            for v, o in zip(envs[c].neighbors, envs[c].orders)
        )

    count = 0
    for bi, (a, b, o) in enumerate(g.bonds):
        if o != 1 or ring_flags[bi]:
            continue
        if degree[a] < 2 or degree[b] < 2:
            continue
        if is_amide(a, b) or is_amide(b, a):
            continue
        count += 1
    return count


def _longest_aliphatic_chain(g: MolGraph, envs: Sequence[AtomEnv]) -> int:
    """Longest path (atom count) through acyclic aliphatic carbons —
    the greasy-chain structural alert. Exact DFS per start node; molecules
    here are <=~60 atoms and the chain subgraph is acyclic (forest), so the
    longest path per tree is found by double-BFS."""
    chain_nodes = {
        i
        for i, a in enumerate(envs)
        if a.symbol == "C" and not a.aromatic and not a.in_ring
    }
    adj: Dict[int, List[int]] = {i: [] for i in chain_nodes}
    for a, b, o in g.bonds:
        if a in chain_nodes and b in chain_nodes and o == 1:
            adj[a].append(b)
            adj[b].append(a)

    def bfs_far(start: int) -> Tuple[int, int]:
        dist = {start: 1}
        frontier = [start]
        far, fard = start, 1
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        if dist[v] > fard:
                            far, fard = v, dist[v]
                        nxt.append(v)
            frontier = nxt
        return far, fard

    best = 0
    seen: set = set()
    for s in chain_nodes:
        if s in seen:
            continue
        comp_far, _ = bfs_far(s)
        far2, d = bfs_far(comp_far)
        best = max(best, d)
        # mark component visited
        stack = [s]
        seen.add(s)
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
    return best


def structural_alerts(g: MolGraph, envs: Sequence[AtomEnv], max_ring: int) -> int:
    """Minimal own alert set (documented deviation from Brenk/Bickerton
    SMARTS alerts): greasy chain (>=8 acyclic aliphatic C), halogen load
    (>=4), macrocycle (ring size > 8)."""
    alerts = 0
    if _longest_aliphatic_chain(g, envs) >= 8:
        alerts += 1
    if sum(1 for a in envs if a.symbol in _HALOGENS) >= 4:
        alerts += 1
    if max_ring > 8:
        alerts += 1
    return alerts


# ---------------------------------------------------------------------------
# logP: own 16-type atomic-contribution model (Wildman-Crippen style)

# Least-squares fit to 37 experimental logP values (bench/fit_logp.py
# regenerates; tests/unit/test_properties.py pins the golden set, fit
# MAE = 0.23). Types: see _logp_counts.
_LOGP_COEF = {
    "C_ali": 0.5766,      # aliphatic C, no N/O/S/P neighbor (incl. its H)
    "C_ali_het": 0.0386,  # aliphatic C bonded to a heteroatom
    "C_aro": 0.3152,      # aromatic C
    "N_ali": -0.9486,
    "N_aro": -0.9149,
    "O_hydroxyl": -0.7939,
    "O_ether": -0.1860,
    "O_carbonyl": -0.7537,
    "S": 0.4787,
    "F": 0.1617,
    "Cl": 0.3695,
    "Br": 0.8810,
    "I": 1.1407,
    "H_polar": -0.0400,   # H on N/O/S
    "charge": -1.0,       # per unit |formal charge| (not fitted; ions are
    #                       outside the golden set — fixed hydrophilic bump)
    "bias": 0.2171,
}


def _logp_counts(envs: Sequence[AtomEnv]) -> Dict[str, float]:
    c: Dict[str, float] = {k: 0.0 for k in _LOGP_COEF}
    c["bias"] = 1.0
    for a in envs:
        if a.symbol == "C":
            if a.aromatic:
                c["C_aro"] += 1
            elif any(envs[v].symbol in _HETERO for v in a.neighbors):
                c["C_ali_het"] += 1
            else:
                c["C_ali"] += 1
        elif a.symbol == "N":
            c["N_aro" if a.aromatic else "N_ali"] += 1
            c["H_polar"] += a.h
        elif a.symbol == "O":
            if 2 in a.orders:
                c["O_carbonyl"] += 1
            elif a.h > 0:
                c["O_hydroxyl"] += 1
            else:
                c["O_ether"] += 1
            c["H_polar"] += a.h
        elif a.symbol == "S":
            c["S"] += 1
            c["H_polar"] += a.h
        elif a.symbol in _LOGP_COEF:
            c[a.symbol] += 1
        c["charge"] += abs(a.charge)
    return c


def crippen_logp(envs: Sequence[AtomEnv]) -> float:
    counts = _logp_counts(envs)
    return sum(_LOGP_COEF[k] * v for k, v in counts.items())


# ---------------------------------------------------------------------------
# QED / SAS


def _desir(x: float, mu: float, sigma: float) -> float:
    return 0.01 + 0.99 * math.exp(-0.5 * ((x - mu) / sigma) ** 2)


def qed_score(d: Descriptors) -> float:
    """Geometric mean of 8 desirability terms (Bickerton construction,
    own parameterization centered on drug-like ranges)."""
    terms = [
        _desir(d.mw, 300.0, 130.0),
        _desir(d.logp, 2.5, 1.8),
        _desir(float(d.hbd), 1.0, 1.8),
        _desir(float(d.hba), 3.0, 2.8),
        _desir(d.tpsa, 75.0, 50.0),
        _desir(float(d.rotatable_bonds), 3.0, 3.5),
        _desir(float(d.aromatic_rings), 1.5, 1.3),
        max(0.25 ** d.alerts, 0.01),
    ]
    return float(np.exp(np.mean(np.log(terms))))


def sas_score(d: Descriptors) -> float:
    """Structural-complexity synthetic accessibility in [1, 10]."""
    macro = 1.5 if d.max_ring_size > 8 else 0.0
    fused_extra = max(d.rings - d.aromatic_rings, 0)
    s = (
        1.0
        + 2.2 * math.tanh(d.heavy_atoms / 35.0)
        + 0.5 * fused_extra
        + 0.25 * d.aromatic_rings
        + macro
        + 2.0 * d.hetero_fraction
    )
    return float(min(max(s, 1.0), 10.0))


# ---------------------------------------------------------------------------
# public API


def descriptors(g: MolGraph) -> Descriptors:
    # the bridge-finding DFS dominates per-molecule graph analysis; compute
    # it once and thread it through (round-3 review finding: it used to run
    # three times per molecule)
    ring_flags = _ring_bond_flags(len(g.atoms), g.bonds)
    envs = atom_environments(g, ring_flags)
    n_rings, n_arom, max_ring = _ring_stats(g, ring_flags)
    heavy = len(envs)
    hetero = sum(1 for a in envs if a.symbol not in ("C", "H"))
    logp = crippen_logp(envs)
    alerts = structural_alerts(g, envs, max_ring)
    return Descriptors(
        mw=molecular_weight(envs),
        logp=logp,
        hbd=h_bond_donors(envs),
        hba=h_bond_acceptors(envs),
        tpsa=polar_surface(envs),
        rotatable_bonds=rotatable_bonds(g, envs, ring_flags),
        aromatic_rings=n_arom,
        rings=n_rings,
        heavy_atoms=heavy,
        hetero_fraction=hetero / max(heavy, 1),
        max_ring_size=max_ring,
        alerts=alerts,
    )


def properties_of(s: str) -> Optional[Tuple[float, float, float]]:
    """SMILES -> (logP, QED, SAS), or None when the string does not parse
    as a chemically valid molecule."""
    g = parse_graph(s)
    if g is None:
        return None
    d = descriptors(g)
    return d.logp, qed_score(d), sas_score(d)


def computed_properties(
    smiles: Iterable[str],
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch property computation. Returns ((N, 3) float32 [logP, QED, SAS],
    (N,) bool parse mask). Unparseable rows are filled with the column means
    of the parseable ones (0 when nothing parses) so the array is always
    finite — callers decide whether the parse fraction is high enough to
    use them (see zinc.property_targets)."""
    rows: List[Optional[Tuple[float, float, float]]] = [
        properties_of(s) for s in smiles
    ]
    n = len(rows)
    mask = np.array([r is not None for r in rows], dtype=bool)
    out = np.zeros((n, 3), dtype=np.float32)
    if mask.any():
        good = np.array([r for r in rows if r is not None], dtype=np.float32)
        fill = good.mean(axis=0)
        out[mask] = good
        out[~mask] = fill
    return out, mask
