"""Chemically valid synthetic corpus (data/molgen.py): every generated
molecule must pass the chemistry-level parser, stay inside the default
charset, and the corpus must have the template-redundancy statistics the
character model relies on."""

import numpy as np
import pytest

from molvax.data.charset import DEFAULT_CHARSET
from molvax.data.molgen import random_molecule, random_smiles, write_smiles
from molvax.data.smiles_check import parse_smiles
from molvax.data.zinc import load_dataset, synthetic_dataset


def test_generated_molecules_all_chem_valid():
    rng = np.random.default_rng(42)
    for _ in range(300):
        s = write_smiles(random_molecule(rng), rng)
        ok, why = parse_smiles(s)
        assert ok, f"{s!r}: {why}"
        assert all(c in DEFAULT_CHARSET for c in s), s


def test_renderings_are_same_molecule_different_strings():
    rng = np.random.default_rng(7)
    mol = random_molecule(rng, n_atoms=14)
    strings = {write_smiles(mol, rng) for _ in range(20)}
    assert len(strings) > 1  # randomized DFS yields distinct renderings
    for s in strings:
        assert parse_smiles(s)[0], s
    # same molecule => same atom multiset in every rendering
    def atom_counts(s):
        out = {}
        i = 0
        while i < len(s):
            if s[i : i + 2] in ("Cl", "Br"):
                out[s[i : i + 2]] = out.get(s[i : i + 2], 0) + 1
                i += 2
            elif s[i].upper() in "BCNOPSFI" and s[i] not in "()=#123456789%[]":
                c = s[i].upper()
                out[c] = out.get(c, 0) + 1
                i += 1
            else:
                i += 1
        return out

    counts = {tuple(sorted(atom_counts(s).items())) for s in strings}
    assert len(counts) == 1


def test_random_smiles_corpus_stats():
    ss = random_smiles(300, seed=3, max_len=100, min_len=8)
    assert len(ss) == 300
    assert all(8 <= len(s) <= 100 for s in ss)
    assert all(parse_smiles(s)[0] for s in ss)
    # template redundancy: fewer unique strings than samples, but not all equal
    assert 10 < len(set(ss)) < 300


def test_synthetic_chem_dataset_roundtrip():
    ds = synthetic_dataset(64, max_len=80, seed=5, chem=True)
    assert ds.codes.shape == (64, 80)
    from molvax.data.featurize import decode_codes

    smiles = decode_codes(ds.codes, ds.charset)
    assert all(parse_smiles(s)[0] for s in smiles)


def test_load_dataset_synthetic_chem_source():
    ds = load_dataset("synthetic_chem", synthetic_n=32, max_len=64)
    assert len(ds) == 32


def test_determinism():
    assert random_smiles(50, seed=11) == random_smiles(50, seed=11)
    assert random_smiles(50, seed=11) != random_smiles(50, seed=12)


def test_aromatic_heteroatoms_never_substituted():
    """Pyridine-type 'n' (and o/s/[nH]) must carry no substituent: a
    3-connected uncharged aromatic nitrogen cannot kekulize (round-3
    review finding — the anchor site filter used to admit them)."""
    import numpy as np

    from molvax.data.molgen import random_molecule

    rng = np.random.default_rng(123)
    for _ in range(200):
        mol = random_molecule(rng)
        for i in range(len(mol)):
            if not mol.aromatic[i]:
                continue
            ring_deg = sum(1 for j in mol.adj[i] if mol.aromatic[j])
            subs = len(mol.adj[i]) - ring_deg
            if mol.symbols[i] == "C" and not mol.explicit_h[i]:
                assert subs <= 1, (i, mol.symbols[i], mol.adj[i])
            else:
                assert subs == 0, (i, mol.symbols[i], mol.adj[i])
