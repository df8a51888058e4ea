"""Chemistry-level SMILES validation (data/smiles_check.py): real-molecule
acceptance, torture-case rejection, and the valence/ring/branch rules."""

import pytest

from molvax.data.smiles_check import chem_valid, chem_valid_fraction, parse_smiles

REAL_MOLECULES = [
    "CCO",                                   # ethanol
    "c1ccccc1",                              # benzene
    "CC(=O)Oc1ccccc1C(=O)O",                 # aspirin
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",            # caffeine (aromatic form)
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",          # caffeine (Kekule form)
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",            # ibuprofen
    "C1CCCCC1",                              # cyclohexane
    "N#Cc1ccccc1",                           # benzonitrile
    "[O-][N+](=O)c1ccccc1",                  # nitrobenzene (charged form)
    "N(=O)=O",                               # NO2 (pentavalent-N form)
    "C/C=C/C",                               # trans-2-butene
    "F[B-](F)(F)F",                          # tetrafluoroborate
    "c1ccc2ccccc2c1",                        # naphthalene (fused rings)
    "c1cc[nH]c1",                            # pyrrole
    "c1ccoc1",                               # furan
    "c1ccsc1",                               # thiophene
    "c1ccncc1",                              # pyridine
    "S(=O)(=O)(O)O",                         # sulfuric acid (S valence 6)
    "O=P(O)(O)O",                            # phosphoric acid (P valence 5)
    "ClC(Cl)(Cl)Cl",                         # carbon tetrachloride
    "C%10CCCCC%10",                          # %nn ring digits
    "CC.OCC",                                # dot-disconnected components
    "C=1CCCC=1",                             # ring-closure double bond
    "CC[N+](C)(C)C",                         # quaternary ammonium
    "[13CH4]",                               # isotope + explicit H
    "CCOC(=O)N1CCN(CC1)C(=O)c1ccco1",        # multi-ring ester/amide
]

INVALID = [
    ("", "empty"),
    ("C(", "unclosed branch"),
    ("C)", "unmatched close"),
    ("C1CC", "unclosed ring"),
    ("C11", "self ring bond"),
    ("C=", "dangling bond at end"),
    ("=C", "bond before atom"),
    ("C==C", "double bond chars"),
    ("Cl#Br", "halogen valence"),
    ("F=F", "halogen double bond"),
    ("CC(C)(C)(C)C", "carbon valence 5"),
    ("O=1CCCC=1", "trivalent neutral oxygen via ring closure"),
    ("[Xx]", "not an element"),
    ("[C", "unclosed bracket"),
    ("C%1C", "bad %nn digits"),
    ("C()C", "empty branch"),
    (".C", "leading dot"),
    ("C1CC2", "two unclosed rings"),
    ("9CC", "ring digit before any atom"),
    ("FF(F)F", "fluorine chain"),
    ("OO=O", "oxygen valence 3"),
    ("nBrBrC7o1F17", "old grammar-corpus sample"),
    ("c(FNc)=cC(c#FS)COO", "old grammar-corpus sample 2"),
]


@pytest.mark.parametrize("s", REAL_MOLECULES)
def test_real_molecules_pass(s):
    ok, why = parse_smiles(s)
    assert ok, f"{s!r} rejected: {why}"


@pytest.mark.parametrize("s,label", INVALID)
def test_invalid_rejected(s, label):
    ok, _ = parse_smiles(s)
    assert not ok, f"{s!r} ({label}) should be invalid"


def test_ring_bond_order_agreement():
    assert chem_valid("C=1CCCC=1")       # both ends =
    assert chem_valid("C=1CCCC1")        # one end carries the order
    assert not chem_valid("C=1CCCC#1")   # conflicting orders


def test_fraction():
    assert chem_valid_fraction(["CCO", "bogus(", "c1ccccc1"]) == pytest.approx(2 / 3)
    assert chem_valid_fraction([]) == 0.0


def test_trailing_dot_rejected():
    # OpenSMILES requires a chain after '.' — review finding round 3
    for s in ("CCO.", "C.", "CC.CC."):
        ok, why = parse_smiles(s)
        assert not ok and why == "trailing dot", (s, why)
    assert chem_valid("CC.CC")
