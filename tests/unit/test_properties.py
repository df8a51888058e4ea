"""Computed property targets (data/properties.py): descriptor correctness
on known molecules, the fitted-logP golden regression gate, and the
dataset/config wiring that replaces composition surrogates (SURVEY.md 2.11)."""

import numpy as np
import pytest

from molvax.data.properties import (
    atom_environments,
    computed_properties,
    descriptors,
    properties_of,
    qed_score,
    sas_score,
)
from molvax.data.smiles_check import parse_graph
from molvax.data.zinc import property_targets, surrogate_properties, synthetic_dataset


def desc(s):
    g = parse_graph(s)
    assert g is not None, s
    return descriptors(g)


# --- hydrogen fill / composition ------------------------------------------


@pytest.mark.parametrize(
    "smiles,h_counts",
    [
        ("C", [4]),
        ("CCO", [3, 2, 1]),
        ("c1ccccc1", [1] * 6),            # benzene CH x6
        ("c1ccncc1", [1, 1, 1, 0, 1, 1]),  # pyridine: n has no H
        ("c1cc[nH]c1", [1, 1, 1, 1, 1]),   # pyrrole: bracket [nH]
        ("C#N", [1, 0]),
        ("CC(=O)O", [3, 0, 0, 1]),
    ],
)
def test_implicit_hydrogens(smiles, h_counts):
    envs = atom_environments(parse_graph(smiles))
    assert [a.h for a in envs] == h_counts


@pytest.mark.parametrize(
    "smiles,mw",
    [
        ("C", 16.04),         # methane
        ("CCO", 46.07),       # ethanol
        ("c1ccccc1", 78.11),  # benzene
        ("CC(=O)Oc1ccccc1C(=O)O", 180.16),  # aspirin
    ],
)
def test_molecular_weight(smiles, mw):
    assert desc(smiles).mw == pytest.approx(mw, abs=0.05)


def test_hbd_hba():
    aspirin = desc("CC(=O)Oc1ccccc1C(=O)O")
    assert aspirin.hbd == 1 and aspirin.hba == 4
    caffeine_like = desc("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    assert caffeine_like.hbd == 0
    assert desc("NCCO").hbd == 2


def test_ring_analysis():
    assert desc("c1ccccc1").rings == 1
    assert desc("c1ccccc1").aromatic_rings == 1
    assert desc("C1CCCCC1").aromatic_rings == 0
    naph = desc("c1ccc2ccccc2c1")
    assert naph.rings == 2 and naph.aromatic_rings == 2
    assert desc("CCO").rings == 0
    assert desc("C1CCCCCCCCCCC1").max_ring_size == 12  # macrocycle
    assert desc("c1ccccc1").max_ring_size == 6


def test_rotatable_bonds():
    assert desc("CCCC").rotatable_bonds == 1   # central C-C only
    assert desc("c1ccccc1").rotatable_bonds == 0
    assert desc("CCc1ccccc1").rotatable_bonds == 1
    assert desc("CC(=O)NC").rotatable_bonds == 0  # amide excluded
    assert desc("C=CC=C").rotatable_bonds == 1


def test_tpsa_known_values():
    # exact Ertl fragment sums for molecules inside the implemented subset
    assert desc("CCO").tpsa == pytest.approx(20.23)
    assert desc("c1ccncc1").tpsa == pytest.approx(12.89)
    assert desc("CC(=O)O").tpsa == pytest.approx(17.07 + 20.23)
    assert desc("CCCC").tpsa == 0.0


# --- fitted logP golden gate ----------------------------------------------


def test_logp_golden_regression():
    from bench.fit_logp import GOLDEN_LOGP

    errs = []
    for smi, target in GOLDEN_LOGP:
        p = properties_of(smi)
        assert p is not None, smi
        errs.append(abs(p[0] - target))
    mae = float(np.mean(errs))
    assert mae < 0.35, f"logP fit regressed: MAE {mae:.3f}"
    assert max(errs) < 1.2


def test_logp_ordering():
    """Hydrophobicity ordering must hold even where absolute values drift."""
    logp = lambda s: properties_of(s)[0]
    assert logp("CCCCCCCC") > logp("CCCC") > logp("CCO") > logp("OCCO")
    assert logp("Clc1ccccc1") > logp("c1ccccc1") > logp("Nc1ccccc1")


# --- QED / SAS shapes ------------------------------------------------------


def test_qed_in_unit_interval_and_druglike_peak():
    drug_like = properties_of("CC(=O)Oc1ccccc1C(=O)O")[1]  # aspirin
    greasy = properties_of("CCCCCCCCCCCCCCCC")[1]          # hexadecane
    tiny = properties_of("C")[1]
    for q in (drug_like, greasy, tiny):
        assert 0.0 < q <= 1.0
    assert drug_like > greasy
    assert drug_like > tiny


def test_sas_bounds_and_monotonicity():
    simple = properties_of("CCO")[2]
    complex_ = properties_of("CC1CC2CCC1C(C(=O)OC1CCCCCCCCCC1)N2")[2]
    assert 1.0 <= simple <= 10.0 and 1.0 <= complex_ <= 10.0
    assert complex_ > simple
    macro = desc("C1CCCCCCCCCCC1")
    assert sas_score(macro) > sas_score(desc("C1CCCCC1"))


def test_alerts():
    assert desc("CCCCCCCCCC").alerts >= 1       # greasy chain
    assert desc("ClC(Cl)(Cl)C(Cl)Cl").alerts >= 1  # halogen load
    assert desc("CC(=O)Oc1ccccc1C(=O)O").alerts == 0


# --- batch API / wiring ----------------------------------------------------


def test_computed_properties_mask_and_fill():
    props, mask = computed_properties(["CCO", "not_smiles((", "c1ccccc1"])
    assert mask.tolist() == [True, False, True]
    assert props.shape == (3, 3) and props.dtype == np.float32
    assert np.isfinite(props).all()
    # unparseable row filled with column mean of the parseable ones
    np.testing.assert_allclose(props[1], props[[0, 2]].mean(axis=0), rtol=1e-5)


def test_property_targets_auto_dispatch():
    from molvax.data.charset import DEFAULT_CHARSET
    from molvax.data.featurize import encode_smiles

    chem = ["CCO", "c1ccccc1", "CCN", "CC(=O)O"]
    codes = encode_smiles(chem, DEFAULT_CHARSET, 32)
    auto = property_targets(chem, codes, DEFAULT_CHARSET, "auto")
    comp = property_targets(chem, codes, DEFAULT_CHARSET, "computed")
    np.testing.assert_array_equal(auto, comp)

    junk = ["))((", "==", "%%", "(("]
    jcodes = encode_smiles(["C"] * 4, DEFAULT_CHARSET, 32)
    auto_j = property_targets(junk, jcodes, DEFAULT_CHARSET, "auto")
    np.testing.assert_array_equal(
        auto_j, surrogate_properties(jcodes, DEFAULT_CHARSET)
    )


def test_chem_dataset_gets_computed_targets():
    ds = synthetic_dataset(48, max_len=80, seed=9, chem=True, with_properties=True)
    assert ds.properties is not None and ds.properties.shape == (48, 3)
    # real structural targets: logP varies molecule-to-molecule, QED in (0,1],
    # SAS in [1,10]
    assert ds.properties[:, 0].std() > 0.3
    assert (ds.properties[:, 1] > 0).all() and (ds.properties[:, 1] <= 1).all()
    assert (ds.properties[:, 2] >= 1).all() and (ds.properties[:, 2] <= 10).all()


def test_determinism():
    a, _ = computed_properties(["CCO", "c1ccncc1"])
    b, _ = computed_properties(["CCO", "c1ccncc1"])
    np.testing.assert_array_equal(a, b)
