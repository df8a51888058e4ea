"""Calibrate the own-table atomic-contribution logP (data/properties.py).

Solves ridge-regularized least squares from the 16 atom-type counts to 33
experimental octanol/water logP values of common molecules (values are
textbook/public-domain measurements). Prints the fitted coefficient dict to
paste into ``properties._LOGP_COEF`` plus the fit MAE; the golden set also
lives in tests/unit/test_properties.py as a regression gate.

    python -m bench.fit_logp
"""

from __future__ import annotations

import numpy as np

# (SMILES, experimental logP)
GOLDEN_LOGP = [
    ("C", 1.09),            # methane
    ("CC", 1.81),           # ethane
    ("CCC", 2.36),          # propane
    ("CCCC", 2.89),         # butane
    ("CCCCCC", 3.90),       # hexane
    ("C1CCCCC1", 3.44),     # cyclohexane
    ("C=C", 1.13),          # ethylene
    ("CC=C", 1.77),         # propene
    ("c1ccccc1", 2.13),     # benzene
    ("Cc1ccccc1", 2.73),    # toluene
    ("CCc1ccccc1", 3.15),   # ethylbenzene
    ("c1ccc2ccccc2c1", 3.30),  # naphthalene
    ("C=Cc1ccccc1", 2.95),  # styrene
    ("CO", -0.77),          # methanol
    ("CCO", -0.31),         # ethanol
    ("CCCCO", 0.88),        # 1-butanol
    ("CCOCC", 0.89),        # diethyl ether
    ("CC(=O)C", -0.24),     # acetone
    ("CC(=O)O", -0.17),     # acetic acid
    ("CCOC(C)=O", 0.73),    # ethyl acetate
    ("Nc1ccccc1", 0.90),    # aniline
    ("c1ccncc1", 0.65),     # pyridine
    ("Oc1ccccc1", 1.46),    # phenol
    ("COc1ccccc1", 2.11),   # anisole
    ("CCN", -0.13),         # ethylamine
    ("CCN(CC)CC", 1.45),    # triethylamine
    ("Clc1ccccc1", 2.84),   # chlorobenzene
    ("Brc1ccccc1", 2.99),   # bromobenzene
    ("Fc1ccccc1", 2.27),    # fluorobenzene
    ("Ic1ccccc1", 3.25),    # iodobenzene
    ("ClCCl", 1.25),        # dichloromethane
    ("ClC(Cl)Cl", 1.97),    # chloroform
    ("c1ccsc1", 1.81),      # thiophene
    ("CSC", 0.92),          # dimethyl sulfide
    ("CC#N", -0.34),        # acetonitrile
    ("c1cc[nH]c1", 0.75),   # pyrrole
    ("O=Cc1ccccc1", 1.48),  # benzaldehyde
]


def main() -> None:
    from molvax.data.properties import _LOGP_COEF, _logp_counts, atom_environments
    from molvax.data.smiles_check import parse_graph

    keys = [k for k in _LOGP_COEF if k != "charge"]  # charge term stays fixed
    rows, y = [], []
    for smi, target in GOLDEN_LOGP:
        g = parse_graph(smi)
        assert g is not None, smi
        c = _logp_counts(atom_environments(g))
        rows.append([c[k] for k in keys])
        y.append(target - _LOGP_COEF["charge"] * c["charge"])
    x = np.asarray(rows, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # small ridge keeps rarely-seen types (I, S) from overfitting single rows
    lam = 1e-3
    a = x.T @ x + lam * np.eye(len(keys))
    coef = np.linalg.solve(a, x.T @ y)
    pred = x @ coef
    mae = float(np.abs(pred - y).mean())
    print("{")
    for k, v in zip(keys, coef):
        print(f'    "{k}": {v:.4f},')
    print(f'    "charge": {_LOGP_COEF["charge"]},')
    print("}")
    print(f"fit MAE = {mae:.3f} over {len(y)} molecules")
    worst = np.argsort(-np.abs(pred - y))[:5]
    for i in worst:
        print(f"  worst: {GOLDEN_LOGP[i][0]:20s} exp {y[i]:+.2f} fit {pred[i]:+.2f}")


if __name__ == "__main__":
    main()
