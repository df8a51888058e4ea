"""Valence-constrained decoding (molvax/latent/constrain.py).

Two properties make the automaton correct, and both are tested here:

1. SOUNDNESS — anything it lets through, the parser accepts: constrained
   generation from an UNTRAINED model (whose logits put mass everywhere,
   the adversarial case) must be 100% chem-valid at any temperature, with
   the pad escape hatch never firing.
2. COMPLETENESS (superset) — anything the corpus does, it allows: every
   teacher token of chem-valid training strings must be legal under the
   mask, so constraining never fights the data distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import ModelConfig
from molvax.data.charset import DEFAULT_CHARSET
from molvax.data.featurize import encode_smiles
from molvax.data.molgen import random_smiles
from molvax.data.smiles_check import parse_smiles
from molvax.latent import constrain as cn
from molvax.latent.sample import sample_prior
from molvax.nn.vae import init_vae_params

T = 120


def _validate(smiles):
    codes = jnp.asarray(encode_smiles(smiles, DEFAULT_CHARSET, T))
    ok, closed = cn.validate_codes(codes, DEFAULT_CHARSET, T)
    return np.asarray(ok), np.asarray(closed)


# --- completeness ---------------------------------------------------------


def test_superset_on_molgen_corpus():
    smiles = random_smiles(300, seed=7)
    ok, closed = _validate(smiles)
    bad = np.where(~ok.all(axis=1) | ~closed)[0]
    assert len(bad) == 0, [smiles[i] for i in bad[:5]]


REAL_SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",            # aspirin
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",     # caffeine, uppercase
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",       # caffeine, aromatic
    "C[C@@H](N)C(=O)O",                 # alanine (chirality + bracket H)
    "C[N+](C)(C)C",                     # quaternary N (charge)
    "[O-]C(=O)c1ccccc1",                # leading bracket atom
    "ClC(Cl)(Cl)Cl",                    # two-char halogens
    "BrCCBr",
    "C1CC2CCC1CC2",                     # bridged bicycle
    "c1ccc2ccccc2c1",                   # fused aromatic
    "C/C=C/C",                          # stereo bonds
    "N#Cc1ccccc1",                      # triple bond
    "CCS(=O)(=O)N",                     # hypervalent S
    "O=[N+]([O-])c1ccccc1",             # nitro
    "CC(C)(C)OC(=O)N1CCC(N)CC1",
    "FC(F)(F)c1ccccc1",
    "C1=CC=CC=C1",                      # kekulized ring
    "CC1=CC(=O)C=CC1=O",
    "c1ccc(-c2ccccc2)cc1",              # explicit single bond to ring
    "c1ccccc1Cc1ccccc1",                # ring digit REUSED (canonical form)
    "CC1CCCCC1C1CCCCC1",                # digit reuse, saturated rings
    "O=C(c1ccccc1)c1ccc(N)cc1",         # reuse inside/after branches
]


def test_superset_on_real_smiles():
    # every case must be parser-valid to be a meaningful superset probe
    cases = []
    for s in REAL_SMILES:
        okp, why = parse_smiles(s)
        if okp and all(c in DEFAULT_CHARSET for c in s):
            cases.append(s)
    assert len(cases) >= 21
    ok, closed = _validate(cases)
    for i, s in enumerate(cases):
        t = np.where(~ok[i])[0]
        assert ok[i].all() and closed[i], (
            s,
            t[:3],
            s[t[0]] if len(t) and t[0] < len(s) else "PAD",
        )


def test_percent_ring_digits_rejected_or_handled():
    # '%nn' ring digits are masked during generation (RMAX < 10 rings);
    # validate_codes on a %-string simply reports the token as illegal
    # rather than crashing. ('0' is not in the charset, so use %12.)
    if "%" not in DEFAULT_CHARSET.chars:
        pytest.skip("charset has no %")
    assert parse_smiles("C%12CCCCC%12")[0]
    ok, closed = _validate(["C%12CCCCC%12"])
    assert not (ok[0].all() and closed[0])


# --- soundness ------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        max_len=T, charset_size=DEFAULT_CHARSET.size, latent_dim=16,
        enc_hidden=16, gru_hidden=32, gru_layers=2,
    )
    params = init_vae_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.mark.slow
@pytest.mark.parametrize("greedy,temp", [(True, 1.0), (False, 1.0), (False, 3.0)])
def test_constrained_generation_all_valid(tiny_model, greedy, temp):
    cfg, params = tiny_model
    sm = sample_prior(
        params, cfg, 96, jax.random.key(11), greedy=greedy,
        temperature=temp, constrained=True,
    )
    bad = [(s, parse_smiles(s)[1]) for s in sm if not parse_smiles(s)[0]]
    assert not bad, bad[:5]
    assert all(len(s) >= 1 for s in sm)  # never an empty string


@pytest.mark.slow
def test_escape_hatch_never_fires(tiny_model):
    """Re-thread generated codes through the automaton: every emitted token
    must have been mask-legal and the final state closed (esc stays False —
    validate_codes folds esc into `closed`)."""
    from molvax.latent.sample import generate

    cfg, params = tiny_model
    z = jax.random.normal(jax.random.key(1), (64, cfg.latent_dim))
    codes, _ = generate(
        params, cfg, z, jax.random.key(2), greedy=False, temperature=2.5,
        constrained=True,
    )
    ok, closed = cn.validate_codes(codes, DEFAULT_CHARSET, T)
    assert bool(np.asarray(ok).all()) and bool(np.asarray(closed).all())


@pytest.mark.slow
def test_constrained_repeat_z_decoding(tiny_model):
    """The repeat_z (non-autoregressive) variant reuses the same automaton
    over its precomputed logits."""
    import dataclasses

    cfg, _ = tiny_model
    cfg_rz = dataclasses.replace(cfg, decoder_conditioning="repeat_z")
    params = init_vae_params(jax.random.key(3), cfg_rz)
    sm = sample_prior(
        params, cfg_rz, 32, jax.random.key(5), greedy=False,
        temperature=2.0, constrained=True,
    )
    bad = [s for s in sm if not parse_smiles(s)[0]]
    assert not bad, bad[:5]


# --- mask unit rules ------------------------------------------------------


def _mask_for(prefix: str):
    """Automaton mask after consuming ``prefix``, as a char -> bool dict."""
    tb = cn.build_tables(DEFAULT_CHARSET)
    st = cn.init_state(1, T)
    enc = DEFAULT_CHARSET.to_index()
    for t, ch in enumerate(prefix):
        tok = jnp.asarray([enc[ch]], jnp.int32)
        m = cn.step_mask(tb, st, jnp.asarray(t), T)
        assert bool(m[0, int(tok[0])]), (prefix, t, ch)
        st = cn.advance(tb, st, tok)
    m = cn.step_mask(tb, st, jnp.asarray(len(prefix)), T)
    return {c: bool(m[0, i]) for i, c in enumerate(DEFAULT_CHARSET.chars)}


def test_start_mask_is_atoms_only():
    m = _mask_for("")
    assert m["C"] and m["c"] and m["N"] and m["["]
    for ch in " ()=#123456789)]@+-%/\\":
        assert not m[ch], ch


def test_halogen_continuation_rules():
    assert _mask_for("C")["l"]  # Cl
    assert _mask_for("B")["r"]  # Br
    assert not _mask_for("N")["l"]
    assert not _mask_for("Cl")["l"]  # fixup window closed
    assert not _mask_for("C1")["l"]  # any token in between closes it
    # Cl cannot take a double bond: 'l' after 'C' with pending '=' illegal
    assert not _mask_for("C=C")["l"]


def test_valence_masks():
    m = _mask_for("CO")  # O has 1 bond, 1 left
    assert not m["="] and m["C"] and m[")"] is False
    m = _mask_for("CF")  # F saturated
    assert not m["C"] and not m["="] and not m["("]
    assert m[" "]  # legal stop
    m = _mask_for("C=")  # pending double bond
    assert not m["F"] and m["C"] and not m["="] and not m[" "]
    # N#C- : triple uses 3 of N's budget
    assert _mask_for("N#C")["C"]


def test_structure_masks():
    m = _mask_for("CC(")
    assert not m[")"]  # empty branch
    assert not m[" "]  # cannot pad with open branch
    m = _mask_for("CC(C")
    assert m[")"]
    m = _mask_for("C1CC")
    assert m["1"]  # ring closable
    assert not m[" "]  # not while ring 1 open
    m = _mask_for("C1")
    assert not m["1"]  # immediate reclosure = self-bond, parser-illegal
    m = _mask_for("CC")
    assert m[" "] and m["("] and m["="]


def test_bracket_masks():
    m = _mask_for("C[")
    assert m["n"] and m["C"] and m["N"]
    for ch in " ()=#@+-]123456789":
        assert not m[ch], ch
    m = _mask_for("C[n")
    assert m["H"] and m["]"] and m["+"]
    m = _mask_for("C[nH")
    assert m["]"]
    m = _mask_for("C[N+")
    assert m["]"] and m["+"] and m["2"]
    assert not m["-"]  # mixed signs illegal
    m = _mask_for("C[N++")
    assert not m["2"]  # sign-run + digits illegal (parser charge grammar)
    assert m["]"]


def test_validate_codes_rejects_parser_invalid():
    # strings the parser rejects must NOT thread the automaton
    bad = ["C(", "C1CC", "C=", "(C)", "C((C)", "CC)C", "F=F", "O=O=O"]
    really_bad = [s for s in bad if not parse_smiles(s)[0]]
    ok, closed = _validate(really_bad)
    accepted = ok.all(axis=1) & closed
    assert not accepted.any(), np.asarray(really_bad)[accepted]


def test_duplicate_bond_and_branch_start_rejected():
    """Round-3 review findings: the parser and the automaton must agree on
    rejecting a ring closure that duplicates an existing bond ('C1C1'),
    a branch starting with '(' ('C((C)C)'), and a ring digit directly
    after '(' ('C(1CC1)')."""
    for s in ["C1C1", "C((C)C)", "C(1CC1)", "C12(CC1)C2"]:
        assert not parse_smiles(s)[0], s
        ok, closed = _validate([s])
        assert not (ok[0].all() and closed[0]), s
    # and the valid neighbours stay valid on both sides
    for s in ["C1CC1", "C(C(C))O", "C12CC1C2"]:
        assert parse_smiles(s)[0], (s, parse_smiles(s)[1])
        ok, closed = _validate([s])
        assert ok[0].all() and closed[0], s


def test_digit_reuse_roundtrip():
    """Closed digits are reusable (canonical SMILES), and the duplicate
    check survives the slot being recycled: reusing digit 1 for a second
    ring bond between the SAME pair is still rejected."""
    ok, closed = _validate(["C1CC1C1CC1"])
    assert ok[0].all() and closed[0]
    # recycling in place: a2 closes ring 1 (bond a2-a0) and immediately
    # reopens digit 1 at itself; a4 closes it (bond a4-a2) — all pairs
    # distinct, valid on both sides
    s = "C1CC11CC1"
    assert parse_smiles(s)[0], parse_smiles(s)[1]
    ok, closed = _validate([s])
    assert ok[0].all() and closed[0], s


def test_trailing_dot_never_accepted():
    """Parser 'trailing dot' rule mirrored: validate_codes must not accept
    a string ending in '.', pad is illegal right after '.', and '.' is
    illegal in the final slot (round-3 review finding). DEFAULT_CHARSET
    has no '.', so a dot-bearing charset is built explicitly (the rule
    matters for .h5/corpus-derived charsets with multi-fragment rows)."""
    import jax.numpy as jnp

    from molvax.data import encode_smiles
    from molvax.data.charset import Charset
    from molvax.latent import constrain as cn

    cs = Charset.from_list(list(DEFAULT_CHARSET.chars) + ["."])
    T = 24
    codes = jnp.asarray(
        encode_smiles(["CCO.", "CC.CC"], charset=cs, max_len=T)
    )
    _, closed = cn.validate_codes(codes, cs, T)
    assert not bool(closed[0]) and bool(closed[1])

    tb = cn.build_tables(cs)
    st = cn.init_state(1, T)
    for ch in "CCO.":
        idx = cs.chars.index(ch)
        st = cn.advance(tb, st, jnp.array([idx], jnp.int32))
    m = cn.step_mask_rem(tb, st, jnp.int32(T - 5))
    pad_idx = cs.chars.index(" ")
    assert not bool(m[0, pad_idx])  # only a chain may follow the dot

    st2 = cn.init_state(1, T)
    for ch in "CC":
        idx = cs.chars.index(ch)
        st2 = cn.advance(tb, st2, jnp.array([idx], jnp.int32))
    m2 = cn.step_mask_rem(tb, st2, jnp.int32(0))  # final slot
    dot_idx = cs.chars.index(".")
    assert not bool(m2[0, dot_idx])
