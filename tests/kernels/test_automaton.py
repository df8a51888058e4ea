"""Fused constrained-decoding automaton kernel vs the XLA reference path.

The kernel body and the fallback call the SAME step_mask_rem/advance
functions (latent/constrain.py), so these tests pin the packing layer and
the pallas_call plumbing: interpret mode on CPU must reproduce the
reference path bit-exactly (all state is integer; selection is the same
float compare) on real corpus-shaped decode trajectories.
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from molvax.config import ModelConfig
from molvax.data import DEFAULT_CHARSET
from molvax.data.featurize import decode_codes
from molvax.data.smiles_check import chem_valid
from molvax.kernels.automaton import (
    auto_step_pallas,
    auto_step_ref,
    pack_state,
    pack_tables,
    unpack_state,
)
from molvax.latent.constrain import build_tables, init_state
from molvax.latent.sample import generate
from molvax.nn import vae

T = 40
B = 8
TB = build_tables(DEFAULT_CHARSET)
ITAB = pack_tables(TB)
C = TB.n


def test_pack_unpack_roundtrip():
    st = init_state(B, T)
    st2 = unpack_state(pack_state(st))
    for name, a, b in zip(st._fields, st, st2):
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_kernel_trajectory_matches_reference():
    """Drive 30 steps of greedy constrained selection with random logits:
    the kernel (interpret mode) and the reference must agree on every
    emitted code AND every packed state field at every step."""
    key = jax.random.key(0)
    p_ref = p_pal = pack_state(init_state(B, T))
    for t in range(30):
        key, k = jax.random.split(key)
        scores = jax.random.normal(k, (B, C), jnp.float32)
        rem = jnp.int32(T - 1 - t)
        p_ref, c_ref = auto_step_ref(TB, p_ref, scores, rem)
        p_pal, c_pal = auto_step_pallas(ITAB, p_pal, scores, rem, C)
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pal))
        for i, (a, b) in enumerate(zip(p_ref, p_pal)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"state[{i}] step {t}"
            )


@pytest.mark.parametrize("greedy", [True, False])
def test_generate_pallas_automaton_equals_ref(greedy):
    cfg = ModelConfig(
        max_len=T, charset_size=C, latent_dim=16, enc_hidden=32,
        gru_hidden=24, gru_layers=2,
    )
    params = vae.init_vae_params(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (B, cfg.latent_dim))
    c_ref, _ = generate(
        params, cfg, z, jax.random.key(2), greedy=greedy,
        constrained=True, charset=DEFAULT_CHARSET,
    )
    cfg_pal = dataclasses.replace(cfg, use_pallas_automaton=True)
    c_pal, _ = generate(
        params, cfg_pal, z, jax.random.key(2), greedy=greedy,
        constrained=True, charset=DEFAULT_CHARSET,
    )
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pal))
    # and the constraint holds: every decoded string is chemically valid
    for s in decode_codes(np.asarray(c_pal), DEFAULT_CHARSET):
        assert s == "" or chem_valid(s), s


def test_repeat_z_pallas_automaton_equals_ref():
    cfg = ModelConfig(
        max_len=T, charset_size=C, latent_dim=16, enc_hidden=32,
        gru_hidden=24, gru_layers=2, decoder_conditioning="repeat_z",
    )
    params = vae.init_vae_params(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (B, cfg.latent_dim))
    c_ref, _ = generate(
        params, cfg, z, jax.random.key(2), greedy=True,
        constrained=True, charset=DEFAULT_CHARSET,
    )
    cfg_pal = dataclasses.replace(cfg, use_pallas_automaton=True)
    c_pal, _ = generate(
        params, cfg_pal, z, jax.random.key(2), greedy=True,
        constrained=True, charset=DEFAULT_CHARSET,
    )
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pal))
