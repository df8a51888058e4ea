"""Beam-search decoding (latent/beam.py): greedy equivalence at K=1,
score self-consistency, and composition with the valence automaton."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.data.smiles_check import chem_valid
from molvax.data.featurize import decode_codes
from molvax.latent.beam import beam_generate, beam_reconstruct
from molvax.latent.sample import generate
from molvax.train import train


def tiny_model(chem=False, steps=30, conditioning="teacher_forced"):
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=16, gru_layers=2,
            decoder_conditioning=conditioning,
        ),
        train=TrainConfig(batch_size=16),
        data=DataConfig(
            max_len=32, source="synthetic_chem" if chem else "synthetic"
        ),
    )
    ds = synthetic_dataset(64, max_len=32, seed=3, chem=chem)
    state, _ = train(cfg, dataset=ds, max_steps=steps, verbose=False)
    return cfg, state, ds


# Training the tiny models dominates this file's wall time; the tests only
# read the trained params, so one model per variant is shared module-wide.
@pytest.fixture(scope="module")
def base_model():
    return tiny_model()


@pytest.fixture(scope="module")
def chem_model():
    return tiny_model(chem=True, steps=60)


def test_beam1_equals_greedy(base_model):
    cfg, state, ds = base_model
    z = jax.random.normal(jax.random.key(0), (4, cfg.model.latent_dim))
    greedy_codes, _ = generate(state.params, cfg.model, z, greedy=True)
    beam_codes, _ = beam_generate(state.params, cfg.model, z, beam=1)
    np.testing.assert_array_equal(
        np.asarray(greedy_codes), np.asarray(beam_codes)
    )


def test_beam_score_is_self_consistent(base_model):
    """The returned logprob must equal the re-scored logprob of the
    returned sequence under the model's own autoregressive factorization
    (sum of per-step log-softmax at the emitted tokens, frozen after the
    first pad)."""
    from molvax.nn.decoder import latent_embed
    from molvax.nn.encoder import linear
    from molvax.nn.gru import gru_stack_step

    cfg, state, ds = base_model
    mcfg = cfg.model
    z = jax.random.normal(jax.random.key(1), (4, mcfg.latent_dim))
    codes, score = beam_generate(state.params, mcfg, z, beam=4)

    # re-score: feed the emitted sequence back autoregressively
    dec = state.params["decoder"]
    z_emb = latent_embed(dec, mcfg, z)
    L = len(dec["gru"])
    H = dec["gru"][0]["w_hh"].shape[0]
    B, T = codes.shape
    C = mcfg.charset_size
    hs = jnp.zeros((L, B, H), jnp.float32)
    start = dec.get("start_token")
    prev = (
        jnp.broadcast_to(start.astype(jnp.float32)[None, :], (B, C))
        if start is not None
        else jnp.zeros((B, C), jnp.float32)
    )
    total = jnp.zeros((B,), jnp.float32)
    done = jnp.zeros((B,), bool)
    for t in range(T):
        x_t = jnp.concatenate([z_emb, prev], axis=-1)
        hs, out = gru_stack_step(dec["gru"], hs, x_t)
        logp = jax.nn.log_softmax(linear(dec["linear_out"], out), axis=-1)
        tok = codes[:, t]
        step_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        total = total + jnp.where(done, 0.0, step_lp)
        done = done | (tok == 0)
        prev = jax.nn.one_hot(tok, C, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(total), rtol=2e-4, atol=2e-4
    )


def test_beam_finds_no_worse_mode_than_greedy(base_model):
    """Beam-4's best logprob should be >= greedy's sequence logprob for
    the overwhelming majority of latents; assert on the batch mean to
    keep the test robust to the rare pruned-greedy-path case."""
    cfg, state, ds = base_model
    mcfg = cfg.model
    z = jax.random.normal(jax.random.key(2), (16, mcfg.latent_dim))
    _, s1 = beam_generate(state.params, mcfg, z, beam=1)
    _, s4 = beam_generate(state.params, mcfg, z, beam=4)
    assert float(jnp.mean(s4 - s1)) >= -1e-4


def test_constrained_beam_is_chem_valid(chem_model):
    cfg, state, ds = chem_model
    z = jax.random.normal(jax.random.key(3), (6, cfg.model.latent_dim))
    codes, _ = beam_generate(
        state.params, cfg.model, z, beam=3,
        constrained=True, charset=ds.charset,
    )
    smiles = decode_codes(codes, ds.charset)
    assert all(chem_valid(s) for s in smiles), smiles


def test_beam_reconstruct_roundtrip_runs(chem_model):
    cfg, state, ds = chem_model
    out = beam_reconstruct(
        state.params, cfg.model, ["CCO", "CCN"], beam=3, charset=ds.charset
    )
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_beam_repeat_z_routes_to_greedy():
    cfg, state, ds = tiny_model(conditioning="repeat_z", steps=10)
    z = jax.random.normal(jax.random.key(4), (4, cfg.model.latent_dim))
    g_codes, _ = generate(state.params, cfg.model, z, greedy=True)
    b_codes, score = beam_generate(state.params, cfg.model, z, beam=5)
    np.testing.assert_array_equal(np.asarray(g_codes), np.asarray(b_codes))
    assert np.all(np.isfinite(np.asarray(score)))
