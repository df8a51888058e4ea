"""GSPMD data-parallel latent workloads on 8 fake CPU devices.

The training path is mesh-tested in test_gspmd*.py; this covers the
inference surfaces (sample_prior, encode_corpus, decode_latents): the
same jitted programs run SPMD over the mesh's 'data' axis via input
placement alone (no per-step collectives — decode has no cross-batch
reductions), and numerics must equal the single-device run exactly.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.data.featurize import decode_codes
from molvax.latent import decode_latents, encode_corpus, sample_prior
from molvax.parallel import make_mesh
from molvax.train import train

import jax


@pytest.fixture(scope="module")
def trained():
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=16, gru_layers=2,
        ),
        train=TrainConfig(batch_size=16),
        data=DataConfig(max_len=32),
    )
    ds = synthetic_dataset(64, max_len=32, seed=3)
    state, _ = train(cfg, dataset=ds, max_steps=20, verbose=False)
    return cfg, state, ds


def test_sample_prior_mesh_equals_single(trained):
    cfg, state, _ = trained
    mesh = make_mesh()  # all 8 fake devices on 'data'
    key = jax.random.key(7)
    single = sample_prior(state.params, cfg.model, 16, key)
    sharded = sample_prior(state.params, cfg.model, 16, key, mesh=mesh)
    assert single == sharded


def test_sample_prior_mesh_divisibility(trained):
    cfg, state, _ = trained
    mesh = make_mesh()
    with pytest.raises(ValueError):
        sample_prior(state.params, cfg.model, 15, jax.random.key(0), mesh=mesh)


def test_encode_decode_mesh_equals_single(trained):
    cfg, state, ds = trained
    mesh = make_mesh()
    smiles = decode_codes(ds.codes[:19], ds.charset)
    mu_1, lv_1 = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=8
    )
    mu_m, lv_m = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=8, mesh=mesh
    )
    np.testing.assert_allclose(mu_1, mu_m, rtol=0, atol=1e-5)
    np.testing.assert_allclose(lv_1, lv_m, rtol=0, atol=1e-5)

    out_1 = decode_latents(
        state.params, cfg.model, mu_1, charset=ds.charset, batch=8
    )
    out_m = decode_latents(
        state.params, cfg.model, mu_1, charset=ds.charset, batch=8, mesh=mesh
    )
    assert out_1 == out_m
