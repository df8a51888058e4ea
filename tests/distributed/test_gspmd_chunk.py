"""Fused multi-step trainer under GSPMD: 8-way DP chunk == 1-device chunk."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.parallel import make_mesh, replicate, stacked_batch_sharding
from molvax.train import init_state
from molvax.train.loop import make_train_chunk


def test_chunk_dp_matches_single(devices):
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(batch_size=16),
        data=DataConfig(max_len=32),
    )
    K, B = 3, 16
    ds = synthetic_dataset(K * B, max_len=32, seed=0)
    stack = ds.codes.reshape(K, B, 32)

    s1 = init_state(cfg)
    chunk1 = make_train_chunk(cfg, K)
    s1, m1 = chunk1(s1, jnp.asarray(stack), None)

    mesh = make_mesh(devices=devices)
    s8 = replicate(mesh, init_state(cfg))
    chunk8 = make_train_chunk(cfg, K)
    sharded = jax.device_put(stack, stacked_batch_sharding(mesh))
    assert sharded.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    s8, m8 = chunk8(s8, sharded, None)

    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m8["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)
