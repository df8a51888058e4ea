"""GSPMD data parallelism on 8 fake CPU devices (SURVEY.md sections 4.5, 5.8).

The idiomatic TPU stand-in for a multi-chip test: same mesh/sharding code as
a real v5e-8, asserting (a) shardings land as annotated, (b) the 8-way
data-parallel step is numerically equal to the single-device step on the same
global batch (the compiler-inserted gradient psum is exact in fp32).
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.parallel import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from molvax.train import init_state, make_train_step


def tiny_cfg(batch_size=16):
    return Config(
        model=ModelConfig(
            max_len=32,
            charset_size=DEFAULT_CHARSET.size,
            latent_dim=12,
            enc_hidden=16,
            gru_hidden=16,
            gru_layers=2,
        ),
        train=TrainConfig(batch_size=batch_size, learning_rate=1e-3),
        data=DataConfig(max_len=32),
    )


def test_mesh_construction(devices):
    mesh = make_mesh(devices=devices)
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape["model"] == 1


def test_batch_sharding_layout(devices):
    mesh = make_mesh(devices=devices)
    codes = np.zeros((16, 32), np.uint8)
    sharded = shard_batch(mesh, codes)
    assert sharded.sharding.spec == P(DATA_AXIS)
    # each device holds 1/8 of the batch
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 32)}


def test_replicated_params(devices):
    mesh = make_mesh(devices=devices)
    cfg = tiny_cfg()
    state = init_state(cfg)
    state_r = replicate(mesh, state)
    leaf = jax.tree.leaves(state_r.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_step_matches_single_device(devices):
    """Same global batch, same init: 8-way DP step == 1-device step."""
    cfg = tiny_cfg(batch_size=16)
    ds = synthetic_dataset(64, max_len=32, seed=0)
    codes = ds.codes[:16]

    # single device
    state1 = init_state(cfg)
    step1 = make_train_step(cfg)
    new1, m1 = step1(state1, jnp.asarray(codes), None)

    # 8-device mesh
    mesh = make_mesh(devices=devices)
    state8 = replicate(mesh, init_state(cfg))
    step8 = make_train_step(cfg)
    sharded = shard_batch(mesh, codes)
    new8, m8 = step8(state8, sharded, None)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-6, atol=1e-6
    )
    for p1, p8 in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), rtol=2e-5, atol=2e-6
        )


def test_dp_multi_step_trajectory(devices):
    """Several steps stay in lockstep (catches sharding-dependent PRNG or
    reduction bugs that only show up after an update)."""
    cfg = tiny_cfg(batch_size=16)
    ds = synthetic_dataset(64, max_len=32, seed=1)
    mesh = make_mesh(devices=devices)

    s1 = init_state(cfg)
    s8 = replicate(mesh, init_state(cfg))
    step1, step8 = make_train_step(cfg), make_train_step(cfg)
    for i in range(4):
        codes = ds.codes[i * 16 : (i + 1) * 16]
        s1, m1 = step1(s1, jnp.asarray(codes), None)
        s8, m8 = step8(s8, shard_batch(mesh, codes), None)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)


def test_uneven_mesh_subset(devices):
    """A 4-device mesh from an 8-device host also works (driver may dry-run
    with various n_devices)."""
    mesh = make_mesh(devices=devices[:4])
    cfg = tiny_cfg(batch_size=8)
    state = replicate(mesh, init_state(cfg))
    ds = synthetic_dataset(8, max_len=32, seed=2)
    step = make_train_step(cfg)
    new_state, metrics = step(state, shard_batch(mesh, ds.codes), None)
    assert np.isfinite(float(metrics["loss"]))
