"""Fused multi-step trainer == sequential steps (same PRNG, same batches)."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.train import init_state, make_train_step, train
from molvax.train.loop import make_train_chunk


def tiny_cfg(**train_kw):
    return Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(batch_size=8, **train_kw),
        data=DataConfig(max_len=32),
    )


def test_chunk_matches_sequential():
    cfg = tiny_cfg()
    ds = synthetic_dataset(64, max_len=32, seed=0)
    K, B = 4, cfg.train.batch_size

    s1 = init_state(cfg)
    step = make_train_step(cfg)
    for i in range(K):
        s1, m1 = step(s1, jnp.asarray(ds.codes[i * B : (i + 1) * B]), None)

    s2 = init_state(cfg)
    chunk = make_train_chunk(cfg, K)
    stack = jnp.asarray(ds.codes[: K * B].reshape(K, B, 32))
    s2, ms = chunk(s2, stack, None)

    assert ms["loss"].shape == (K,)
    np.testing.assert_allclose(
        float(m1["loss"]), float(ms["loss"][-1]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    assert int(jax.device_get(s2.step)) == K


def test_train_uses_chunks_end_to_end():
    cfg = tiny_cfg(train_chunk_size=4, log_every=4)
    ds = synthetic_dataset(64, max_len=32, seed=1)
    state, history = train(cfg, dataset=ds, max_steps=12, verbose=False)
    assert int(jax.device_get(state.step)) == 12
    assert [h["step"] for h in history] == [4, 8, 12]
    assert all(np.isfinite(h["loss"]) for h in history)


def test_chunk_with_properties():
    cfg = dataclasses.replace(
        tiny_cfg(train_chunk_size=3),
        model=dataclasses.replace(tiny_cfg().model, n_properties=3),
    )
    ds = synthetic_dataset(48, max_len=32, seed=2, with_properties=True)
    state, history = train(cfg, dataset=ds, max_steps=6, verbose=False)
    assert int(jax.device_get(state.step)) == 6
    assert "prop_mse" in history[-1]


def test_chunk_log_cadence_exact():
    """log_every not a multiple of chunk: every cadence step is logged with
    its own metrics (VERDICT r1: chunk=16/log_every=50 logged at 64, 112...)."""
    cfg = tiny_cfg(train_chunk_size=16, log_every=50)
    ds = synthetic_dataset(64, max_len=32, seed=4)
    state, history = train(cfg, dataset=ds, max_steps=160, verbose=False)
    train_logs = [h["step"] for h in history if "loss" in h]
    assert train_logs == [50, 100, 150, 160]


def test_chunk_eval_checkpoint_cadence_once_per_window(tmp_path):
    """eval/checkpoint fire exactly once per crossed cadence window even when
    eval_every is not a multiple of the chunk size."""
    cfg = tiny_cfg(
        train_chunk_size=16,
        log_every=0,
        eval_every=50,
        eval_batches=1,
        checkpoint_every=50,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    ds = synthetic_dataset(128, max_len=32, seed=5)
    state, history = train(cfg, dataset=ds, max_steps=96, verbose=False)
    eval_logs = [h["step"] for h in history if any(k.startswith("eval_") for k in h)]
    # windows (0,50] and (50,96]: first chunk-end crossing each = 64 only for
    # 50; 96 does not cross 100 -> exactly one eval
    assert eval_logs == [64]


def test_chunk_logs_every_step_at_log_every_1():
    cfg = tiny_cfg(train_chunk_size=4, log_every=1)
    ds = synthetic_dataset(64, max_len=32, seed=6)
    state, history = train(cfg, dataset=ds, max_steps=8, verbose=False)
    steps = [h["step"] for h in history]
    assert steps == list(range(1, 9))
    # stacked per-step metrics must differ step to step (not the last
    # repeated): params update between steps, so losses differ
    losses = [h["loss"] for h in history]
    assert len(set(np.round(losses, 10))) > 1


def test_chunk_tail_smaller_than_chunk():
    """total_steps not divisible by chunk: tail runs single steps."""
    cfg = tiny_cfg(train_chunk_size=4, log_every=1)
    ds = synthetic_dataset(64, max_len=32, seed=3)
    state, _ = train(cfg, dataset=ds, max_steps=6, verbose=False)
    assert int(jax.device_get(state.step)) == 6
