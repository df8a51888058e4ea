"""EMA (Polyak) weight averaging: update math, chunked-trainer carry,
eval-state routing, and checkpoint round-trip.

Round-5 motivation: the quality operating point's held-out round-trip
fidelity varies wildly across seeds because the final iterate lands at a
random point of the late-training noise (see BASELINE.md seed-spread row);
the EMA iterate evaluates the trajectory's center instead of its endpoint.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.train import ema_eval_state, init_state, make_train_step
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


def _batches(n, B, T=32):
    ds = synthetic_dataset(n * B, max_len=T, seed=0)
    return [jnp.asarray(ds.codes[i * B : (i + 1) * B]) for i in range(n)]


def test_ema_off_is_none_everywhere():
    cfg = tiny_cfg()
    s = init_state(cfg)
    assert s.ema_params is None
    step = make_train_step(cfg)
    (b,) = _batches(1, cfg.train.batch_size)
    s, _ = step(s, b, None)
    assert s.ema_params is None
    # eval routing is the identity when no EMA was trained
    assert ema_eval_state(s) is s


def test_ema_matches_manual_recursion():
    d = 0.5  # large (1-d) so divergence from params is visible in few steps
    cfg = tiny_cfg(ema_decay=d)
    s = init_state(cfg)
    # at init the EMA IS the params
    for e, p in zip(jax.tree.leaves(s.ema_params), jax.tree.leaves(s.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    step = make_train_step(cfg)
    manual = jax.tree.map(jnp.copy, s.params)
    for b in _batches(3, cfg.train.batch_size):
        s, _ = step(s, b, None)
        manual = jax.tree.map(lambda e, p: d * e + (1 - d) * p, manual, s.params)
    for e, m in zip(jax.tree.leaves(s.ema_params), jax.tree.leaves(manual)):
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(m), atol=1e-6, rtol=1e-6
        )
    # and the EMA is NOT the raw params (it lags the trajectory)
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(jax.tree.leaves(s.ema_params), jax.tree.leaves(s.params))
    ]
    assert max(diffs) > 0


def test_ema_chunk_matches_sequential():
    d = 0.9
    cfg = tiny_cfg(ema_decay=d)
    K, B = 4, cfg.train.batch_size
    bs = _batches(K, B)

    s1 = init_state(cfg)
    step = make_train_step(cfg)
    for b in bs:
        s1, _ = step(s1, b, None)

    s2 = init_state(cfg)
    chunk = make_train_chunk(cfg, K)
    s2, _ = chunk(s2, jnp.stack(bs), None)

    for a, b_ in zip(
        jax.tree.leaves(s1.ema_params), jax.tree.leaves(s2.ema_params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5
        )


def test_ema_eval_state_swaps_params():
    cfg = tiny_cfg(ema_decay=0.5)
    s = init_state(cfg)
    step = make_train_step(cfg)
    for b in _batches(2, cfg.train.batch_size):
        s, _ = step(s, b, None)
    ev = ema_eval_state(s)
    assert ev.ema_params is None
    for p_ev, e in zip(
        jax.tree.leaves(ev.params), jax.tree.leaves(s.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(p_ev), np.asarray(e))
    # step/base_key/opt_state pass through untouched
    assert int(ev.step) == int(s.step)


def test_ema_checkpoint_roundtrip(tmp_path):
    from molvax.io import checkpoint as ckpt_io

    cfg = tiny_cfg(ema_decay=0.7)
    s = init_state(cfg)
    step = make_train_step(cfg)
    for b in _batches(2, cfg.train.batch_size):
        s, _ = step(s, b, None)

    mgr = ckpt_io.make_manager(str(tmp_path))
    ckpt_io.save(mgr, 2, s)
    mgr.wait_until_finished()
    restored = ckpt_io.restore_latest(mgr, init_state(cfg))
    for a, b_ in zip(
        jax.tree.leaves(s.ema_params), jax.tree.leaves(restored.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
