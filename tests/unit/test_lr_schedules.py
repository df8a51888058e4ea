import pytest

pytestmark = pytest.mark.slow
import dataclasses

import jax
import numpy as np
import pytest

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.train import init_state, make_train_step, train
from molvax.train.loop import make_optimizer


def tiny_cfg(**train_kw):
    return Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(batch_size=8, **train_kw),
        data=DataConfig(max_len=32),
    )


def test_schedule_validation():
    with pytest.raises(AssertionError):
        TrainConfig(lr_schedule="bogus")


@pytest.mark.parametrize("sched", ["constant", "cosine", "warmup_cosine"])
def test_all_schedules_train(sched):
    cfg = tiny_cfg(
        lr_schedule=sched, learning_rate=2e-3, lr_warmup_steps=3, lr_decay_steps=50
    )
    ds = synthetic_dataset(32, max_len=32, seed=0)
    state, hist = train(cfg, dataset=ds, max_steps=6, verbose=False)
    assert int(jax.device_get(state.step)) == 6
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_warmup_starts_small():
    """First warmup step barely moves params; constant LR moves them more."""
    ds = synthetic_dataset(16, max_len=32, seed=1)
    codes = jax.numpy.asarray(ds.codes[:8])

    def delta(cfg):
        state = init_state(cfg)
        p0 = jax.tree.leaves(state.params)[0].copy()
        step = make_train_step(cfg)
        state, _ = step(state, codes, None)
        p1 = jax.tree.leaves(state.params)[0]
        return float(np.abs(np.asarray(p1) - np.asarray(p0)).max())

    d_warm = delta(tiny_cfg(lr_schedule="warmup_cosine", lr_warmup_steps=1000))
    d_const = delta(tiny_cfg(lr_schedule="constant"))
    assert d_warm < d_const * 0.1, (d_warm, d_const)


def test_schedule_survives_resume(tmp_path):
    """LR position rides the optimizer state through checkpoint/resume."""
    ds = synthetic_dataset(32, max_len=32, seed=2)
    kw = dict(
        lr_schedule="cosine", lr_decay_steps=20, checkpoint_every=3,
        checkpoint_dir=str(tmp_path / "ck"), log_every=1,
    )
    s_full, h_full = train(tiny_cfg(**kw), dataset=ds, max_steps=6, verbose=False)
    ck2 = dict(kw, checkpoint_dir=str(tmp_path / "ck2"))
    train(tiny_cfg(**ck2), dataset=ds, max_steps=3, verbose=False)
    s_res, h_res = train(tiny_cfg(**ck2), dataset=ds, max_steps=6, verbose=False)
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
