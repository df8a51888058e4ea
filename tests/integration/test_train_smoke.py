"""Integration: a tiny config trains end-to-end with decreasing loss
(SURVEY.md section 4.4), checkpoints resume, sampling emits strings."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import numpy as np
import pytest

from molvax.config import (
    Config,
    DataConfig,
    KLScheduleConfig,
    ModelConfig,
    TrainConfig,
)
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.latent import sample_prior
from molvax.train import init_state, make_eval_step, make_train_step, train


def tiny_config(**model_kw) -> Config:
    return Config(
        name="tiny",
        model=ModelConfig(
            max_len=32,
            charset_size=DEFAULT_CHARSET.size,
            latent_dim=12,
            enc_hidden=24,
            gru_hidden=24,
            gru_layers=2,
            **model_kw,
        ),
        train=TrainConfig(
            batch_size=16,
            learning_rate=2e-3,
            kl=KLScheduleConfig(kind="linear", warmup_steps=200),
            log_every=20,
        ),
        data=DataConfig(n_synthetic=128, max_len=32),
    )


def test_loss_decreases():
    cfg = tiny_config()
    ds = synthetic_dataset(128, max_len=32, seed=0)
    state, history = train(cfg, dataset=ds, max_steps=80, verbose=False)
    assert len(history) >= 3
    first, last = history[0]["recon"], history[-1]["recon"]
    assert np.isfinite(last)
    assert last < first * 0.9, f"recon did not decrease: {first} -> {last}"


def test_train_step_metrics_finite():
    cfg = tiny_config(decoder_conditioning="repeat_z", recon_loss="bce")
    ds = synthetic_dataset(64, max_len=32, seed=1)
    state, history = train(cfg, dataset=ds, max_steps=10, verbose=False)
    for h in history:
        for k, v in h.items():
            assert np.isfinite(v), f"{k} not finite: {v}"


def test_eval_step():
    cfg = tiny_config()
    ds = synthetic_dataset(64, max_len=32, seed=2)
    state, _ = train(cfg, dataset=ds, max_steps=5, verbose=False)
    eval_step = make_eval_step(cfg)
    import jax.numpy as jnp

    codes = jnp.asarray(ds.codes[:16])
    metrics = eval_step(state, codes, None)
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_checkpoint_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, checkpoint_dir=ckpt_dir, checkpoint_every=5
        ),
    )
    ds = synthetic_dataset(64, max_len=32, seed=3)
    state1, _ = train(cfg, dataset=ds, max_steps=7, verbose=False)

    # Resume: a fresh train() picks up at step 7 and runs to 10.
    state2, _ = train(cfg, dataset=ds, max_steps=10, verbose=False)
    assert int(jax.device_get(state2.step)) == 10

    # The resumed run started from the saved params, not a fresh init.
    from molvax.train.loop import init_state as fresh_init

    fresh = fresh_init(cfg)
    p_resumed = jax.tree.leaves(state2.params)[0]
    p_fresh = jax.tree.leaves(fresh.params)[0]
    assert not np.allclose(np.asarray(p_resumed), np.asarray(p_fresh))


def test_post_std_batch_metric_logged():
    """The collapse-guard metric rides every train-metrics pull."""
    cfg = tiny_config()
    ds = synthetic_dataset(64, max_len=32, seed=4)
    _, history = train(cfg, dataset=ds, max_steps=20, verbose=False)
    vals = [h["post_std_batch"] for h in history if "post_std_batch" in h]
    assert vals, "post_std_batch missing from train metrics"
    assert all(np.isfinite(v) and v > 0 for v in vals)


def test_collapse_guard_aborts_and_checkpoints(tmp_path):
    """An impossible floor trips the guard at the first log pull past the
    warmup; the run checkpoints at the detection step, then raises."""
    from molvax.io import checkpoint as ckpt_io
    from molvax.train.loop import PosteriorCollapseError

    ckpt_dir = str(tmp_path / "ckpt")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            log_every=5,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=1000,
            collapse_std_floor=1e6,  # any real value is below this
            collapse_guard_after=0,
        ),
    )
    ds = synthetic_dataset(64, max_len=32, seed=5)
    with pytest.raises(PosteriorCollapseError):
        train(cfg, dataset=ds, max_steps=40, verbose=False)
    mgr = ckpt_io.make_manager(ckpt_dir)
    assert mgr.latest_step() == 5, "guard should checkpoint before raising"


def test_collapse_guard_warn_only_completes():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            log_every=5,
            collapse_std_floor=1e6,
            collapse_guard_after=0,
            collapse_abort=False,
        ),
    )
    ds = synthetic_dataset(64, max_len=32, seed=6)
    state, history = train(cfg, dataset=ds, max_steps=15, verbose=False)
    assert int(jax.device_get(state.step)) == 15


def test_collapse_guard_chunked_trainer():
    """The guard also fires on the fused-chunk path's stacked metrics."""
    from molvax.train.loop import PosteriorCollapseError

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            log_every=4,
            train_chunk_size=4,
            collapse_std_floor=1e6,
            collapse_guard_after=0,
        ),
    )
    ds = synthetic_dataset(64, max_len=32, seed=7)
    with pytest.raises(PosteriorCollapseError):
        train(cfg, dataset=ds, max_steps=16, verbose=False)


def test_collapse_guard_off_by_default():
    """floor=0.0 (every preset except quality) disables the guard even on
    a genuinely tiny-spread posterior."""
    cfg = tiny_config(eps_scale=1e-4)
    ds = synthetic_dataset(64, max_len=32, seed=8)
    state, _ = train(cfg, dataset=ds, max_steps=10, verbose=False)
    assert int(jax.device_get(state.step)) == 10


def test_sampling_after_training():
    cfg = tiny_config()
    ds = synthetic_dataset(128, max_len=32, seed=0)
    state, _ = train(cfg, dataset=ds, max_steps=30, verbose=False)
    smiles = sample_prior(state.params, cfg.model, 8, jax.random.key(0))
    assert len(smiles) == 8
    assert all(isinstance(s, str) for s in smiles)
