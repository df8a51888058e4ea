import pytest
import jax
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.train import init_state, train
from molvax.train.evaluate import (
    evaluate,
    generation_metrics,
    reconstruction_metrics,
    teacher_forced_metrics,
)


def tiny_cfg():
    return Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(batch_size=8),
        data=DataConfig(max_len=32),
    )


@pytest.mark.slow
def test_evaluate_full_report():
    cfg = tiny_cfg()
    ds = synthetic_dataset(64, max_len=32, seed=0)
    state, _ = train(cfg, dataset=ds, max_steps=5, verbose=False)
    report = evaluate(state, cfg, ds, n_prior=32)
    for k in ("loss", "acc", "gen_valid", "gen_unique", "gen_novelty",
              "recon_exact", "recon_char_acc"):
        assert k in report, k
        assert np.isfinite(report[k]), k
    assert 0.0 <= report["gen_valid"] <= 1.0
    assert 0.0 <= report["recon_char_acc"] <= 1.0


@pytest.mark.slow
def test_generation_metrics_ranges():
    cfg = tiny_cfg()
    state = init_state(cfg)
    m = generation_metrics(state.params, cfg, jax.random.key(0), n=16)
    assert set(m) == {"gen_valid", "gen_unique", "gen_novelty", "gen_mean_len"}
    assert all(0.0 <= m[k] <= 1.0 for k in ("gen_valid", "gen_unique", "gen_novelty"))


@pytest.mark.slow
def test_reconstruction_metrics():
    cfg = tiny_cfg()
    ds = synthetic_dataset(32, max_len=32, seed=1)
    state = init_state(cfg)
    m = reconstruction_metrics(state.params, cfg, ds, jax.random.key(0), n=16)
    assert 0.0 <= m["recon_exact"] <= 1.0
    assert 0.0 <= m["recon_char_acc"] <= 1.0
