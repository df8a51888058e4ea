import pytest
import jax
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.train import init_state, train
from molvax.train.evaluate import (
    aggregate_generation_metrics,
    evaluate,
    generation_metrics,
    interpolation_metrics,
    posterior_prior_metrics,
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
              "recon_exact", "recon_char_acc", "interp_valid",
              "interp_endpoint_exact", "interp_distinct", "post_prior_w2",
              "agg_valid", "agg_unique"):
        assert k in report, k
        assert np.isfinite(report[k]), k
    assert 0.0 <= report["gen_valid"] <= 1.0
    assert 0.0 <= report["recon_char_acc"] <= 1.0


@pytest.mark.slow
def test_generation_metrics_ranges():
    cfg = tiny_cfg()
    state = init_state(cfg)
    m = generation_metrics(state.params, cfg, jax.random.key(0), n=16)
    assert set(m) == {
        "gen_valid", "gen_chem_valid", "gen_unique", "gen_novelty",
        "gen_mean_len",
    }
    assert all(0.0 <= m[k] <= 1.0 for k in ("gen_valid", "gen_unique", "gen_novelty"))


@pytest.mark.slow
def test_reconstruction_metrics():
    cfg = tiny_cfg()
    ds = synthetic_dataset(32, max_len=32, seed=1)
    state = init_state(cfg)
    m = reconstruction_metrics(state.params, cfg, ds, jax.random.key(0), n=16)
    assert 0.0 <= m["recon_exact"] <= 1.0
    assert 0.0 <= m["recon_char_acc"] <= 1.0


@pytest.mark.slow
def test_interpolation_metrics_ranges():
    cfg = tiny_cfg()
    ds = synthetic_dataset(48, max_len=32, seed=2)
    state = init_state(cfg)
    m = interpolation_metrics(
        state.params, cfg, ds, jax.random.key(0), n_pairs=4, steps=5
    )
    assert set(m) == {
        "interp_valid", "interp_chem_valid", "interp_endpoint_exact",
        "interp_endpoint_char", "interp_distinct",
    }
    for k, v in m.items():
        assert 0.0 <= v <= 1.0, (k, v)
    # a path has at least its two (distinct) endpoints' decodes available,
    # and distinctness counts unique strings so it is at least 1/steps
    assert m["interp_distinct"] >= 1 / 5


@pytest.mark.slow
def test_posterior_prior_metrics_fresh_model():
    cfg = tiny_cfg()
    ds = synthetic_dataset(64, max_len=32, seed=3)
    state = init_state(cfg)
    m = posterior_prior_metrics(state.params, cfg, ds, n=64)
    assert m["post_mean_norm"] >= 0
    assert m["post_std_mean"] > 0
    # W2 to the prior is consistent with its own components
    assert m["post_prior_w2"] >= 0
    assert np.isfinite(m["post_prior_w2"])


@pytest.mark.slow
def test_aggregate_generation_metrics():
    cfg = tiny_cfg()
    ds = synthetic_dataset(96, max_len=32, seed=4)
    state = init_state(cfg)
    m = aggregate_generation_metrics(
        state.params, cfg, jax.random.key(1), ds, n=16
    )
    assert set(m) == {
        "agg_valid", "agg_chem_valid", "agg_unique", "agg_novelty",
        "agg_mean_len",
    }
    assert all(
        0.0 <= m[k] <= 1.0 for k in ("agg_valid", "agg_unique", "agg_novelty")
    )


@pytest.mark.slow
def test_optimization_metrics():
    """ChemVAE optimize->decode->rescore loop: runs end-to-end on a tiny
    property model over the chem corpus, lift computed in real property
    units (data/properties.py)."""
    from molvax.train.evaluate import optimization_metrics

    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1, n_properties=3,
        ),
        train=TrainConfig(batch_size=8),
        data=DataConfig(max_len=32, source="synthetic_chem"),
    )
    ds = synthetic_dataset(64, max_len=32, seed=5, chem=True, with_properties=True)
    state, _ = train(cfg, dataset=ds, max_steps=5, verbose=False)
    m = optimization_metrics(
        state.params, cfg, ds, jax.random.key(2), n=8, steps=5
    )
    assert set(m) == {
        "opt_pred_lift", "opt_real_lift", "opt_chem_valid", "opt_pairs"
    }
    assert np.isfinite(m["opt_pred_lift"])
    assert np.isfinite(m["opt_real_lift"])
    assert 0.0 <= m["opt_chem_valid"] <= 1.0
    # the optimizer ascends the head's prediction, so the head must claim
    # a non-negative gain even untrained
    assert m["opt_pred_lift"] >= 0.0
    # constrained variant: every decode parses, so every pair scores
    mc = optimization_metrics(
        state.params, cfg, ds, jax.random.key(2), n=8, steps=5,
        constrained=True, charset=ds.charset,
    )
    assert set(mc) == {
        "opt_con_pred_lift", "opt_con_real_lift", "opt_con_chem_valid",
        "opt_con_pairs",
    }
    assert mc["opt_con_chem_valid"] == 1.0
    assert mc["opt_con_pairs"] == 8.0


@pytest.mark.slow
def test_evaluate_includes_optimization_for_property_models():
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1, n_properties=3,
        ),
        train=TrainConfig(batch_size=8),
        data=DataConfig(max_len=32, source="synthetic_chem"),
    )
    ds = synthetic_dataset(64, max_len=32, seed=6, chem=True, with_properties=True)
    state, _ = train(cfg, dataset=ds, max_steps=5, verbose=False)
    report = evaluate(state, cfg, ds, n_prior=16)
    assert "opt_real_lift" in report and "prop_mse" in report
