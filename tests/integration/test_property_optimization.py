"""Config-5 workload end-to-end: joint property training, then gradient
ascent in z improves the predicted property of decoded molecules."""

import pytest

pytestmark = pytest.mark.slow

import json

import jax
import numpy as np
import pytest

from molvax.cli import main
from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, surrogate_properties, synthetic_dataset
from molvax.latent import optimize_from_smiles, optimize_z
from molvax.latent.optimize import default_objective
from molvax.nn.property_head import predict_properties
from molvax.train import train


def trained_property_model(tmp_path, steps=120):
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=12,
            enc_hidden=16, gru_hidden=20, gru_layers=1, n_properties=3,
        ),
        train=TrainConfig(
            batch_size=16, learning_rate=2e-3, log_every=1000,
            checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=100000,
        ),
        data=DataConfig(max_len=32, n_synthetic=256),
    )
    ds = synthetic_dataset(256, max_len=32, seed=0, with_properties=True)
    state, _ = train(cfg, dataset=ds, max_steps=steps, verbose=False)
    return cfg, state, ds


def test_property_optimization_improves_prediction(tmp_path):
    cfg, state, ds = trained_property_model(tmp_path)
    z0 = jax.random.normal(jax.random.key(5), (8, cfg.model.latent_dim))
    res = optimize_z(state.params, cfg.model, z0, steps=60, lr=0.1)
    start = float(np.asarray(res.trajectory[0]).mean())
    end = float(np.asarray(res.objective).mean())
    assert end > start + 0.05, (start, end)
    # property head agrees with the optimized objective at the final z
    pred = predict_properties(state.params["property_head"], cfg.model, res.z)
    np.testing.assert_allclose(
        np.asarray(pred[:, 0]), np.asarray(res.objective), atol=1e-4
    )


def test_optimize_from_smiles_decodes(tmp_path):
    cfg, state, ds = trained_property_model(tmp_path, steps=60)
    out, res = optimize_from_smiles(
        state.params, cfg.model, ["CCO", "c1ccccc1"], jax.random.key(0),
        steps=30, lr=0.1,
    )
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)
    assert res.z.shape == (2, cfg.model.latent_dim)


def test_cli_optimize(tmp_path, capsys):
    # train a tiny property model via the CLI, then optimize
    ckpt = str(tmp_path / "ck")
    overrides = [
        "--preset", "property_joint",
        "--override", "data.n_synthetic=128",
        "--override", "data.max_len=32",
        "--override", "model.max_len=32",
        "--override", "model.latent_dim=8",
        "--override", "model.enc_hidden=12",
        "--override", "model.gru_hidden=12",
        "--override", "model.gru_layers=1",
        "--override", "train.batch_size=16",
        "--override", f"train.checkpoint_dir={ckpt}",
    ]
    assert main(["train"] + overrides + ["--steps", "8", "--quiet"]) == 0
    capsys.readouterr()
    rc = main(
        ["optimize", "--ckpt", ckpt, "--steps", "10", "--lr", "0.1", "CCO"]
        + overrides
    )
    assert rc == 0
    line = capsys.readouterr().out.strip()
    assert line.startswith("CCO\t")
    assert "->" in line


def test_cli_optimize_requires_property_head(tmp_path, capsys):
    ckpt = str(tmp_path / "ck2")
    overrides = [
        "--override", "data.n_synthetic=64",
        "--override", "data.max_len=32",
        "--override", "model.max_len=32",
        "--override", "model.latent_dim=8",
        "--override", "model.enc_hidden=12",
        "--override", "model.gru_hidden=12",
        "--override", "model.gru_layers=1",
        "--override", "train.batch_size=16",
        "--override", f"train.checkpoint_dir={ckpt}",
    ]
    assert main(["train"] + overrides + ["--steps", "2", "--quiet"]) == 0
    with pytest.raises(SystemExit, match="property head"):
        main(["optimize", "--ckpt", ckpt, "CCO"] + overrides)
