"""Batch embedding workflow (latent/embed.py): encode_corpus/decode_latents
chunking correctness and the encode -> decode CLI round trip."""

import numpy as np
import pytest

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.data.featurize import decode_codes
from molvax.latent import decode_latents, encode_corpus, reconstruct
from molvax.train import train


def tiny_model(steps=30):
    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=16, gru_layers=2,
        ),
        train=TrainConfig(batch_size=16),
        data=DataConfig(max_len=32),
    )
    ds = synthetic_dataset(64, max_len=32, seed=3)
    state, _ = train(cfg, dataset=ds, max_steps=steps, verbose=False)
    return cfg, state, ds


# One trained tiny model serves every test here (they only read params);
# training it per-test dominated the file's wall time.
@pytest.fixture(scope="module")
def model():
    return tiny_model()


def test_chunking_matches_single_batch(model):
    cfg, state, ds = model
    smiles = decode_codes(ds.codes[:11], ds.charset)
    # 11 rows at batch=4 pads the tail; results must equal one big batch
    mu_a, lv_a = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=4
    )
    mu_b, lv_b = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=16
    )
    assert mu_a.shape == (11, cfg.model.latent_dim)
    np.testing.assert_allclose(mu_a, mu_b, rtol=0, atol=1e-5)
    np.testing.assert_allclose(lv_a, lv_b, rtol=0, atol=1e-5)


def test_decode_latents_matches_reconstruct(model):
    import jax

    cfg, state, ds = model
    smiles = decode_codes(ds.codes[:6], ds.charset)
    mu, _ = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=8
    )
    via_embed = decode_latents(
        state.params, cfg.model, mu, charset=ds.charset, batch=8
    )
    via_reconstruct = reconstruct(
        state.params, cfg.model, smiles, jax.random.key(0), charset=ds.charset
    )
    assert via_embed == via_reconstruct


def test_decode_latents_shape_check(model):
    cfg, state, _ = model
    with pytest.raises(ValueError):
        decode_latents(state.params, cfg.model, np.zeros((3, 5)))


def test_decode_latents_beam_runs(model):
    cfg, state, ds = model
    smiles = decode_codes(ds.codes[:3], ds.charset)
    mu, _ = encode_corpus(
        state.params, cfg.model, smiles, charset=ds.charset, batch=4
    )
    out = decode_latents(
        state.params, cfg.model, mu, charset=ds.charset, batch=4, beam=3
    )
    assert len(out) == 3 and all(isinstance(s, str) for s in out)


@pytest.mark.slow
def test_cli_encode_decode_roundtrip(tmp_path, capsys):
    from molvax.cli import main

    ckpt = str(tmp_path / "ck")
    overrides = [
        "--override", "data.n_synthetic=64",
        "--override", "model.max_len=32",
        "--override", "data.max_len=32",
        "--override", "model.latent_dim=12",
        "--override", "model.enc_hidden=16",
        "--override", "model.gru_hidden=16",
        "--override", "model.gru_layers=1",
        "--override", "train.batch_size=16",
    ]
    rc = main(
        ["train"] + overrides
        + ["--override", f"train.checkpoint_dir={ckpt}", "--steps", "10",
           "--quiet"]
    )
    assert rc == 0
    capsys.readouterr()

    smi_file = tmp_path / "in.smi"
    smi_file.write_text("# comment\nCCO\nCCN\nsmiles\nCCC,ignored_field\n")
    npz = str(tmp_path / "z.npz")
    rc = main(
        ["encode", "--ckpt", ckpt, "--in", str(smi_file), "--out", npz,
         "--batch", "4"]
    )
    assert rc == 0
    data = np.load(npz, allow_pickle=True)
    assert data["mu"].shape == (3, 12)  # header + comment rows skipped
    assert list(data["smiles"]) == ["CCO", "CCN", "CCC"]
    capsys.readouterr()

    rc = main(["decode", "--ckpt", ckpt, "--in", npz, "--batch", "4"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3

    # CSV-to-stdout path
    rc = main(["encode", "--ckpt", ckpt, "CCO", "--batch", "4"])
    assert rc == 0
    rows = capsys.readouterr().out.strip().splitlines()
    assert len(rows) == 1 and len(rows[0].split(",")) == 12
