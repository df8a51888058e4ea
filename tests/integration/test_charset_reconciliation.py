"""Regression: corpus-derived charsets (non-default size/order) flow through
train -> checkpoint -> CLI inference without silent code-table mismatches."""

import pytest

pytestmark = pytest.mark.slow

import json

import numpy as np
import pytest

from molvax.cli import main
from molvax.data import Charset, decode_codes, load_smiles_file


SMILES = ["CCO", "CCN", "CCCO", "CNC", "OCCO", "NCCN", "CCOC", "OCN"] * 8


@pytest.fixture()
def corpus(tmp_path):
    p = tmp_path / "corpus.smi"
    p.write_text("\n".join(SMILES) + "\n")
    return str(p)


def test_corpus_charset_differs_from_default(corpus):
    ds = load_smiles_file(corpus, charset=None, max_len=16)
    assert ds.charset.size != 37  # only C, N, O + pad
    assert ds.charset.size == 4


def test_train_adapts_and_cli_decodes_with_corpus_charset(tmp_path, corpus, capsys):
    ckpt = str(tmp_path / "ck")
    overrides = [
        "--override", f"data.source={corpus}",
        "--override", "data.max_len=16",
        "--override", "model.max_len=16",
        "--override", "model.conv_kernels=(3,3,3)",
        "--override", "model.latent_dim=8",
        "--override", "model.enc_hidden=12",
        "--override", "model.gru_hidden=12",
        "--override", "model.gru_layers=1",
        "--override", "train.batch_size=8",
        "--override", f"train.checkpoint_dir={ckpt}",
    ]
    rc = main(["train"] + overrides + ["--steps", "5", "--quiet"])
    assert rc == 0
    capsys.readouterr()

    # the training charset was recorded
    chars = json.load(open(f"{ckpt}/charset.json"))
    assert set(chars) == {" ", "C", "N", "O"}

    # sampling restores the 4-char model (not the 37-char preset default)
    # and decodes with the corpus charset: only C/N/O can appear
    rc = main(["sample", "--ckpt", ckpt, "-n", "6"] + overrides)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 6
    for s in out:
        assert set(s) <= {"C", "N", "O"}, s

    rc = main(["reconstruct", "--ckpt", ckpt, "CCO"] + overrides)
    assert rc == 0
    line = capsys.readouterr().out.strip()
    assert line.startswith("CCO\t")
    assert set(line.split("\t")[1]) <= {"C", "N", "O"}


def test_train_resume_replays_data_order(tmp_path, corpus):
    """fast_forward on resume: interrupted+resumed == uninterrupted."""
    import dataclasses

    import jax

    from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
    from molvax.data import load_smiles_file
    from molvax.train import train

    ds = load_smiles_file(corpus, max_len=16)

    def cfg(ckdir):
        return Config(
            model=ModelConfig(
                max_len=16, charset_size=ds.charset.size, latent_dim=8,
                conv_kernels=(3, 3, 3), enc_hidden=12, gru_hidden=12,
                gru_layers=1,
            ),
            train=TrainConfig(
                batch_size=8, checkpoint_dir=ckdir, checkpoint_every=4,
                log_every=1,
            ),
            data=DataConfig(max_len=16),
        )

    # uninterrupted 8 steps
    s_full, h_full = train(cfg(str(tmp_path / "a")), dataset=ds, max_steps=8, verbose=False)
    # interrupted at 4, resumed to 8
    ckdir = str(tmp_path / "b")
    train(cfg(ckdir), dataset=ds, max_steps=4, verbose=False)
    s_res, h_res = train(cfg(ckdir), dataset=ds, max_steps=8, verbose=False)

    np.testing.assert_allclose(
        [h["loss"] for h in h_full[-4:]],
        [h["loss"] for h in h_res[-4:]],
        rtol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_self_describing_checkpoint_restores_without_overrides(tmp_path, corpus, capsys):
    """`--ckpt` alone restores the full config (config.json) - no need to
    re-pass the preset/overrides the model was trained with."""
    ckpt = str(tmp_path / "sd")
    rc = main([
        "train",
        "--override", f"data.source={corpus}",
        "--override", "data.max_len=16",
        "--override", "model.max_len=16",
        "--override", "model.conv_kernels=(3,3,3)",
        "--override", "model.latent_dim=8",
        "--override", "model.enc_hidden=12",
        "--override", "model.gru_hidden=12",
        "--override", "model.gru_layers=1",
        "--override", "train.batch_size=8",
        "--override", f"train.checkpoint_dir={ckpt}",
        "--steps", "4", "--quiet",
    ])
    assert rc == 0
    capsys.readouterr()
    # bare --ckpt: config.json supplies the non-default architecture
    rc = main(["sample", "--ckpt", ckpt, "-n", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    for s in out:
        assert set(s) <= {"C", "N", "O"}, s
