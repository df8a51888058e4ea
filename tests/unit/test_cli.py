import json
import sys

import pytest

from molvax.cli import main


def test_presets_command(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in ("chemvae_5k", "zinc250k", "property_joint", "moses_scaled"):
        assert name in out


@pytest.mark.slow
def test_train_tiny_and_sample(tmp_path, capsys):
    ckpt = str(tmp_path / "ck")
    metrics = str(tmp_path / "m.jsonl")
    rc = main(
        [
            "train",
            "--preset",
            "chemvae_5k",
            "--override",
            "data.n_synthetic=64",
            "--override",
            "model.max_len=32",
            "--override",
            "data.max_len=32",
            "--override",
            "model.latent_dim=12",
            "--override",
            "model.enc_hidden=16",
            "--override",
            "model.gru_hidden=16",
            "--override",
            "model.gru_layers=1",
            "--override",
            "train.batch_size=16",
            "--override",
            f"train.checkpoint_dir={ckpt}",
            "--override",
            "train.log_every=5",
            "--steps",
            "10",
            "--metrics",
            metrics,
            "--quiet",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines and lines[-1]["step"] == 10
    capsys.readouterr()  # flush the train summary line

    overrides = [
        "--override", "model.max_len=32",
        "--override", "model.latent_dim=12",
        "--override", "model.enc_hidden=16",
        "--override", "model.gru_hidden=16",
        "--override", "model.gru_layers=1",
    ]
    rc = main(["sample", "--ckpt", ckpt, "-n", "3"] + overrides)
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 3

    # aggregate-posterior sampling path (fits N(mean, cov) to the corpus)
    rc = main(
        ["sample", "--ckpt", ckpt, "-n", "3", "--aggregate"]
        + overrides
        + ["--override", "data.n_synthetic=64", "--override", "data.max_len=32"]
    )
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["reconstruct", "--ckpt", ckpt, "CCO"] + overrides)
    assert rc == 0
    assert capsys.readouterr().out.startswith("CCO\t")

    rc = main(["interpolate", "--ckpt", ckpt, "CCO", "CCN", "-n", "4"] + overrides)
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 4

    rc = main(
        ["evaluate", "--ckpt", ckpt, "--n-prior", "8"]
        + overrides
        + ["--override", "data.n_synthetic=64", "--override", "data.max_len=32",
           "--override", "train.batch_size=16"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "gen_valid" in report and "recon_char_acc" in report


def test_bad_override():
    with pytest.raises(SystemExit):
        main(["train", "--override", "nokey", "--steps", "1"])


@pytest.mark.slow
def test_missing_ckpt():
    with pytest.raises(SystemExit):
        main(["sample", "--ckpt", "/tmp/definitely/missing", "-n", "1"])


def test_read_smiles_lines_tsv_with_commas(tmp_path):
    """Tab is the unambiguous field separator: a TSV row whose later
    fields contain commas must still yield just the first field
    (round-3 review finding: comma-first splitting kept the tab)."""
    from molvax.cli import _read_smiles_lines

    p = tmp_path / "in.smi"
    p.write_text("# hdr\nCCO\tZINC-1,batch2\nCCN,plain_csv\nsmiles\nCCC\n")
    assert _read_smiles_lines(str(p)) == ["CCO", "CCN", "CCC"]


def test_read_smiles_lines_name_column(tmp_path):
    """Whitespace-separated name columns ('CCO ethanol') are the standard
    .smi convention; parsing now matches data/zinc.py::load_smiles_file
    exactly (round-3 review finding: names were kept in the SMILES and
    crashed strict encoding)."""
    from molvax.cli import _read_smiles_lines

    p = tmp_path / "named.smi"
    p.write_text("canonical_smiles\nCCO ethanol\nc1ccccc1 benzene,x\n")
    assert _read_smiles_lines(str(p)) == ["CCO", "c1ccccc1"]
