import dataclasses

import pytest

from molvax.config import (
    Config,
    KLScheduleConfig,
    ModelConfig,
    PRESETS,
    apply_overrides,
    get_preset,
)


def test_all_presets_construct():
    for name in PRESETS:
        cfg = get_preset(name)
        assert isinstance(cfg, Config)
        assert cfg.name == name


def test_preset_specs_match_baseline():
    """Driver config pins (BASELINE.json:6-12)."""
    c1 = get_preset("chemvae_5k")
    assert c1.model.conv_channels == (9, 9, 10)
    assert c1.model.latent_dim == 292
    assert c1.model.gru_hidden == 501 and c1.model.gru_layers == 3
    assert c1.model.max_len == 120
    assert c1.train.batch_size == 64
    assert c1.data.n_synthetic == 5000

    c2 = get_preset("zinc250k")
    assert c2.train.batch_size == 256
    assert c2.train.kl.kind == "cyclical"
    assert c2.model.compute_dtype == "bfloat16"

    c3 = get_preset("property_joint")
    assert c3.model.n_properties == 3

    c4 = get_preset("moses_scaled")
    assert c4.model.gru_hidden == 1024 and c4.model.gru_layers == 4
    assert c4.model.latent_dim == 512
    assert c4.mesh.data_axis == 8
    assert c4.data.n_synthetic == 1_900_000

    ref = get_preset("chemvae_ref_faithful")
    assert ref.model.conv_orientation == "charset"
    assert ref.model.decoder_conditioning == "repeat_z"
    assert ref.model.recon_loss == "bce"
    assert ref.model.eps_scale == pytest.approx(1e-2)


def test_get_preset_unknown():
    with pytest.raises(KeyError):
        get_preset("nope")


def test_apply_overrides_nested():
    cfg = get_preset("chemvae_5k")
    out = apply_overrides(
        cfg,
        {
            "train.batch_size": 128,
            "model.latent_dim": 64,
            "train.kl.kind": "cyclical",
            "data.source": "/tmp/x.h5",
        },
    )
    assert out.train.batch_size == 128
    assert out.model.latent_dim == 64
    assert out.train.kl.kind == "cyclical"
    assert out.data.source == "/tmp/x.h5"
    # original untouched (frozen dataclasses)
    assert cfg.train.batch_size == 64


def test_model_config_validation():
    with pytest.raises(AssertionError):
        ModelConfig(conv_orientation="bogus")
    with pytest.raises(AssertionError):
        ModelConfig(decoder_conditioning="bogus")
    with pytest.raises(AssertionError):
        KLScheduleConfig(kind="bogus")


def test_config_hashable_for_jit():
    cfg = get_preset("chemvae_5k")
    assert hash(cfg.model) == hash(dataclasses.replace(cfg.model))


def test_quality_preset_ships_the_robust_recipe():
    """The round-5 re-centering contract: zinc250k_quality carries the
    measured seed-robust recipe (ss=0.25 + round-trip probe + best-iterate
    selection + collapse guard + per-layer kernels); no other preset turns
    the ss/wd knobs on."""
    from molvax.config import PRESETS, get_preset

    q = get_preset("zinc250k_quality")
    assert q.train.scheduled_sampling == 0.25
    assert q.train.word_dropout == 0.0
    assert q.train.eval_roundtrip_n > 0 and q.train.eval_every > 0
    assert q.train.select_best
    assert q.train.collapse_std_floor > 0
    assert q.model.gru_kernel == "per_layer"
    for name in PRESETS:
        if name == "zinc250k_quality":
            continue
        p = get_preset(name)
        assert p.train.scheduled_sampling == 0.0, name
        assert p.train.word_dropout == 0.0, name
