import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import ModelConfig
from molvax.data import encode_smiles, synthetic_smiles
from molvax.nn import encoder as enc_mod
from molvax.nn import vae

CFG_SMALL = ModelConfig(
    max_len=32, charset_size=37, latent_dim=16, enc_hidden=24, gru_hidden=20,
    gru_layers=2,
)


def _batch(cfg, n=4, seed=0):
    smiles = synthetic_smiles(n, seed=seed, max_len=cfg.max_len - 2)
    return jnp.asarray(encode_smiles(smiles, max_len=cfg.max_len))


@pytest.mark.parametrize("orientation", ["seq", "charset"])
@pytest.mark.parametrize("conditioning", ["teacher_forced", "repeat_z"])
@pytest.mark.slow
def test_forward_shapes(orientation, conditioning):
    cfg = dataclasses.replace(
        CFG_SMALL, conv_orientation=orientation, decoder_conditioning=conditioning
    )
    params = vae.init_vae_params(jax.random.key(0), cfg)
    codes = _batch(cfg)
    out = vae.forward(params, cfg, jax.random.key(1), codes)
    B, T, C = codes.shape[0], cfg.max_len, cfg.charset_size
    assert out.logits.shape == (B, T, C)
    assert out.mu.shape == (B, cfg.latent_dim)
    assert out.logvar.shape == (B, cfg.latent_dim)
    assert out.z.shape == (B, cfg.latent_dim)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_conv_dims_paper_orientation():
    # SURVEY.md note A, variant (a): T=120, kernels 9/9/11 -> 94 positions,
    # flattened 10*94=940.
    cfg = ModelConfig()
    assert enc_mod.conv_spatial_len(cfg) == 94
    assert enc_mod.flat_conv_dim(cfg) == 940


def test_conv_dims_charset_orientation():
    # Variant (b): charset axis 33 -> 33-8-8-10 = 7 positions, flattened 70.
    cfg = ModelConfig(conv_orientation="charset", charset_size=33)
    assert enc_mod.conv_spatial_len(cfg) == 7
    assert enc_mod.flat_conv_dim(cfg) == 70


def test_reparameterize_deterministic_under_key():
    mu = jnp.ones((3, 8))
    logvar = jnp.zeros((3, 8))
    z1 = vae.reparameterize(jax.random.key(7), mu, logvar)
    z2 = vae.reparameterize(jax.random.key(7), mu, logvar)
    z3 = vae.reparameterize(jax.random.key(8), mu, logvar)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_reparameterize_eps_scale():
    mu = jnp.zeros((2, 8))
    logvar = jnp.zeros((2, 8))
    z_full = vae.reparameterize(jax.random.key(0), mu, logvar, eps_scale=1.0)
    z_small = vae.reparameterize(jax.random.key(0), mu, logvar, eps_scale=1e-2)
    np.testing.assert_allclose(
        np.asarray(z_small), 1e-2 * np.asarray(z_full), rtol=1e-6
    )


def test_encode_decode_api():
    cfg = CFG_SMALL
    params = vae.init_vae_params(jax.random.key(0), cfg)
    codes = _batch(cfg)
    mu, logvar = vae.encode(params, cfg, codes)
    z = vae.reparameterize(jax.random.key(1), mu, logvar)
    logits = vae.decode(params, cfg, z, teacher_codes=codes)
    assert logits.shape == (codes.shape[0], cfg.max_len, cfg.charset_size)


def test_teacher_forced_requires_teacher():
    cfg = CFG_SMALL
    params = vae.init_vae_params(jax.random.key(0), cfg)
    z = jnp.zeros((2, cfg.latent_dim))
    with pytest.raises(ValueError):
        vae.decode(params, cfg, z)


@pytest.mark.slow
def test_property_head():
    cfg = dataclasses.replace(CFG_SMALL, n_properties=3)
    params = vae.init_vae_params(jax.random.key(0), cfg)
    out = vae.forward(params, cfg, jax.random.key(1), _batch(cfg))
    assert out.properties is not None
    assert out.properties.shape == (4, 3)


@pytest.mark.slow
def test_bf16_policy_keeps_heads_fp32():
    cfg = dataclasses.replace(CFG_SMALL, compute_dtype="bfloat16")
    params = vae.init_vae_params(jax.random.key(0), cfg)
    out = vae.forward(params, cfg, jax.random.key(1), _batch(cfg))
    assert out.mu.dtype == jnp.float32
    assert out.logvar.dtype == jnp.float32


@pytest.mark.slow
def test_scaled_config_shapes():
    # Preset 4 architecture (BASELINE.json:10): 4x GRU-1024, latent-512.
    cfg = ModelConfig(latent_dim=512, gru_hidden=1024, gru_layers=4, enc_hidden=512)
    params = vae.init_vae_params(jax.random.key(0), cfg)
    assert len(params["decoder"]["gru"]) == 4
    assert params["decoder"]["gru"][0]["w_hh"].shape == (1024, 3072)
    codes = _batch(dataclasses.replace(cfg, max_len=120), n=2)
    out = vae.forward(params, cfg, jax.random.key(1), codes)
    assert out.logits.shape == (2, 120, cfg.charset_size)


def test_fp32_config_routes_around_fused_encoder(monkeypatch):
    """The dtype contract's routing gate: even with the Pallas backend
    reported available, a strict-fp32 config must take the XLA encode path
    (the fused conv kernel is bf16-only). On CPU the fused kernel would
    diverge/interpret; the gate means this forward runs the fp32 XLA path
    and matches encode+reparameterize exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import molvax.nn.vae as vae_mod
    from molvax.config import ModelConfig
    from molvax.data import DEFAULT_CHARSET

    monkeypatch.setattr(vae_mod, "_use_pallas_here", lambda: True)
    cfg = ModelConfig(
        max_len=32,
        charset_size=DEFAULT_CHARSET.size,
        latent_dim=12,
        enc_hidden=16,
        gru_hidden=16,
        gru_layers=2,
        use_pallas=True,
        compute_dtype="float32",
    )
    params = vae_mod.init_vae_params(jax.random.key(0), cfg)
    codes = jax.random.randint(
        jax.random.key(1), (4, 32), 0, cfg.charset_size
    ).astype(jnp.uint8)
    out = vae_mod.forward(params, cfg, jax.random.key(2), codes)
    assert out.kl is None, "fused sampler must not run under strict fp32"
    mu_ref, logvar_ref = vae_mod.encode(params, cfg, codes)
    np.testing.assert_array_equal(np.asarray(out.mu), np.asarray(mu_ref))
    assert np.all(np.isfinite(np.asarray(out.logits)))
