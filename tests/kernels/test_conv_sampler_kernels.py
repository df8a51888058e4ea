"""Fused conv-encoder and sampler kernels vs jnp references (interpret mode)."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import ModelConfig
from molvax.data import DEFAULT_CHARSET, encode_smiles, synthetic_smiles
from molvax.data.featurize import one_hot
from molvax.kernels.conv_enc import fused_encode
from molvax.kernels.sampler import fused_sample_kl
from molvax.nn import vae
from molvax.nn.encoder import encode as ref_encode
from molvax.train.loss import gaussian_kl

CFG = ModelConfig(
    max_len=48, charset_size=DEFAULT_CHARSET.size, latent_dim=24,
    enc_hidden=32, gru_hidden=16, gru_layers=1,
)


def _codes(cfg, n=4, seed=0):
    return jnp.asarray(
        encode_smiles(synthetic_smiles(n, seed=seed, max_len=cfg.max_len - 2),
                      max_len=cfg.max_len)
    )


@pytest.mark.parametrize("orientation", ["seq", "charset"])
def test_fused_encode_matches_reference(orientation):
    cfg = dataclasses.replace(CFG, conv_orientation=orientation)
    params = vae.init_vae_params(jax.random.key(0), cfg)["encoder"]
    codes = _codes(cfg)
    mu_k, lv_k = fused_encode(params, cfg, codes)
    mu_r, lv_r = ref_encode(params, cfg, one_hot(codes, cfg.charset_size))
    # kernel pipelines conv stages in bf16 (VMEM budget); tolerance reflects
    # the bf16 mantissa vs the fp32 reference
    np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_r), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(lv_k), np.asarray(lv_r), atol=2e-2, rtol=2e-2)


def test_fused_encode_gradient_is_reference_vjp():
    cfg = CFG
    params = vae.init_vae_params(jax.random.key(0), cfg)["encoder"]
    codes = _codes(cfg)

    def loss_k(p):
        mu, lv = fused_encode(p, cfg, codes)
        return jnp.sum(mu**2) + jnp.sum(jnp.sin(lv))

    def loss_r(p):
        mu, lv = ref_encode(p, cfg, one_hot(codes, cfg.charset_size))
        return jnp.sum(mu**2) + jnp.sum(jnp.sin(lv))

    g_k = jax.grad(loss_k)(params)
    g_r = jax.grad(loss_r)(params)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-3)


def test_fused_sampler_stats_and_kl():
    B, L = 256, 64
    mu = jnp.full((B, L), 0.7)
    logvar = jnp.full((B, L), -0.4)
    z, kl = fused_sample_kl(jax.random.key(3), mu, logvar, 1.0)
    assert z.shape == (B, L) and kl.shape == (B,)
    # KL must match the closed form exactly
    np.testing.assert_allclose(
        np.asarray(kl), np.asarray(gaussian_kl(mu, logvar)), atol=1e-4, rtol=1e-5
    )
    # eps statistics: mean ~ mu, std ~ exp(logvar/2) over 16k draws
    zs = np.asarray(z)
    assert abs(zs.mean() - 0.7) < 0.02
    assert abs(zs.std() - np.exp(-0.2)) < 0.02


def test_fused_sampler_deterministic_per_key():
    mu = jnp.zeros((8, 16))
    lv = jnp.zeros((8, 16))
    z1, _ = fused_sample_kl(jax.random.key(1), mu, lv, 1.0)
    z2, _ = fused_sample_kl(jax.random.key(1), mu, lv, 1.0)
    z3, _ = fused_sample_kl(jax.random.key(2), mu, lv, 1.0)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_fused_sampler_eps_scale():
    mu = jnp.zeros((16, 8))
    lv = jnp.zeros((16, 8))
    z_full, _ = fused_sample_kl(jax.random.key(0), mu, lv, 1.0)
    z_small, _ = fused_sample_kl(jax.random.key(0), mu, lv, 1e-2)
    np.testing.assert_allclose(
        np.asarray(z_small), 1e-2 * np.asarray(z_full), rtol=1e-5, atol=1e-8
    )


def test_fused_sampler_gradients():
    """Closed-form VJP vs autodiff of the same reparameterization with the
    SAME eps (reconstructed from z)."""
    B, L = 32, 16
    mu = jax.random.normal(jax.random.key(0), (B, L))
    logvar = 0.3 * jax.random.normal(jax.random.key(1), (B, L))

    def f(mu, logvar):
        z, kl = fused_sample_kl(jax.random.key(7), mu, logvar, 1.0)
        return jnp.sum(z * z) + jnp.sum(kl)

    g_mu, g_lv = jax.grad(f, argnums=(0, 1))(mu, logvar)

    z, _ = fused_sample_kl(jax.random.key(7), mu, logvar, 1.0)
    eps = (z - mu) / jnp.exp(0.5 * logvar)

    def f_ref(mu, logvar):
        z = mu + jnp.exp(0.5 * logvar) * eps
        kl = gaussian_kl(mu, logvar)
        return jnp.sum(z * z) + jnp.sum(kl)

    r_mu, r_lv = jax.grad(f_ref, argnums=(0, 1))(mu, logvar)
    np.testing.assert_allclose(np.asarray(g_mu), np.asarray(r_mu), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_lv), np.asarray(r_lv), atol=1e-3, rtol=1e-3)
