import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import KLScheduleConfig, ModelConfig
from molvax.train.loss import (
    gaussian_kl,
    recon_accuracy,
    recon_bce,
    recon_ce,
    vae_loss,
)
from molvax.train.schedules import beta_at


def test_kl_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) elementwise closed form
    mu = jnp.array([[0.5, -1.0]])
    logvar = jnp.array([[0.2, -0.3]])
    expected = 0.5 * np.sum(
        np.exp(np.asarray(logvar)) + np.asarray(mu) ** 2 - 1.0 - np.asarray(logvar)
    )
    np.testing.assert_allclose(np.asarray(gaussian_kl(mu, logvar))[0], expected, rtol=1e-6)


def test_kl_zero_at_prior():
    z = jnp.zeros((3, 8))
    np.testing.assert_allclose(np.asarray(gaussian_kl(z, z)), 0.0, atol=1e-7)


@pytest.mark.slow
def test_recon_ce_matches_manual():
    logits = jax.random.normal(jax.random.key(0), (2, 5, 7))
    codes = jnp.array([[0, 1, 2, 3, 4], [6, 5, 4, 3, 2]])
    logp = jax.nn.log_softmax(logits, -1)
    manual = -np.sum(
        np.take_along_axis(np.asarray(logp), np.asarray(codes)[..., None], axis=-1)[..., 0],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(recon_ce(logits, codes)), manual, rtol=1e-5)


def test_recon_ce_perfect_prediction_near_zero():
    codes = jnp.array([[0, 1, 2]])
    logits = 100.0 * jax.nn.one_hot(codes, 5)
    assert float(recon_ce(logits, codes)[0]) < 1e-3


def test_recon_bce_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = np.random.default_rng(0).normal(size=(2, 5, 7)).astype(np.float32)
    codes = np.array([[0, 1, 2, 3, 4], [6, 5, 4, 3, 2]])
    ours = np.asarray(recon_bce(jnp.asarray(logits), jnp.asarray(codes), 7))
    probs = torch.softmax(torch.from_numpy(logits), dim=-1)
    onehot = F.one_hot(torch.from_numpy(codes), 7).float()
    theirs = F.binary_cross_entropy(probs, onehot, reduction="none").sum(dim=(-1, -2))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4)


def test_recon_accuracy():
    codes = jnp.array([[1, 2, 0, 0]])  # two pad positions
    logits = 10.0 * jax.nn.one_hot(jnp.array([[1, 3, 0, 0]]), 5)  # one miss
    acc_all, acc_nonpad = recon_accuracy(logits, codes)
    assert float(acc_all) == pytest.approx(0.75)
    assert float(acc_nonpad) == pytest.approx(0.5)


def test_beta_schedules():
    const = KLScheduleConfig(kind="constant", beta_max=0.7)
    assert float(beta_at(const, 0)) == pytest.approx(0.7)
    assert float(beta_at(const, 9999)) == pytest.approx(0.7)

    lin = KLScheduleConfig(kind="linear", beta_max=1.0, warmup_steps=100)
    assert float(beta_at(lin, 0)) == 0.0
    assert float(beta_at(lin, 50)) == pytest.approx(0.5)
    assert float(beta_at(lin, 500)) == 1.0

    cyc = KLScheduleConfig(kind="cyclical", beta_max=1.0, cycle_steps=100, ratio=0.5)
    assert float(beta_at(cyc, 0)) == 0.0
    assert float(beta_at(cyc, 25)) == pytest.approx(0.5)
    assert float(beta_at(cyc, 60)) == 1.0  # hold phase
    assert float(beta_at(cyc, 100)) == 0.0  # cycle restart
    assert float(beta_at(cyc, 125)) == pytest.approx(0.5)


def test_vae_loss_composition():
    cfg = ModelConfig(max_len=5, charset_size=7, latent_dim=4)
    logits = jax.random.normal(jax.random.key(0), (2, 5, 7))
    codes = jnp.array([[0, 1, 2, 3, 4], [6, 5, 4, 3, 2]])
    mu = 0.1 * jnp.ones((2, 4))
    logvar = jnp.zeros((2, 4))
    loss, metrics = vae_loss(cfg, logits, codes, mu, logvar, jnp.float32(0.5))
    expected = float(
        jnp.mean(recon_ce(logits, codes) + 0.5 * gaussian_kl(mu, logvar))
    )
    assert float(loss) == pytest.approx(expected, rel=1e-6)
    assert set(metrics) >= {"loss", "recon", "kl", "elbo", "beta", "acc"}
    # beta=0 -> pure recon
    loss0, _ = vae_loss(cfg, logits, codes, mu, logvar, jnp.float32(0.0))
    assert float(loss0) == pytest.approx(float(jnp.mean(recon_ce(logits, codes))), rel=1e-6)


def test_vae_loss_free_bits():
    """Free bits floor each latent dim's KL in the loss: collapsed dims
    contribute the constant floor (zero gradient), active dims their true
    KL; the reported 'kl' metric stays the true KL either way."""
    from molvax.train.loss import gaussian_kl_per_dim

    cfg = ModelConfig(max_len=5, charset_size=7, latent_dim=4)
    logits = jax.random.normal(jax.random.key(0), (2, 5, 7))
    codes = jnp.array([[0, 1, 2, 3, 4], [6, 5, 4, 3, 2]])
    # two dims at the prior (kl=0, below floor), two dims far from it
    mu = jnp.array([[0.0, 0.0, 2.0, 3.0], [0.0, 0.0, 1.5, 2.5]])
    logvar = jnp.zeros((2, 4))
    fb = 0.1

    loss, metrics = vae_loss(
        cfg, logits, codes, mu, logvar, jnp.float32(1.0), kl_free_bits=fb
    )
    kl_dim = gaussian_kl_per_dim(mu, logvar)
    expected_kl_loss = jnp.sum(jnp.maximum(kl_dim, fb), axis=-1)
    expected = float(jnp.mean(recon_ce(logits, codes) + expected_kl_loss))
    assert float(loss) == pytest.approx(expected, rel=1e-6)
    # metric reports the TRUE KL, not the floored one
    assert float(metrics["kl"]) == pytest.approx(
        float(jnp.mean(gaussian_kl(mu, logvar))), rel=1e-6
    )
    assert float(loss) > float(
        vae_loss(cfg, logits, codes, mu, logvar, jnp.float32(1.0))[0]
    )

    # collapsed dims produce zero gradient through the floor
    def kl_part(mu):
        return jnp.mean(
            jnp.sum(jnp.maximum(gaussian_kl_per_dim(mu, logvar), fb), axis=-1)
        )

    g = jax.grad(kl_part)(mu)
    np.testing.assert_allclose(np.asarray(g[:, :2]), 0.0, atol=1e-7)
    assert float(jnp.min(jnp.abs(g[:, 2:]))) > 1e-3

    # free_bits wired through the preset
    from molvax.config import zinc250k_quality

    assert zinc250k_quality().train.kl.free_bits > 0


def test_vae_loss_property_term():
    cfg = ModelConfig(max_len=5, charset_size=7, latent_dim=4, n_properties=2)
    logits = jnp.zeros((2, 5, 7))
    codes = jnp.zeros((2, 5), jnp.int32)
    mu = jnp.zeros((2, 4))
    pred = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    true = jnp.zeros((2, 2))
    base, _ = vae_loss(cfg, logits, codes, mu, mu, jnp.float32(1.0))
    joint, metrics = vae_loss(
        cfg, logits, codes, mu, mu, jnp.float32(1.0),
        properties_pred=pred, properties_true=true, property_loss_weight=2.0,
    )
    assert float(joint) == pytest.approx(float(base) + 2.0 * 1.0, rel=1e-6)
    assert "prop_mse" in metrics


def test_post_std_batch_metric_value():
    """post_std_batch = mean_d sqrt(var_batch(mu_d) + eps^2 * mean(e^logvar_d))
    — the in-batch proxy of evaluate's aggregate post_std_mean that feeds the
    train-loop collapse guard."""
    cfg = ModelConfig(max_len=5, charset_size=7, latent_dim=3, eps_scale=0.5)
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 5, 7)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 7, size=(4, 5)))
    mu = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    _, metrics = vae_loss(cfg, logits, codes, mu, logvar, jnp.float32(1.0))
    var_z = np.var(np.asarray(mu), axis=0) + 0.25 * np.mean(
        np.exp(np.asarray(logvar)), axis=0
    )
    expected = float(np.mean(np.sqrt(var_z)))
    assert float(metrics["post_std_batch"]) == pytest.approx(expected, rel=1e-5)
    # collapse direction: identical means + tiny eps -> metric ~ eps-noise
    cfg2 = ModelConfig(max_len=5, charset_size=7, latent_dim=3, eps_scale=0.02)
    mu_c = jnp.zeros((4, 3))
    logvar_c = jnp.zeros((4, 3))
    _, m2 = vae_loss(cfg2, logits, codes, mu_c, logvar_c, jnp.float32(1.0))
    assert float(m2["post_std_batch"]) == pytest.approx(0.02, rel=1e-4)
