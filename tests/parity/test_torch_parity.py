"""Golden parity vs the PyTorch twin (SURVEY.md sections 4.2, 7 stage 3).

Identical weights (via molvax.io.torch_compat) + identical inputs must give
fp32-tolerance-identical encoder outputs, decoder logits, and losses, for
every combination of the lineage-variant flags (notes A/B). This is the
mechanism that pins molvax numerics to the PyTorch reference; when the real
reference weights become readable they drop into the same harness.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from bench.torch_twin.model import MolecularVAETwin, vae_loss_twin  # noqa: E402
from molvax.config import ModelConfig  # noqa: E402
from molvax.data import DEFAULT_CHARSET, encode_smiles, one_hot, synthetic_smiles  # noqa: E402
from molvax.io.torch_compat import from_torch_state_dict, to_torch_state_dict  # noqa: E402
from molvax.nn import vae  # noqa: E402
from molvax.train.loss import gaussian_kl, recon_bce, recon_ce  # noqa: E402

ATOL = 2e-4  # fp32 accumulation-order tolerance on 120-step recurrences
RTOL = 2e-4


def make_cfg(**kw) -> ModelConfig:
    base = dict(
        max_len=48,
        charset_size=DEFAULT_CHARSET.size,
        latent_dim=24,
        conv_kernels=(9, 9, 11),
        enc_hidden=32,
        gru_hidden=28,
        gru_layers=3,
    )
    base.update(kw)
    return ModelConfig(**base)


def twin_from_cfg(cfg: ModelConfig) -> MolecularVAETwin:
    return MolecularVAETwin(
        max_len=cfg.max_len,
        charset_size=cfg.charset_size,
        latent_dim=cfg.latent_dim,
        conv_channels=cfg.conv_channels,
        conv_kernels=cfg.conv_kernels,
        conv_orientation=cfg.conv_orientation,
        enc_hidden=cfg.enc_hidden,
        gru_hidden=cfg.gru_hidden,
        gru_layers=cfg.gru_layers,
        decoder_conditioning=cfg.decoder_conditioning,
        recon_loss=cfg.recon_loss,
        eps_scale=cfg.eps_scale,
        n_properties=cfg.n_properties,
        property_hidden=cfg.property_hidden,
    )


def paired_models(cfg: ModelConfig, seed=0):
    """(molvax params, torch twin) with identical weights (torch -> jax)."""
    torch.manual_seed(seed)
    twin = twin_from_cfg(cfg).eval()
    params = from_torch_state_dict(twin.state_dict(), cfg)
    return params, twin


def batch_codes(cfg, n=4, seed=0):
    smiles = synthetic_smiles(n, seed=seed, max_len=cfg.max_len - 2)
    return encode_smiles(smiles, DEFAULT_CHARSET, cfg.max_len)


@pytest.mark.parametrize("orientation", ["seq", "charset"])
def test_encoder_parity(orientation):
    cfg = make_cfg(conv_orientation=orientation)
    params, twin = paired_models(cfg)
    codes = batch_codes(cfg)
    mu_j, logvar_j = vae.encode(params, cfg, jnp.asarray(codes))
    x_t = torch.from_numpy(
        np.asarray(one_hot(jnp.asarray(codes), cfg.charset_size))
    )
    with torch.no_grad():
        mu_t, logvar_t = twin.encode(x_t)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.numpy(), atol=ATOL, rtol=RTOL
    )


@pytest.mark.parametrize("conditioning", ["teacher_forced", "repeat_z"])
def test_decoder_parity(conditioning):
    cfg = make_cfg(decoder_conditioning=conditioning)
    params, twin = paired_models(cfg)
    codes = batch_codes(cfg)
    rng = np.random.default_rng(0)
    z = rng.normal(size=(codes.shape[0], cfg.latent_dim)).astype(np.float32)

    teacher = jnp.asarray(codes) if conditioning == "teacher_forced" else None
    logits_j = vae.decode(params, cfg, jnp.asarray(z), teacher_codes=teacher)

    teacher_t = (
        torch.from_numpy(np.asarray(one_hot(jnp.asarray(codes), cfg.charset_size)))
        if conditioning == "teacher_forced"
        else None
    )
    with torch.no_grad():
        logits_t = twin.decode(torch.from_numpy(z), teacher_t)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=ATOL, rtol=RTOL
    )


@pytest.mark.parametrize("recon", ["ce", "bce"])
def test_loss_parity(recon):
    cfg = make_cfg(recon_loss=recon)
    params, twin = paired_models(cfg)
    codes = batch_codes(cfg)
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(codes.shape[0], cfg.max_len, cfg.charset_size)).astype(
        np.float32
    )
    mu = rng.normal(size=(codes.shape[0], cfg.latent_dim)).astype(np.float32)
    logvar = rng.normal(scale=0.3, size=mu.shape).astype(np.float32)

    if recon == "ce":
        recon_j = recon_ce(jnp.asarray(logits), jnp.asarray(codes.astype(np.int32)))
    else:
        recon_j = recon_bce(
            jnp.asarray(logits), jnp.asarray(codes.astype(np.int32)), cfg.charset_size
        )
    kl_j = gaussian_kl(jnp.asarray(mu), jnp.asarray(logvar))

    with torch.no_grad():
        _, recon_t, kl_t = vae_loss_twin(
            twin,
            torch.from_numpy(logits),
            torch.from_numpy(codes.astype(np.int64)),
            torch.from_numpy(mu),
            torch.from_numpy(logvar),
        )
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kl_j), kl_t.numpy(), atol=ATOL, rtol=RTOL)


def test_full_forward_parity_ref_faithful():
    """End-to-end (noise off) on the reference-faithful variant combo."""
    cfg = make_cfg(
        conv_orientation="charset",
        decoder_conditioning="repeat_z",
        recon_loss="bce",
        eps_scale=1e-2,
    )
    params, twin = paired_models(cfg)
    codes = batch_codes(cfg)
    x = one_hot(jnp.asarray(codes), cfg.charset_size)

    mu_j, logvar_j = vae.encode(params, cfg, jnp.asarray(codes))
    logits_j = vae.decode(params, cfg, mu_j)

    with torch.no_grad():
        logits_t, mu_t, logvar_t, _, _ = twin(
            torch.from_numpy(np.asarray(x)), noise=False
        )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=ATOL, rtol=RTOL
    )


def test_property_head_parity():
    cfg = make_cfg(n_properties=3)
    params, twin = paired_models(cfg)
    z = np.random.default_rng(2).normal(size=(5, cfg.latent_dim)).astype(np.float32)
    from molvax.nn.property_head import predict_properties

    p_j = predict_properties(params["property_head"], cfg, jnp.asarray(z))
    with torch.no_grad():
        p_t = twin.predict_properties(torch.from_numpy(z))
    np.testing.assert_allclose(np.asarray(p_j), p_t.numpy(), atol=ATOL, rtol=RTOL)


def test_state_dict_roundtrip():
    cfg = make_cfg(n_properties=2)
    params, twin = paired_models(cfg)
    sd_back = to_torch_state_dict(params)
    for k, v in twin.state_dict().items():
        np.testing.assert_allclose(
            sd_back[k], v.numpy(), atol=0, rtol=0, err_msg=f"mismatch at {k}"
        )


@pytest.mark.slow
def test_jax_to_torch_direction():
    """Init in JAX, export to torch, parity on encode."""
    cfg = make_cfg()
    params = vae.init_vae_params(jax.random.key(3), cfg)
    twin = twin_from_cfg(cfg).eval()
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in to_torch_state_dict(params).items()}
    twin.load_state_dict(sd)
    codes = batch_codes(cfg, seed=5)
    mu_j, _ = vae.encode(params, cfg, jnp.asarray(codes))
    with torch.no_grad():
        mu_t, _ = twin.encode(
            torch.from_numpy(np.asarray(one_hot(jnp.asarray(codes), cfg.charset_size)))
        )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=ATOL, rtol=RTOL)


def test_start_token_roundtrip():
    """learned_start models must survive molvax -> torch -> molvax without
    silently dropping the trained start vector (round-3 review finding)."""
    import dataclasses

    from molvax.io.torch_compat import from_torch_state_dict

    cfg = dataclasses.replace(make_cfg(), learned_start=True)
    params = vae.init_vae_params(jax.random.key(7), cfg)
    # give the start token a recognizable value
    params["decoder"]["start_token"] = jnp.arange(
        cfg.charset_size, dtype=jnp.float32
    )
    sd = to_torch_state_dict(params)
    assert "start_token" in sd
    back = from_torch_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(back["decoder"]["start_token"]),
        np.asarray(params["decoder"]["start_token"]),
    )


def test_decoder_parity_pallas_fp32_kernels(monkeypatch):
    """Round 5 (the honored dtype contract): the PRODUCTION Pallas decode
    path in strict-fp32 mode vs the torch twin, at the same fp32 tolerance
    as the XLA path. Before the fp32 kernel mode existed, kernel-path
    parity could only be gated at bf16 tolerance (3.9e-3); this pins the
    per-layer kernel graph itself to the reference at 2e-4."""
    import molvax.nn.decoder as dec_mod

    monkeypatch.setattr(dec_mod, "_pallas_available", lambda: True)
    cfg = make_cfg(
        use_pallas=True, compute_dtype="float32", gru_kernel="per_layer"
    )
    params, twin = paired_models(cfg)
    codes = batch_codes(cfg, n=16)  # pallas_batch_ok needs a multiple of 16
    rng = np.random.default_rng(0)
    z = rng.normal(size=(codes.shape[0], cfg.latent_dim)).astype(np.float32)

    logits_j = vae.decode(
        params, cfg, jnp.asarray(z), teacher_codes=jnp.asarray(codes)
    )
    teacher_t = torch.from_numpy(
        np.asarray(one_hot(jnp.asarray(codes), cfg.charset_size))
    )
    with torch.no_grad():
        logits_t = twin.decode(torch.from_numpy(z), teacher_t)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=ATOL, rtol=RTOL
    )
