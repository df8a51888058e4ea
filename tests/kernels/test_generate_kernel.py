"""Fused generation kernel vs the lax.scan reference (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import ModelConfig
from molvax.data import DEFAULT_CHARSET
from molvax.kernels.generate import fused_generate, generation_kernel_supported
from molvax.latent.sample import generate
from molvax.nn import init_vae_params
from molvax.nn.decoder import latent_embed

CFG = ModelConfig(
    max_len=20, charset_size=DEFAULT_CHARSET.size, latent_dim=16,
    conv_kernels=(5, 5, 5), enc_hidden=16, gru_hidden=24, gru_layers=2,
)
PARAMS = init_vae_params(jax.random.key(0), CFG)


@pytest.mark.slow
def test_greedy_matches_scan_reference():
    """Interpret mode runs the kernel math in fp64-backed CPU ops - greedy
    codes must match the jnp scan exactly (fp32 vs bf16 only diverges on
    compiled TPU, where near-tie argmax flips are expected)."""
    z = jax.random.normal(jax.random.key(1), (8, CFG.latent_dim))
    c_ref, _ = generate(PARAMS, CFG, z, jax.random.key(2), greedy=True)
    z_emb = latent_embed(PARAMS["decoder"], CFG, z)
    c_k = fused_generate(PARAMS["decoder"], CFG, z_emb, jax.random.key(2), True, 1.0)
    agree = float(np.mean(np.asarray(c_ref) == np.asarray(c_k)))
    assert agree > 0.97, agree


@pytest.mark.slow
def test_codes_in_range_and_shape():
    z_emb = latent_embed(
        PARAMS["decoder"], CFG, jax.random.normal(jax.random.key(3), (4, CFG.latent_dim))
    )
    codes = fused_generate(PARAMS["decoder"], CFG, z_emb, jax.random.key(0), True, 1.0)
    assert codes.shape == (4, CFG.max_len)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < CFG.charset_size).all()


def test_supported_gating():
    assert not generation_kernel_supported(CFG, 128)  # CPU -> False
    big = dataclasses.replace(CFG, gru_hidden=1024, gru_layers=4)
    assert not generation_kernel_supported(big, 128)  # VMEM budget
    rz = dataclasses.replace(CFG, decoder_conditioning="repeat_z")
    assert not generation_kernel_supported(rz, 128)


def test_generate_routes_to_kernel_flag_off_by_default():
    """Default configs never take the kernel path (quality-conservative)."""
    assert CFG.use_pallas_generation is False
    z = jax.random.normal(jax.random.key(1), (4, CFG.latent_dim))
    codes, logits = generate(PARAMS, CFG, z, jax.random.key(2), greedy=True)
    assert logits is not None  # scan path materializes logits
