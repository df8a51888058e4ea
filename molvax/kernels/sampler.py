"""Pallas TPU kernel: fused reparameterization sampler + KL.

Reference parity: SURVEY.md 2.4/2.6 - z = mu + eps_scale*exp(0.5*logvar)*eps
with eps ~ N(0, I), and the per-sample Gaussian KL. Mandated as a fused
kernel by the driver (BASELINE.json:5).

TPU-native design: one VMEM pass produces both z and the per-sample KL
reduction; eps comes from the per-core hardware PRNG (pltpu.prng_random_bits
-> Box-Muller), so no host RNG state or separate normal() kernel launch. The
stream is seeded from a scalar derived from the caller's JAX key: sampling is
deterministic per (key, shape) but is a DIFFERENT stream than
jax.random.normal - the jnp path remains the default where bit-exact
PRNG reproducibility across backends matters (tests, parity runs).

Gradient: z is mu + sigma*eps with eps independent of parameters, so the
custom VJP is closed-form (dmu = g, dlogvar = 0.5*g*sigma*eps) - no
recomputation, no stored normals beyond (z - mu).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sampler_kernel(seed_ref, mu_ref, logvar_ref, z_ref, kl_ref, *, eps_scale):
    pltpu.prng_seed(seed_ref[0])
    mu = mu_ref[:]
    logvar = logvar_ref[:]

    # Box-Muller from two 24-bit draws -> standard normal. The raw bits must
    # be treated as UNSIGNED: bitcast + logical shift (an int32 astype would
    # produce negative uniforms -> log(<0) = NaN), and 24 bits convert to
    # f32 exactly.
    shape = mu.shape
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    scale24 = 1.0 / (1 << 24)
    # top 24 bits as nonneg int32 (Mosaic can cast int32->f32, not uint32)
    i1 = pltpu.bitcast(jax.lax.shift_right_logical(bits1, jnp.uint32(8)), jnp.int32)
    i2 = pltpu.bitcast(jax.lax.shift_right_logical(bits2, jnp.uint32(8)), jnp.int32)
    # u1 in (0, 1]: never 0, so log(u1) is finite
    u1 = (i1.astype(jnp.float32) + 1.0) * scale24
    u2 = i2.astype(jnp.float32) * scale24
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

    sigma = jnp.exp(0.5 * logvar)
    z_ref[:] = mu + eps_scale * sigma * eps
    kl = -0.5 * jnp.sum(
        1.0 + logvar - mu * mu - jnp.exp(logvar), axis=-1, keepdims=True
    )
    kl_ref[:] = kl


def _sample_fwd_impl(seed: Array, mu: Array, logvar: Array, eps_scale: float):
    B, L = mu.shape
    kernel = functools.partial(_sampler_kernel, eps_scale=eps_scale)
    z, kl = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seed, mu.astype(jnp.float32), logvar.astype(jnp.float32))
    return z, kl[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_sample_kl(
    key: Array, mu: Array, logvar: Array, eps_scale: float = 1.0
) -> Tuple[Array, Array]:
    """(key, mu, logvar) -> (z, per-sample KL), one fused kernel.

    Deterministic in (key, shapes); different stream than jax.random.normal.
    Off-TPU (tests, CPU meshes) the same contract is served by a jnp
    fallback - interpret mode cannot emulate the hardware PRNG
    (prng_random_bits returns zeros under InterpretParams), so the kernel
    itself is validated on hardware."""
    if _interpret():
        eps = jax.random.normal(key, mu.shape, dtype=jnp.float32)
        z = mu + eps_scale * jnp.exp(0.5 * logvar) * eps
        kl = -0.5 * jnp.sum(
            1.0 + logvar - mu * mu - jnp.exp(logvar), axis=-1
        )
        return z, kl
    seed = _seed_from_key(key)
    return _sample_fwd_impl(seed, mu, logvar, eps_scale)


def _seed_from_key(key: Array) -> Array:
    data = jax.random.key_data(key).astype(jnp.uint32)
    return jnp.bitwise_xor(data[..., 0], data[..., 1]).astype(jnp.int32).reshape(1)


def _fs_fwd(key, mu, logvar, eps_scale):
    z, kl = fused_sample_kl(key, mu, logvar, eps_scale)
    return (z, kl), (z, mu, logvar)


def _fs_bwd(eps_scale, res, cotangents):
    gz, gkl = cotangents
    z, mu, logvar = res
    # z = mu + s*eps_noise, s = exp(logvar/2): dz/dmu = 1,
    # dz/dlogvar = 0.5*(z - mu). KL terms: dKL/dmu = mu, dKL/dlogvar =
    # -0.5*(1 - exp(logvar)).
    dmu = gz + gkl[:, None] * mu
    dlogvar = gz * 0.5 * (z - mu) + gkl[:, None] * (-0.5) * (
        1.0 - jnp.exp(logvar)
    )
    return None, dmu, dlogvar


fused_sample_kl.defvjp(_fs_fwd, _fs_bwd)
