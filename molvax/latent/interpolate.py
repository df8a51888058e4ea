"""Latent interpolation between molecules (lerp / slerp).

Reference parity (SURVEY.md 2.10, 3.4, BASELINE.json:11): encode two SMILES,
walk the latent segment between their means, decode each waypoint. Slerp
(spherical) is the appropriate path under a Gaussian prior - high-dim
Gaussians concentrate on a shell, so linear midpoints fall off-manifold;
lerp is kept for reference-style behavior.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.charset import Charset, DEFAULT_CHARSET
from ..data.featurize import decode_codes, encode_smiles
from ..nn.vae import encode as vae_encode
from .sample import generate

Array = jax.Array


def lerp(z0: Array, z1: Array, t: Array) -> Array:
    return z0 * (1.0 - t) + z1 * t


def slerp(z0: Array, z1: Array, t: Array, eps: float = 1e-7) -> Array:
    """Spherical interpolation on the shell through z0, z1."""
    n0 = jnp.linalg.norm(z0, axis=-1, keepdims=True)
    n1 = jnp.linalg.norm(z1, axis=-1, keepdims=True)
    u0, u1 = z0 / (n0 + eps), z1 / (n1 + eps)
    omega = jnp.arccos(jnp.clip(jnp.sum(u0 * u1, axis=-1, keepdims=True), -1 + eps, 1 - eps))
    so = jnp.sin(omega)
    w0 = jnp.sin((1.0 - t) * omega) / (so + eps)
    w1 = jnp.sin(t * omega) / (so + eps)
    # interpolate norm linearly alongside direction
    norm = n0 * (1.0 - t) + n1 * t
    return (w0 * u0 + w1 * u1) * norm


def interpolate(
    params,
    cfg: ModelConfig,
    smiles_a: str,
    smiles_b: str,
    steps: int = 10,
    key: Optional[Array] = None,
    charset: Charset = DEFAULT_CHARSET,
    spherical: bool = True,
    constrained: bool = False,
) -> List[str]:
    """Decode `steps` waypoints (inclusive of the endpoints' means).

    ``constrained=True`` decodes each waypoint under the valence automaton
    (`latent/constrain.py`), so every point on the path is a chemically
    valid molecule."""
    codes = jnp.asarray(encode_smiles([smiles_a, smiles_b], charset, cfg.max_len))
    mu, _ = vae_encode(params, cfg, codes)
    t = jnp.linspace(0.0, 1.0, steps)[:, None]  # (steps, 1)
    fn = slerp if spherical else lerp
    zs = fn(mu[0][None, :], mu[1][None, :], t)  # (steps, L)
    if key is None:
        key = jax.random.key(0)
    out_codes, _ = generate(
        params, cfg, zs, key, greedy=True,
        constrained=constrained, charset=charset,
    )
    return decode_codes(out_codes, charset)
