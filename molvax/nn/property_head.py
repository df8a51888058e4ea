"""Property regression head: MLP on z for logP/QED/SAS.

Reference parity: present in the original ChemVAE (joint property prediction
from the latent, arXiv:1610.02415) and mandated by the driver's preset 3
(BASELINE.json:9, SURVEY.md 2.11): a small MLP on z trained jointly with the
ELBO (multi-task loss, weight in TrainConfig.property_loss_weight).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .encoder import init_linear, linear

Array = jax.Array
Params = Dict[str, Any]


def init_property_head_params(key: Array, cfg: ModelConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "hidden": init_linear(k1, cfg.latent_dim, cfg.property_hidden),
        "out": init_linear(k2, cfg.property_hidden, cfg.n_properties),
    }


def predict_properties(params: Params, cfg: ModelConfig, z: Array) -> Array:
    """z: (B, latent) -> (B, n_properties), in NORMALIZED units when the
    config carries target stats (training standardizes targets; see
    normalize_targets). fp32 (tiny; precision > speed)."""
    h = jnp.tanh(linear(params["hidden"], z))
    return linear(params["out"], h)


def normalize_targets(cfg: ModelConfig, targets: Array) -> Array:
    """Raw property targets -> standardized training targets.

    Identity when the config has no stats (parity-twin path keeps raw units).
    """
    if cfg.property_mean is None or cfg.property_std is None:
        return targets
    mean = jnp.asarray(cfg.property_mean, jnp.float32)
    std = jnp.asarray(cfg.property_std, jnp.float32)
    return (targets.astype(jnp.float32) - mean) / std


def denormalize_properties(cfg: ModelConfig, pred: Array) -> Array:
    """Head outputs -> raw property units (logP/QED/SAS scales), using the
    stats recorded in the training config. Identity without stats."""
    if cfg.property_mean is None or cfg.property_std is None:
        return pred
    mean = jnp.asarray(cfg.property_mean, jnp.float32)
    std = jnp.asarray(cfg.property_std, jnp.float32)
    return pred * std + mean
