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
    """z: (B, latent) -> (B, n_properties). fp32 (tiny; precision > speed)."""
    h = jnp.tanh(linear(params["hidden"], z))
    return linear(params["out"], h)
