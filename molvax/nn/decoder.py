"""GRU decoder: latent expansion -> stacked GRU -> per-step charset logits.

Reference parity (SURVEY.md 2.5, 3.2): ``selu(linear_3(z))`` expands the
latent, the sequence runs through a 3-layer GRU (hidden 501), and a shared
``Linear(H -> C)`` + softmax yields per-character distributions. Both decoder
conditionings of the lineage are supported (SURVEY.md note B):

  * 'teacher_forced' (spec, BASELINE.json:5): step t input is
    concat(z_emb, one-hot of the ground-truth character at t-1); step 0 gets
    an all-zero start vector. Generation feeds back sampled/argmax chars
    (molvax/latent/sample.py).
  * 'repeat_z' (compact-port): z_emb tiled across T, no feedback; decode is a
    single non-autoregressive pass.

TPU-native design: teacher forcing is *not* recurrent in the outputs, so the
whole GRU input sequence is precomputed as one array and the time sweep is a
`lax.scan` over a static T=120; the output projection is one (B*T, H) @ (H, C)
matmul instead of 120 small ones. Returns LOGITS; softmax lives in the loss
(CE mode never materializes probabilities - better numerics than the
reference's softmax+BCE).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..utils import matmul_dtype
from .encoder import init_linear, linear
from .gru import gru_forward, init_gru_params

Array = jax.Array
Params = Dict[str, Any]


def decoder_input_size(cfg: ModelConfig) -> int:
    if cfg.decoder_conditioning == "teacher_forced":
        return cfg.latent_dim + cfg.charset_size
    return cfg.latent_dim


def init_decoder_params(key: Array, cfg: ModelConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "linear_3": init_linear(k1, cfg.latent_dim, cfg.latent_dim),
        "gru": init_gru_params(
            k2, decoder_input_size(cfg), cfg.gru_hidden, cfg.gru_layers
        ),
        "linear_out": init_linear(k3, cfg.gru_hidden, cfg.charset_size),
    }
    if cfg.learned_start:
        # zero init = exactly the reference's zero start vector at step 0,
        # then trained jointly; generation uses the same vector.
        params["start_token"] = jnp.zeros((cfg.charset_size,), jnp.float32)
    return params


def latent_embed(params: Params, cfg: ModelConfig, z: Array) -> Array:
    """selu(linear_3(z)) - shared by training decode and generation."""
    cd = matmul_dtype(cfg)
    return jax.nn.selu(linear(params["linear_3"], z, cd))


def teacher_inputs(
    cfg: ModelConfig, z_emb: Array, x_onehot: Array, start: Optional[Array] = None
) -> Array:
    """(B, L) x (B, T, C) -> (B, T, L+C): z_emb tiled, teacher chars shifted
    right one step. Step 0 sees the zero start vector (reference behavior),
    or the learned ``start`` token when the model trains one."""
    B, T, C = x_onehot.shape
    if start is None:
        start_row = jnp.zeros((B, 1, C), x_onehot.dtype)
    else:
        start_row = jnp.broadcast_to(
            start.astype(x_onehot.dtype)[None, None, :], (B, 1, C)
        )
    shifted = jnp.concatenate([start_row, x_onehot[:, :-1, :]], axis=1)
    z_tiled = jnp.broadcast_to(z_emb[:, None, :], (B, T, z_emb.shape[-1]))
    return jnp.concatenate([z_tiled, shifted], axis=-1)


def decode(
    params: Params,
    cfg: ModelConfig,
    z: Array,
    teacher_onehot: Optional[Array] = None,
) -> Array:
    """z: (B, latent) -> logits (B, T, C).

    ``teacher_onehot`` is required in 'teacher_forced' mode (training /
    teacher-forced eval); 'repeat_z' mode ignores it."""
    cd = matmul_dtype(cfg)
    z_emb = latent_embed(params, cfg, z)
    B = z.shape[0]
    if cfg.decoder_conditioning == "teacher_forced":
        if teacher_onehot is None:
            raise ValueError(
                "teacher_forced decode needs teacher_onehot; use "
                "molvax.latent.sample.generate for free-running decoding"
            )
        x_seq = teacher_inputs(cfg, z_emb, teacher_onehot, params.get("start_token"))
    else:
        x_seq = jnp.broadcast_to(
            z_emb[:, None, :], (B, cfg.max_len, z_emb.shape[-1])
        )
    if cfg.use_pallas and _pallas_available():
        from ..kernels.gru import gru_forward_pallas

        outputs, _ = gru_forward_pallas(
            params["gru"], x_seq, compute_dtype=cd, kernel=cfg.gru_kernel
        )
    else:
        outputs, _ = gru_forward(params["gru"], x_seq, compute_dtype=cd)
    logits = linear(params["linear_out"], outputs, cd)  # (B, T, C)
    return logits


def _pallas_available() -> bool:
    from ..kernels import pallas_enabled

    return pallas_enabled()
