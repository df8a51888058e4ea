"""Conv1d encoder stack -> (mu, logvar) heads.

Reference parity (SURVEY.md 2.3, 3.2): three Conv1d layers with out-channels
(9, 9, 10) and kernels (9, 9, 11), ReLU after each; flatten; Linear->435 with
SELU; two heads Linear(435->292) for mu and logvar. Both conv orientations of
the reference lineage are supported (SURVEY.md note A):

  * 'seq'     - paper-faithful: convolve along the 120 sequence positions,
                charset as input channels. Flattened width 10*94=940 for T=120.
  * 'charset' - compact-port quirk: ``Conv1d(in_channels=120, ...)`` convolves
                along the charset axis. Flattened width 10*(C-26) (70 at C=33).

TPU-native design: convs lower through `lax.conv_general_dilated` with the
torch OIH kernel layout (zero-cost weight conversion for the parity twin);
the whole encoder is a handful of tiny matmuls that XLA fuses behind the
one-hot, so the host only ships uint8 codes. The fused Pallas variant lives
in molvax/kernels/conv_enc.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..utils import matmul_dtype

Array = jax.Array
Params = Dict[str, Any]


def _uniform(key, shape, fan_in):
    k = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-k, maxval=k)


def init_linear(key, in_dim: int, out_dim: int) -> Params:
    """torch nn.Linear default init; stored as (in, out) for x @ W."""
    k1, k2 = jax.random.split(key)
    return {
        "w": _uniform(k1, (in_dim, out_dim), in_dim),
        "b": _uniform(k2, (out_dim,), in_dim),
    }


def linear(p: Params, x: Array, compute_dtype=jnp.float32) -> Array:
    return (
        jnp.dot(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + p["b"]
    )


def conv_input_channels(cfg: ModelConfig) -> int:
    return cfg.charset_size if cfg.conv_orientation == "seq" else cfg.max_len


def conv_spatial_len(cfg: ModelConfig) -> int:
    """Spatial length after the VALID conv stack."""
    w = cfg.max_len if cfg.conv_orientation == "seq" else cfg.charset_size
    for k in cfg.conv_kernels:
        w = w - k + 1
    if w <= 0:
        raise ValueError(
            f"conv stack consumes the whole axis (len {w}); check "
            f"conv_orientation={cfg.conv_orientation!r} vs charset_size/max_len"
        )
    return w


def flat_conv_dim(cfg: ModelConfig) -> int:
    return cfg.conv_channels[-1] * conv_spatial_len(cfg)


def init_encoder_params(key: Array, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, len(cfg.conv_channels) + 3)
    convs = []
    in_ch = conv_input_channels(cfg)
    for i, (out_ch, ksize) in enumerate(zip(cfg.conv_channels, cfg.conv_kernels)):
        kk, kb = jax.random.split(keys[i])
        fan_in = in_ch * ksize
        convs.append(
            {
                # torch OIH layout: (out_ch, in_ch, k)
                "w": _uniform(kk, (out_ch, in_ch, ksize), fan_in),
                "b": _uniform(kb, (out_ch,), fan_in),
            }
        )
        in_ch = out_ch
    return {
        "convs": convs,
        "linear_0": init_linear(keys[-3], flat_conv_dim(cfg), cfg.enc_hidden),
        "linear_mu": init_linear(keys[-2], cfg.enc_hidden, cfg.latent_dim),
        "linear_logvar": init_linear(keys[-1], cfg.enc_hidden, cfg.latent_dim),
    }


def conv1d(p: Params, x_nch: Array, compute_dtype=jnp.float32) -> Array:
    """VALID 1-D conv, torch layout. x: (B, C_in, W) -> (B, C_out, W').

    Expressed in im2col/GEMM form (static unfold + einsum) instead of
    lax.conv_general_dilated: XLA's TPU lowering of these tiny-channel
    (9/9/10) convs — and above all of their transposed-conv VJPs — cost
    ~0.26 ms apiece for ~10 MFLOP, about 2 ms of an 8 ms train step
    (profiled round 2, bench/profile_step.py). The GEMM form runs and
    differentiates as matmuls; same math to fp32 reassociation."""
    O, I, K = p["w"].shape
    W = x_nch.shape[-1]
    Wout = W - K + 1
    x = x_nch.astype(compute_dtype)
    # patches[b, t, (k, i)] = x[b, i, t + k]; contraction kept on the minor
    # dim with untransposed output so the dot lowers to a plain GEMM on
    # every backend (XLA:CPU's DotThunk rejects bf16 dots in the transposed
    # "bpt,po->bot" form; the surrounding relayouts fuse for free)
    patches = jnp.stack([x[:, :, k : k + Wout] for k in range(K)], axis=1)
    patches = patches.transpose(0, 3, 1, 2).reshape(x.shape[0], Wout, K * I)
    wmat = p["w"].astype(compute_dtype).transpose(2, 1, 0).reshape(K * I, O)
    y = jnp.einsum(
        "btp,po->bto", patches, wmat, preferred_element_type=jnp.float32
    )
    return jnp.swapaxes(y, 1, 2).astype(jnp.float32) + p["b"][None, :, None]


def encode(
    params: Params, cfg: ModelConfig, x_onehot: Array
) -> Tuple[Array, Array]:
    """x_onehot: (B, T, C) -> (mu, logvar), each (B, latent_dim). fp32 heads
    regardless of compute dtype (bf16 policy, SURVEY.md section 7)."""
    cd = matmul_dtype(cfg)
    if cfg.conv_orientation == "seq":
        h = jnp.swapaxes(x_onehot, 1, 2)  # (B, C, T): channels=charset
    else:
        h = x_onehot  # (B, T, C): channels=positions (compact-port quirk)
    for p in params["convs"]:
        h = jax.nn.relu(conv1d(p, h, cd))
    h = h.reshape(h.shape[0], -1)
    h = jax.nn.selu(linear(params["linear_0"], h, cd))
    mu = linear(params["linear_mu"], h)
    logvar = linear(params["linear_logvar"], h)
    return mu, logvar
