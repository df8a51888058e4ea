"""Pallas TPU kernel: fused conv-encoder (codes -> mu, logvar in one pass).

Reference parity: the encoder stack of SURVEY.md 2.3 (3x Conv1d + dense 435 +
two heads). Mandated as a fused kernel by the driver (BASELINE.json:5).

TPU-native design: the kernel takes raw charset codes and builds the one-hot
INSIDE VMEM (iota-compare), so the (B, T, C) float one-hot never exists in
HBM. Layout is chosen for Mosaic's tiling model: the convolved axis is the
LEADING (sublane-mergeable) dim and channels stay in lanes -
  * each conv = K tap-matmuls: slice the leading axis, merge (W', B) sublane
    dims, one (W'*B, Cin) @ (Cin, Cout) MXU matmul per tap, accumulate;
  * the dense layer = one batched dot_general over the W' axis
    (einsum 'wbc,wce->wbe' then a sublane reduction) - no lane-merging
    reshapes anywhere (Mosaic rejects those).
ReLU/SELU and both head GEMMs fuse in; one grid step per 128-row batch block.

Backward: custom VJP that recomputes via the jnp reference encoder
(molvax.nn.encoder.encode) and takes its exact VJP - the encoder is ~1% of
model FLOPs (SURVEY.md 3.1), so the rematerialized XLA backward costs nothing
measurable while keeping gradient code single-sourced.

Tests: tests/kernels/test_conv_sampler_kernels.py (interpret mode vs
reference; compiled-path numerics in tests/integration on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig

Array = jax.Array

# Small channel counts pad to 128 lanes in VMEM (37->128, 9->128), so the
# batch block stays small to keep the lane-padded intermediates on-stack.
_B_BLK = 64


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _selu(x):
    """SELU via plain exp (Mosaic has no expm1 lowering). Same constants as
    jax.nn.selu."""
    alpha = 1.6732632423543772
    scale = 1.0507009873554805
    return scale * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def _conv_taps(x, w, b):
    """x: (W, B, Cin) axis-0 convolved; w: (K, Cin, Cout); b: (1, Cout)
    -> relu(conv) (W-K+1, B, Cout). Only sublane-merging reshapes."""
    W, Bb, Cin = x.shape
    K, _, Cout = w.shape
    Wp = W - K + 1
    acc = jnp.zeros((Wp * Bb, Cout), jnp.float32)
    for k in range(K):
        tap = x[k : k + Wp].reshape(Wp * Bb, Cin)
        acc += jnp.dot(tap, w[k], preferred_element_type=jnp.float32)
    # bf16 between stages: halves the lane-padded VMEM intermediates
    return jax.nn.relu(acc + b).reshape(Wp, Bb, Cout).astype(jnp.bfloat16)


def _make_kernel(cfg: ModelConfig):
    C = cfg.charset_size
    T = cfg.max_len
    seq_orient = cfg.conv_orientation == "seq"

    def kernel(codes_ref, *refs):
        n_conv = len(cfg.conv_channels)
        conv_ws = refs[0:n_conv]
        conv_bs = refs[n_conv : 2 * n_conv]
        w0_3d, b0, wmu, bmu, wlv, blv, mu_ref, lv_ref = refs[2 * n_conv :]

        if seq_orient:
            # one-hot (T, B, C): convolve along T (leading), charset in
            # lanes. codes arrive (B, T) (lane-dim rules forbid a (T, 64)
            # block); the transpose happens on the tiny int array in VMEM.
            codes = jnp.swapaxes(codes_ref[:], 0, 1)  # (T, B)
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, codes.shape[1], C), 2)
            x = (codes[:, :, None] == cols).astype(jnp.bfloat16)
        else:
            # compact-port quirk: convolve along the charset axis; one-hot
            # (C, B, T): positions stay in lanes.
            codes = codes_ref[:]  # (B, T)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (C, codes.shape[0], T), 0
            )
            x = (codes[None, :, :] == rows).astype(jnp.bfloat16)

        h = x
        for w_ref, b_ref in zip(conv_ws, conv_bs):
            h = _conv_taps(h, w_ref[:], b_ref[:])
        # dense over (W', Cout): einsum 'wbc,wce->be', accumulated tap-wise
        # so the (Wp, B, E) intermediate never materializes (VMEM budget).
        Wp, Bb, Cout = h.shape
        acc = jnp.zeros((Bb, b0.shape[-1]), jnp.float32)
        for w in range(Wp):
            acc += jnp.dot(h[w], w0_3d[w], preferred_element_type=jnp.float32)
        h2 = _selu(acc + b0[:])  # (B, E)
        mu_ref[:] = jnp.dot(h2, wmu[:], preferred_element_type=jnp.float32) + bmu[:]
        lv_ref[:] = jnp.dot(h2, wlv[:], preferred_element_type=jnp.float32) + blv[:]

    return kernel


def _fused_encode_fwd(params, cfg: ModelConfig, codes: Array) -> Tuple[Array, Array]:
    B, T = codes.shape
    b_blk = _B_BLK if B % _B_BLK == 0 else B
    L = cfg.latent_dim

    from ..nn.encoder import conv_spatial_len

    Wp = conv_spatial_len(cfg)
    Cout = cfg.conv_channels[-1]
    # linear_0 weight rows are NCH-ordered (c*Wp + w, SURVEY.md 2.3 flatten);
    # the kernel consumes them as (Wp, Cout, E) for the batched dot.
    E = cfg.enc_hidden
    w0_3d = (
        params["linear_0"]["w"]
        .reshape(Cout, Wp, E)
        .transpose(1, 0, 2)
        .astype(jnp.float32)
    )

    conv_ws = [
        jnp.transpose(c["w"], (2, 1, 0)).astype(jnp.bfloat16)
        for c in params["convs"]
    ]
    conv_bs = [c["b"].astype(jnp.float32)[None, :] for c in params["convs"]]

    codes_arg = codes.astype(jnp.int32)
    codes_spec = pl.BlockSpec((b_blk, T), lambda b: (b, 0), memory_space=pltpu.VMEM)

    args = (
        [codes_arg]
        + conv_ws
        + conv_bs
        + [
            w0_3d.astype(jnp.bfloat16),
            params["linear_0"]["b"].astype(jnp.float32)[None, :],
            params["linear_mu"]["w"].astype(jnp.float32),
            params["linear_mu"]["b"].astype(jnp.float32)[None, :],
            params["linear_logvar"]["w"].astype(jnp.float32),
            params["linear_logvar"]["b"].astype(jnp.float32)[None, :],
        ]
    )
    in_specs = [codes_spec] + [
        pl.BlockSpec(
            a.shape,
            functools.partial(lambda nd, b: tuple([0] * nd), a.ndim),
            memory_space=pltpu.VMEM,
        )
        for a in args[1:]
    ]
    mu, logvar = pl.pallas_call(
        _make_kernel(cfg),
        grid=(B // b_blk,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b_blk, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return mu, logvar


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_encode(params, cfg: ModelConfig, codes: Array) -> Tuple[Array, Array]:
    """codes (B, T) -> (mu, logvar), one fused kernel pass (one-hot never
    leaves VMEM). Gradient = exact VJP of the jnp reference encoder."""
    return _fused_encode_fwd(params, cfg, codes)


def _ref_encode(params, cfg: ModelConfig, codes):
    from ..data.featurize import one_hot
    from ..nn.encoder import encode

    return encode(params, cfg, one_hot(codes, cfg.charset_size))


def _fe_fwd(params, cfg, codes):
    return _fused_encode_fwd(params, cfg, codes), (params, codes)


def _fe_bwd(cfg, res, g):
    params, codes = res
    _, vjp = jax.vjp(lambda p: _ref_encode(p, cfg, codes), params)
    (dparams,) = vjp(g)
    return dparams, None


fused_encode.defvjp(_fe_fwd, _fe_bwd)
