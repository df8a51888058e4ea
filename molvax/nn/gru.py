"""Stacked GRU: torch-convention cell, `lax.scan` time sweep.

Reference parity: the reference decoder is ``nn.GRU(input, 501, 3,
batch_first=True)`` (SURVEY.md 2.5) - cuDNN/ATen gate order (r, z, n) and the
torch "n" formulation where the reset gate multiplies the *hidden* matmul
output: ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``. We reimplement that
cell exactly so the PyTorch parity twin matches to fp32 tolerance
(tests/parity), with weights stored JAX-native as (in, 3H)/(H, 3H) so the hot
matmuls are row-major ``x @ W`` on the MXU.

TPU-native design: time is a `lax.scan` (static T=120, compiler-friendly);
layers are a static Python loop inside the scan body so XLA sees one fused
step function. The Pallas fused variant lives in molvax/kernels/gru.py and is
numerics-checked against this implementation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


def init_gru_params(
    key: Array, input_size: int, hidden_size: int, num_layers: int
) -> List[Params]:
    """torch-default init: U(-1/sqrt(H), 1/sqrt(H)) for every tensor.

    Layout per layer: w_ih (in, 3H), w_hh (H, 3H), b_ih (3H,), b_hh (3H,),
    gate order r|z|n along the 3H axis (torch convention; converter in
    molvax/io/torch_compat.py transposes torch's (3H, in))."""
    layers = []
    k = 1.0 / jnp.sqrt(hidden_size)
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append(
            {
                "w_ih": jax.random.uniform(k1, (in_size, 3 * hidden_size), minval=-k, maxval=k),
                "w_hh": jax.random.uniform(k2, (hidden_size, 3 * hidden_size), minval=-k, maxval=k),
                "b_ih": jax.random.uniform(k3, (3 * hidden_size,), minval=-k, maxval=k),
                "b_hh": jax.random.uniform(k4, (3 * hidden_size,), minval=-k, maxval=k),
            }
        )
    return layers


def gru_cell(layer: Params, h: Array, x: Array, compute_dtype=jnp.float32) -> Array:
    """One GRU step for one layer. h: (B, H), x: (B, in) -> h': (B, H).

    Matmuls run in ``compute_dtype`` (bf16 under the mixed policy) with fp32
    accumulation; gate nonlinearities in fp32 (SURVEY.md section 7, bf16 policy).
    """
    H = h.shape[-1]
    cd = compute_dtype
    gi = (
        jnp.dot(x.astype(cd), layer["w_ih"].astype(cd), preferred_element_type=jnp.float32)
        + layer["b_ih"]
    )
    gh = (
        jnp.dot(h.astype(cd), layer["w_hh"].astype(cd), preferred_element_type=jnp.float32)
        + layer["b_hh"]
    )
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h.astype(n.dtype)


def gru_stack_step(
    layers: List[Params], hs: Array, x: Array, compute_dtype=jnp.float32
) -> Tuple[Array, Array]:
    """One time step through all layers. hs: (L, B, H) -> (hs', top output)."""
    new_hs = []
    inp = x
    for li, layer in enumerate(layers):
        h = gru_cell(layer, hs[li], inp, compute_dtype)
        new_hs.append(h)
        inp = h
    return jnp.stack(new_hs), inp


def gru_layer_recurrence(
    layer: Params, gi_seq: Array, h0: Array, compute_dtype=jnp.float32
) -> Tuple[Array, Array]:
    """Recurrent half of one GRU layer: gi_seq (T, B, 3H) precomputed input
    gates -> (h_seq (T, B, H), h_final (B, H)). Only h @ w_hh stays inside
    the scan. This is the function the Pallas kernel replaces 1:1
    (molvax/kernels/gru.py)."""
    H = h0.shape[-1]
    cd = compute_dtype
    w_hh = layer["w_hh"].astype(cd)
    b_hh = layer["b_hh"]

    def step(h, gi_t):
        gh = (
            jnp.dot(h.astype(cd), w_hh, preferred_element_type=jnp.float32)
            + b_hh
        )
        r = jax.nn.sigmoid(gi_t[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_t[..., H : 2 * H] + gh[..., H : 2 * H])
        n = jnp.tanh(gi_t[..., 2 * H :] + r * gh[..., 2 * H :])
        h_new = (1.0 - z) * n + z * h.astype(n.dtype)
        return h_new, h_new

    h_final, h_seq = jax.lax.scan(step, h0, gi_seq)
    return h_seq, h_final


def gru_forward(
    layers: List[Params],
    x_seq: Array,
    h0: Array | None = None,
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Full sweep. x_seq: (B, T, in) -> (outputs (B, T, H), h_final (L, B, H)).

    Equivalent of ``nn.GRU(batch_first=True)`` forward (SURVEY.md 3.2): time
    axis becomes the scan axis; all layers run fused inside one scan body so
    XLA keeps every intermediate in registers/VMEM. (The hoisted-input-GEMM
    variant - one (B*T, in) @ (in, 3H) GEMM per layer with a recurrence-only
    scan - was measured SLOWER under XLA on v5e: materializing (B, T, 3H)
    gate sequences in HBM costs more than it saves; the Pallas kernel in
    molvax/kernels/gru.py uses that structure profitably because the
    recurrence keeps everything VMEM-resident.)"""
    B = x_seq.shape[0]
    L = len(layers)
    H = layers[0]["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((L, B, H), dtype=jnp.float32)

    def step(hs, x_t):
        hs, out = gru_stack_step(layers, hs, x_t, compute_dtype)
        return hs, out

    x_tbf = jnp.swapaxes(x_seq, 0, 1)  # (T, B, in) scan-major
    h_final, out_tbf = jax.lax.scan(step, h0, x_tbf)
    return jnp.swapaxes(out_tbf, 0, 1), h_final
