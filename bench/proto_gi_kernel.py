"""Prototype: per-layer GRU recurrence with IN-KERNEL input-gate GEMM.

Hypothesis (from the fused-stack kernel's profile): the production per-layer
kernel is latency-bound on its lone serial h @ W_hh dot (~12.9 us/step);
giving Mosaic an independent, prefetchable x @ W_ih dot per cell keeps the
MXU warm and should roughly halve the serial cost (the fused kernel's
layer-sequential sweep measured ~6.1 us/cell with exactly this structure).

Forward-only measurement gate before building the custom VJP:

    python -m bench.proto_gi_kernel
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from molvax.kernels.gru import (
    _interpret,
    _pad_gates,
    _pad_tail,
    _pick_b_blk,
    _round_up,
    _time_block,
)


def _fwd_kernel_gi(
    x_ref, wih_ref, bih_ref, whh_ref, bhh_ref, h0_ref, hseq_ref, rzn_ref, ghn_ref, h_scr
):
    K = x_ref.shape[0]
    b_blk, Hp = h0_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    for k in range(K):
        # independent of the serial chain -> prefetches arbitrarily deep
        gi = (
            jnp.dot(x_ref[k], wih_ref[:], preferred_element_type=jnp.float32)
            + bih_ref[:]
        )
        gh = (
            jnp.dot(
                h.astype(jnp.bfloat16), whh_ref[:], preferred_element_type=jnp.float32
            )
            + bhh_ref[:]
        )
        r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
        z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
        ghn = gh[:, 2 * Hp :]
        n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)
        h = (1.0 - z) * n + z * h
        hseq_ref[k] = h.astype(jnp.bfloat16)
        rzn_ref[k] = jnp.concatenate([r, z, n], axis=-1).astype(jnp.bfloat16)
        ghn_ref[k] = ghn.astype(jnp.bfloat16)
    h_scr[:] = h


def fwd_gi(x_seq, w_ih, b_ih, w_hh, b_hh, h0):
    """x_seq (T, B, I) -> h_seq (T, B, Hp) bf16 (padded)."""
    T, B, I = x_seq.shape
    H = w_hh.shape[0]
    Hp = _round_up(H, 128)
    Ip = _round_up(I, 128)
    Gp = 3 * Hp
    b_blk = _pick_b_blk(B) or B
    K = _time_block(T, Hp, 16 * Hp, b_blk)
    nB, nT = B // b_blk, T // K

    x_p = _pad_tail(x_seq, 2, Ip).astype(jnp.bfloat16)
    wih_p = _pad_gates(_pad_tail(w_ih, 0, Ip), H, Hp).astype(jnp.bfloat16)
    bih_p = _pad_gates(b_ih, H, Hp).astype(jnp.float32)[None, :]
    whh_p = _pad_gates(_pad_tail(w_hh, 0, Hp), H, Hp).astype(jnp.bfloat16)
    bhh_p = _pad_gates(b_hh, H, Hp).astype(jnp.float32)[None, :]
    h0_p = _pad_tail(h0.astype(jnp.float32), 1, Hp)

    const = lambda b, t: (0, 0)
    hseq, rzn, ghn = pl.pallas_call(
        _fwd_kernel_gi,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, b_blk, Ip), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, Hp), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, b_blk, Hp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Gp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, Gp), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_p, wih_p, bih_p, whh_p, bhh_p, h0_p)
    return hseq


def timeit(fn, *args, rounds=4, inner=10):
    out = jax.jit(
        lambda *a: jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)
        )
    )
    float(np.asarray(out(*args)))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = out(*args)
        float(np.asarray(r))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts[1:]) * 1e3)


def main():
    from molvax.kernels.gru import gru_layer_scan
    from molvax.nn.gru import init_gru_params
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    B, T, I, H, L = 256, 120, 330, 501, 3
    layers = init_gru_params(jax.random.key(0), I, H, L)

    # one layer in isolation (layer 0, I=330) and a 3-layer sweep
    x0 = jax.random.normal(jax.random.key(1), (T, B, I))
    h0 = jnp.zeros((B, H), jnp.float32)
    l0 = layers[0]

    def current_one(x, l):
        gi = (
            jnp.einsum("tbi,ig->tbg", x.astype(jnp.bfloat16), l["w_ih"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
            + l["b_ih"]
        )
        return gru_layer_scan(gi, l["w_hh"], l["b_hh"], h0)

    def proto_one(x, l):
        return fwd_gi(x, l["w_ih"], l["b_ih"], l["w_hh"], l["b_hh"], h0)

    cur = timeit(current_one, x0, l0)
    pro = timeit(proto_one, x0, l0)
    print(f"one layer fwd: current {cur:7.3f} ms   proto {pro:7.3f} ms", flush=True)

    def current_stack(x, layers):
        out = x
        for l in layers:
            out = current_one(out, l)[..., :H].astype(jnp.float32)
        return out

    def proto_stack(x, layers):
        out = x
        for l in layers:
            out = proto_one(out, l)[..., :H].astype(jnp.float32)
        return out

    cur3 = timeit(current_stack, x0, layers)
    pro3 = timeit(proto_stack, x0, layers)
    print(f"3-layer fwd : current {cur3:7.3f} ms   proto {pro3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
