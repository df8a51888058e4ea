"""Measurement harness for GRU-recurrence kernel design decisions (round 2).

Isolates where the per-step time goes in the hot loop (VERDICT r1 weak 1 /
next 1): MXU serial matmul chain vs VPU gate math vs residual stores vs
per-kernel launch overhead. Run on TPU:

    python -m bench.gru_experiments

Variants (all (B=256, T=120, H=501-padded-512, L=3) unless noted):
  matmul_only : recurrence kernel with h = tanh-free passthrough of gh slice
                (pure serial MXU chain + carry update)
  gates_nostore: full gate math, but no rzn/ghn residual stores
  full        : the production kernel (gates + residual stores)
  fused3      : one kernel, all 3 layers, layer-sequential inside each
                K-step time block (gi of layers>0 computed in-kernel; only
                h_seq residuals stored)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, L = 256, 120, 501, 3
Hp = 512
Gp = 3 * Hp
B_BLK = 128
K = 8  # timesteps per grid block


def timeit(fn, *args, rounds=4, inner=20):
    """Drain-honest ms/call: the jitted wrapper reduces outputs to ONE scalar
    on device (fetching a full (T,B,Hp) array through the remote tunnel costs
    seconds and would swamp the kernel time)."""
    scalar_fn = jax.jit(
        lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a)))
    )
    out = scalar_fn(*args)
    float(np.asarray(out))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = scalar_fn(*args)
        float(np.asarray(out))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts[1:])) * 1e3  # ms


# -------------------------------------------------------------------------
# single-layer recurrence variants
# -------------------------------------------------------------------------

def _kernel_variant(gi_ref, w_ref, b_ref, h0_ref, hseq_ref, h_scr, *, mode):
    Kk = gi_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    for k in range(Kk):
        gh = (
            jnp.dot(h.astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )
        if mode == "matmul_only":
            h = gh[:, :Hp]
        else:
            gi = gi_ref[k].astype(jnp.float32)
            rz = jax.nn.sigmoid(gi[:, : 2 * Hp] + gh[:, : 2 * Hp])
            r, z = rz[:, :Hp], rz[:, Hp:]
            n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
            h = (1.0 - z) * n + z * h
        hseq_ref[k] = h.astype(jnp.bfloat16)
    h_scr[:] = h


def run_variant(mode):
    gi = jax.random.normal(jax.random.key(0), (T, B, Gp), jnp.bfloat16) * 0.1
    w = jax.random.normal(jax.random.key(1), (Hp, Gp), jnp.bfloat16) * 0.02
    b = jnp.zeros((1, Gp), jnp.float32)
    h0 = jnp.zeros((B, Hp), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_kernel_variant, mode=mode),
        grid=(B // B_BLK, T // K),
        in_specs=[
            pl.BlockSpec((K, B_BLK, Gp), lambda bb, t: (t, bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Gp), lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, Hp), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B_BLK, Hp), lambda bb, t: (t, bb, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B_BLK, Hp), jnp.float32)],
    )
    return timeit(jax.jit(lambda *a: call(*a)), gi, w, b, h0)


# -------------------------------------------------------------------------
# fused 3-layer kernel: layer-sequential inside each K-step block
# -------------------------------------------------------------------------

def _fused3_kernel(gi0_ref, wih_ref, bih_ref, whh_ref, bhh_ref, h0_ref,
                   hseq_ref, htop_ref, h_scr, x_scr):
    """gi0: precomputed layer-0 input gates (K, B_BLK, Gp).
    wih: (L-1, Hp, Gp) input weights of layers 1..L-1.
    whh: (L, Hp, Gp); h0/(h carry scratch): (L, B_BLK, Hp) fp32.
    hseq: (L, K, B_BLK, Hp) bf16 residuals; htop duplicates layer L-1 stream
    (kept separate so the caller reads a contiguous (T, B, Hp))."""
    Kk = gi0_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    for li in range(L):
        h = h_scr[li]
        for k in range(Kk):
            if li == 0:
                gi = gi0_ref[k].astype(jnp.float32)
            else:
                gi = (
                    jnp.dot(
                        x_scr[li - 1, k],
                        wih_ref[li - 1],
                        preferred_element_type=jnp.float32,
                    )
                    + bih_ref[li - 1]
                )
            gh = (
                jnp.dot(h.astype(jnp.bfloat16), whh_ref[li], preferred_element_type=jnp.float32)
                + bhh_ref[li]
            )
            rz = jax.nn.sigmoid(gi[:, : 2 * Hp] + gh[:, : 2 * Hp])
            r, z = rz[:, :Hp], rz[:, Hp:]
            n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
            h = (1.0 - z) * n + z * h
            hb = h.astype(jnp.bfloat16)
            hseq_ref[li, k] = hb
            if li < L - 1:
                x_scr[li, k] = hb
            else:
                htop_ref[k] = hb
        h_scr[li] = h


def run_fused3():
    gi0 = jax.random.normal(jax.random.key(0), (T, B, Gp), jnp.bfloat16) * 0.1
    wih = jax.random.normal(jax.random.key(1), (L - 1, Hp, Gp), jnp.bfloat16) * 0.02
    bih = jnp.zeros((L - 1, 1, Gp), jnp.float32)
    whh = jax.random.normal(jax.random.key(2), (L, Hp, Gp), jnp.bfloat16) * 0.02
    bhh = jnp.zeros((L, 1, Gp), jnp.float32)
    h0 = jnp.zeros((L, B, Hp), jnp.float32)
    call = pl.pallas_call(
        _fused3_kernel,
        grid=(B // B_BLK, T // K),
        in_specs=[
            pl.BlockSpec((K, B_BLK, Gp), lambda bb, t: (t, bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, Hp, Gp), lambda bb, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 1, Gp), lambda bb, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Hp, Gp), lambda bb, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Gp), lambda bb, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, B_BLK, Hp), lambda bb, t: (0, bb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (L, K, B_BLK, Hp), lambda bb, t: (0, t, bb, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((K, B_BLK, Hp), lambda bb, t: (t, bb, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, T, B, Hp), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, B_BLK, Hp), jnp.float32),
            pltpu.VMEM((L - 1, K, B_BLK, Hp), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return timeit(jax.jit(lambda *a: call(*a)), gi0, wih, bih, whh, bhh, h0)


def main():
    from molvax.utils import enable_persistent_cache

    # batch override for the per-batch roofline (VERDICT r3 next 5:
    # B=64 has a single sub-128-row block — no independent chains to
    # pipeline — and needs its own serial-chain floor measurement)
    global B, B_BLK
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if args:
        B = int(args[0])
        B_BLK = min(128, B)

    enable_persistent_cache()
    assert jax.default_backend() == "tpu", "experiments need the TPU"
    print(f"config: B={B} T={T} Hp={Hp} L={L} K={K} b_blk={B_BLK}", file=sys.stderr)

    res = {}
    for mode in ("matmul_only", "gates_nostore"):
        res[mode] = run_variant(mode)
        print(f"{mode:14s}: {res[mode]:.3f} ms/layer-sweep "
              f"({res[mode]*1e3/T:.1f} us/step)", file=sys.stderr)

    # production path for comparison (includes rzn/ghn stores)
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.nn.gru import init_gru_params

    layers = init_gru_params(jax.random.key(0), 329, H, L)
    x = jax.random.normal(jax.random.key(1), (B, T, 329))
    res["full_3layer"] = timeit(jax.jit(lambda l, x: gru_forward_pallas(l, x)[0]), layers, x)
    print(f"full_3layer   : {res['full_3layer']:.3f} ms (prod fwd, 3 layers + "
          f"hoisted gi GEMMs)", file=sys.stderr)

    res["fused3"] = run_fused3()
    print(f"fused3        : {res['fused3']:.3f} ms (one kernel, 3 layers)",
          file=sys.stderr)
    print(res)


if __name__ == "__main__":
    main()
