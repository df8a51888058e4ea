"""Micro-probe: in-Mosaic cost of the constrained-decoding automaton loop.

VERDICT r3 weak 1 / next 1: the obvious fused design — stepping the
valence automaton inside `kernels/generate.py`'s VMEM-resident decode
loop — was never built or refuted. Before wiring it in, this probe
measures the ONLY unknown: what does `select_advance` (mask + masked
argmax + state transition, the shared Mosaic-safe step body) cost per
step when run as a fori_loop INSIDE one Mosaic program, with the state
held in registers/VMEM and zero per-step kernel-launch or HBM state
traffic?

Three timings at the production shape (B=256, T=120):
  * xla_scan_us    — lax.scan of select_advance under jit (the known-good
                     XLA path; round-3 measured ~6 us/step marginal).
  * mosaic_loop_us — one pallas_call whose body fori_loops select_advance
                     T times (the exact inner loop the fused generation
                     kernel would embed; batch-blocked like the kernel).
  * budget_us      — per-step budget for >=120k SMILES/s constrained
                     decode given the measured fused unconstrained kernel.

If mosaic_loop_us/step >> budget, the fused design is refuted by
measurement and PERFORMANCE.md gets the roofline argument; if it fits,
wire the loop into kernels/generate.py.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from molvax.data.charset import DEFAULT_CHARSET
from molvax.kernels.automaton import (
    _batch_block,
    _tables_from,
    pack_state,
    pack_tables,
    select_advance,
    unpack_state,
)
from molvax.kernels.tpu_info import vmem_limit as _vmem_limit
from molvax.latent.constrain import build_tables, init_state


def _loop_kernel(
    itab_ref,
    val_ref, par_ref, stack_ref, rpart_ref, rhint_ref, rres_ref,
    ppa_ref, ppb_ref, sc_ref, scores_ref,
    ocodes_ref,
    *, n: int, T: int,
):
    tb = _tables_from(itab_ref[:], n)
    packed0 = (
        val_ref[:], par_ref[:], stack_ref[:], rpart_ref[:], rhint_ref[:],
        rres_ref[:], ppa_ref[:], ppb_ref[:], sc_ref[:],
    )
    scores = scores_ref[:]

    def step(t, packed):
        st, code = select_advance(
            tb, unpack_state(packed), scores, T - 1 - t
        )
        ocodes_ref[t, :] = code
        return pack_state(st)

    jax.lax.fori_loop(0, T, step, packed0)


@functools.partial(jax.jit, static_argnames=("n", "T", "b_blk"))
def mosaic_loop(itab, packed, scores, n: int, T: int, b_blk: int):
    B, C = scores.shape
    grid = (B // b_blk,)

    def bspec(x):
        return pl.BlockSpec(
            (b_blk,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_loop_kernel, n=n, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(itab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            *[bspec(x) for x in packed],
            bspec(scores),
        ],
        out_specs=pl.BlockSpec(
            (T, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=jax.default_backend() != "tpu",
    )(itab, *packed, scores)


def make_xla_scan(tb, T: int):
    # tb (Tables, not a pytree) is closed over as jit constants — same
    # structure the generation scan uses (sample.py builds tb statically)
    @jax.jit
    def run(st0, scores):
        def step(st, t):
            st, code = select_advance(tb, st, scores, T - 1 - t)
            return st, code

        _, codes = jax.lax.scan(step, st0, jnp.arange(T))
        return codes

    return run


def _time(fn, rounds=5, calls=24):
    """bench.py step_timer methodology: `calls` dispatches per timed round,
    ONE host fetch at the end to drain the chain — amortizes the axon
    tunnel's per-fetch round-trip, which otherwise dominates a single-call
    timing (~30 ms RTT vs sub-ms device work)."""
    fn()  # compile
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn()
        int(np.asarray(out)[0, 0])  # drain
        ts.append((time.perf_counter() - t0) / calls)
    return float(np.median(ts[1:]))


def _floor_kernel(x_ref, o_ref, *, T: int, k_ops: int, chains: int):
    """Per step: `k_ops` int32 VPU ops on x's shape, split across
    `chains` independent dependency chains (so the VPU can pipeline).
    Measures the native-op floor for a hypothetical automaton rewrite
    whose per-step work is `k_ops` ops of this shape."""
    xs = [x_ref[:] + i for i in range(chains)]

    def step(t, xs):
        ys = list(xs)
        for i in range(k_ops):
            c = i % chains
            ys[c] = jnp.where(ys[c] > t, ys[c] - 1, ys[c] + 1)
        return tuple(ys)

    out = jax.lax.fori_loop(0, T, step, tuple(xs))
    o_ref[:] = sum(out)


@functools.partial(jax.jit, static_argnames=("T", "k_ops", "chains"))
def floor_loop(x, T: int, k_ops: int, chains: int = 4):
    return pl.pallas_call(
        functools.partial(_floor_kernel, T=T, k_ops=k_ops, chains=chains),
        in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=jax.default_backend() != "tpu",
    )(x)


def floor_probe(T: int = 120):
    """ns per native (sublane, lane)-shaped int32 VPU op inside a Mosaic
    fori_loop, for the two layouts an automaton rewrite could use:
    batch-in-sublanes (128, 16) and batch-in-lanes (16, 128). The where(
    compare)+add pair counts as 2 logical ops; cost per logical op =
    step_us / k_ops. Differencing two k_ops settings cancels loop
    overhead."""
    for shape in ((128, 16), (16, 128)):
        x = jnp.ones(shape, jnp.int32)
        lo, hi = 64, 256
        t_lo = _time(lambda: floor_loop(x, T, lo))
        t_hi = _time(lambda: floor_loop(x, T, hi))
        ns = (t_hi - t_lo) / T / (hi - lo) * 1e9
        print(
            f"floor {shape}: {ns:6.2f} ns/op "
            f"(k={lo}: {t_lo/T*1e6:6.2f} us/step, k={hi}: {t_hi/T*1e6:6.2f})"
        )


def main(B: int = 256, T: int = 120):
    charset = DEFAULT_CHARSET
    tb = build_tables(charset)
    C = charset.size
    key = jax.random.key(0)
    scores = jax.random.normal(key, (B, C), jnp.float32)
    st0 = init_state(B, T)
    packed = pack_state(st0)
    itab = pack_tables(tb)
    b_blk = _batch_block(B, T, C)

    xla_run = make_xla_scan(tb, T)
    t_xla = _time(lambda: xla_run(st0, scores))
    print(f"xla_scan:    {t_xla*1e3:8.3f} ms total  "
          f"{t_xla/T*1e6:7.2f} us/step  (B={B})")
    t_mos = _time(lambda: mosaic_loop(itab, packed, scores, C, T, b_blk))
    print(f"mosaic_loop: {t_mos*1e3:8.3f} ms total  "
          f"{t_mos/T*1e6:7.2f} us/step  (b_blk={b_blk}, "
          f"{B//b_blk} sequential grid steps)")
    # budget: fused unconstrained kernel ~15 us/step (142.6k @ B=256,
    # BENCH_r03); >=120k needs <=17.8 us/step total
    print(f"budget:      automaton must cost <= {256/120_000/120*1e6 - 15.0:.1f}"
          f" us/step on top of the fused kernel's ~15.0 for >=120k SMILES/s")


if __name__ == "__main__":
    import sys

    if "--floor" in sys.argv:
        floor_probe()
    else:
        main(*(int(a) for a in sys.argv[1:]))
