"""Pallas TPU kernel: fused constrained-decoding automaton step (OPT-IN).

STATUS — measured SLOWER than the XLA path it was built to replace; kept
opt-in (`model.use_pallas_automaton`, default False) as a validated
alternative. History: the automaton first measured 7.0k constrained vs
94.9k unconstrained SMILES/s at B=256 (~280 us of small-HLO op-count tax
per ~22 us GRU step), motivating this kernel. The Mosaic-safety rewrites
it forced on constrain.py — sort/gather → one-hot histogram contractions,
bool-select → i1 logic, mask folded into int operands before minor-dim
insertion — turned out to fix the XLA path itself: re-measured 2026-08-18,
XLA constrained decode runs **74.0k SMILES/s** (79% of unconstrained, the
op-count tax gone), while this kernel measures 5.7k — its ~0.5 MB/row of
one-hot contraction intermediates serialize on the VPU inside one Mosaic
program, where XLA instead fuses them across the step. The kernel remains
the exact-agreement proof that constrain.py is Mosaic-compilable
(`bench.tpu_validation` gates kernel-vs-XLA agreement == 1.0 on hardware).

This kernel fuses ONE WHOLE automaton step — legality mask
(`step_mask_rem`) + masked token selection + state transition (`advance`)
— into a single Mosaic program.

Single source of truth: the kernel body CALLS the same `step_mask_rem` /
`advance` functions the XLA fallback uses (constrain.py is written
Mosaic-safe: broadcasted iotas, one-hot contractions instead of gathers,
no sorts). There is no duplicated automaton logic to drift.

Selection is gumbel-argmax: the caller passes per-step ``scores``
(= logits for greedy decode, or logits/temperature + Gumbel noise for
sampling — categorical(masked/T) and argmax(masked/T + G) are the same
distribution), the kernel masks illegal tokens to -1e9 and takes the
first argmax. The jnp reference path (`auto_step_ref`) computes the
identical formula, so kernel vs fallback agree exactly (integer state,
same float compare).

Layout: the automaton's 17 per-row scalars pack into one (B, SC) int32
array so the scan carry is 9 arrays instead of 26; tables pack into one
(18, C) int32 array. Grid is over batch blocks (each row is independent);
all state + intermediates live in VMEM (~5 MB at b_blk=128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..latent.constrain import (
    DMAX,
    NRING,
    ConState,
    Tables,
    _iota,
    advance,
    build_tables,
    step_mask_rem,
)
from .tpu_info import vmem_capacity_bytes, vmem_limit as _vmem_limit

Array = jax.Array

# scalar-field order in the packed (B, SC) array: 12 int32 then 5 bools
_SC_FIELDS = (
    "n_atoms", "prev", "pend", "sp", "pn", "hfix", "horder",
    "b", "bbud", "bh", "bchg", "bsign",
    "fresh", "done", "esc", "bsymc", "bsymb",
)
SC = len(_SC_FIELDS)
_BOOL_FIELDS = frozenset(("fresh", "done", "esc", "bsymc", "bsymb"))
# array-valued state fields, in packed-tuple order
_ARR_FIELDS = ("val", "par", "stack", "rpart", "rhint", "rres", "ppa", "ppb")
# packed-table row order (ints first, then bool flags as 0/1)
_TAB_ROWS = (
    "atom_budget", "bond_order", "digit_val",
    "is_atom", "is_l", "is_r", "is_c_upper", "is_b_upper", "is_open",
    "is_close", "is_dot", "is_lbr", "is_rbr", "is_at", "is_h", "is_plus",
    "is_minus", "is_pad",
)
_TAB_INT_ROWS = 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_tables(tb: Tables) -> Array:
    """(18, C) int32: all token-attribute tables as one kernel input."""
    return jnp.stack(
        [getattr(tb, name).astype(jnp.int32) for name in _TAB_ROWS], axis=0
    )


def _tables_from(it: Array, n: int) -> Tables:
    rows = {name: it[i] for i, name in enumerate(_TAB_ROWS)}
    for name in _TAB_ROWS[_TAB_INT_ROWS:]:
        rows[name] = rows[name] != 0
    return Tables(n=n, **rows)


def pack_state(st: ConState):
    """ConState -> (val, par, stack, rpart, rhint, rres, ppa, ppb, sc)."""
    sc = jnp.stack(
        [getattr(st, f).astype(jnp.int32) for f in _SC_FIELDS], axis=1
    )  # (B, SC)
    return tuple(getattr(st, f) for f in _ARR_FIELDS) + (sc,)


def unpack_state(packed) -> ConState:
    arrs = dict(zip(_ARR_FIELDS, packed[:-1]))
    sc = packed[-1]
    for i, f in enumerate(_SC_FIELDS):
        col = sc[:, i]
        arrs[f] = col != 0 if f in _BOOL_FIELDS else col
    return ConState(**arrs)


def select_advance(tb: Tables, st: ConState, scores: Array, rem: Array):
    """Shared mask -> select -> advance body (kernel AND fallback).

    scores: (B, C) fp32 — logits (greedy) or logits/T + Gumbel (sampling).
    Returns (new ConState, code (B,) int32). First-argmax tie-breaking,
    exactly `jnp.argmax` semantics, written gather-free for Mosaic.

    Illegal tokens floor at -inf (not a finite sentinel) so any finite
    legal score wins at ANY sampling temperature — a -1e9 floor could tie
    legal logits scaled by a tiny T and break validity-by-construction.
    NaN defense: a NaN score row makes `sc == mx` all-false and the
    argmin-of-iota return the out-of-range sentinel C; it is mapped to pad
    (advance() then records the escape in ``esc``) instead of crashing the
    host-side charset decode."""
    m = step_mask_rem(tb, st, rem)
    sc = jnp.where(m, scores, -jnp.inf)
    mx = jnp.max(sc, axis=1, keepdims=True)
    cidx = _iota(sc.shape, 1)
    code = jnp.min(jnp.where(sc == mx, cidx, tb.n), axis=1)
    code = jnp.where(code >= tb.n, 0, code)
    return advance(tb, st, code), code


def auto_step_ref(tb: Tables, packed, scores: Array, rem: Array):
    """XLA fallback: identical math to the kernel, packed-state interface.
    (The generation scan's fallback carries ConState natively and calls
    `select_advance` directly — no per-step pack/unpack; this wrapper
    serves the kernel-equality tests.)"""
    st2, code = select_advance(tb, unpack_state(packed), scores, rem)
    return pack_state(st2), code


def _auto_kernel(
    rem_ref, itab_ref,
    val_ref, par_ref, stack_ref, rpart_ref, rhint_ref, rres_ref,
    ppa_ref, ppb_ref, sc_ref, scores_ref,
    oval_ref, opar_ref, ostack_ref, orpart_ref, orhint_ref, orres_ref,
    oppa_ref, oppb_ref, osc_ref, ocode_ref,
    *, n: int,
):
    tb = _tables_from(itab_ref[:], n)
    packed = (
        val_ref[:], par_ref[:], stack_ref[:], rpart_ref[:], rhint_ref[:],
        rres_ref[:], ppa_ref[:], ppb_ref[:], sc_ref[:],
    )
    st2, code = select_advance(
        tb, unpack_state(packed), scores_ref[:], rem_ref[0]
    )
    out = pack_state(st2)
    for ref, arr in zip(
        (oval_ref, opar_ref, ostack_ref, orpart_ref, orhint_ref, orres_ref,
         oppa_ref, oppb_ref, osc_ref),
        out,
    ):
        ref[:] = arr
    ocode_ref[:] = code[:, None]


def _row_bytes(A: int, C: int) -> int:
    """Per-row Mosaic stack estimate for one automaton step.

    Calibration: ~0.5 MB/row measured at the dev shapes (A=120, C=37,
    NRING=10, DMAX=16), dominated by the (NRING, A)/(DMAX, A)/(NRING,
    NRING)/(NRING, C)-shaped one-hot contraction intermediates of
    `step_mask_rem`, each tiled to 8 sublanes x 128 lanes. The measured
    constant is scaled by the tiled contraction surface so growth in any
    of NRING/DMAX/A/C re-provisions the block instead of silently
    under-estimating (ADVICE r3)."""

    def tiled(sub: int, lane: int) -> int:
        return -(-sub // 8) * 8 * -(-lane // 128) * 128

    surf = (
        tiled(NRING, A) + tiled(DMAX, A) + tiled(NRING, NRING)
        + tiled(NRING, C)
    )
    cal = (
        tiled(10, 120) + tiled(16, 120) + tiled(10, 10) + tiled(10, 37)
    )
    return int(500_000 * surf / cal)


def _batch_block(B: int, A: int, C: int) -> int:
    """Batch rows per grid step: the largest divisor of B (capped at 128)
    whose estimated Mosaic stack fits 60% of VMEM, so small-VMEM chips
    still compile (ADVICE r2/r3: shape-derived, works for any B — odd
    batches fall back through smaller divisors instead of over-budget)."""
    budget = int(vmem_capacity_bytes() * 0.6)
    row = _row_bytes(A, C)
    divisors = sorted(
        (d for d in range(1, B + 1) if B % d == 0), reverse=True
    )
    for d in divisors:
        if d <= 128 and d * row <= budget:
            return d
    return divisors[-1]


@functools.partial(jax.jit, static_argnames=("n",))
def auto_step_pallas(itab: Array, packed, scores: Array, rem: Array, n: int):
    """One fused automaton step. Same contract as `auto_step_ref`.

    itab: pack_tables output (static per charset). rem: int32 scalar
    (tokens remaining after this one). Runs in interpret mode off-TPU so
    tests exercise the identical program on CPU."""
    B, C = scores.shape
    b_blk = _batch_block(B, packed[0].shape[1], C)
    grid = (B // b_blk,)

    def bspec(x):
        return pl.BlockSpec(
            (b_blk,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    state_specs = [bspec(x) for x in packed]
    out = pl.pallas_call(
        functools.partial(_auto_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(itab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            *state_specs,
            bspec(scores),
        ],
        out_specs=[
            *state_specs,
            pl.BlockSpec((b_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in packed],
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(jnp.reshape(rem, (1,)).astype(jnp.int32), itab, *packed, scores)
    return tuple(out[:-1]), out[-1][:, 0]
