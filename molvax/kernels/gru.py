"""Pallas TPU kernel: GRU layer recurrence with custom VJP.

The decoder's 120-step stacked GRU is ~90% of training FLOPs (SURVEY.md 3.1).
Strategy (SURVEY.md 7 stage 8a):

  * The input projection ``x @ W_ih`` of each layer does not depend on the
    recurrence (teacher forcing), so it is ONE large XLA GEMM per layer.
  * The recurrent half - per step ``gh = h @ W_hh``; gates; state update -
    is this Pallas kernel: W_hh pinned in VMEM for the whole sweep, h carried
    in a VMEM scratch accumulator, gate nonlinearities fused into the matmul
    epilogue.
  * Grid = (batch blocks, time blocks): each grid step processes K timesteps
    for a 128-row batch block, amortizing per-step DMA/bookkeeping overhead
    ~K x (measured: per-grid-step overhead ~30 us vs ~2 us of matmul, so
    single-step grids are overhead-bound). Batch blocks are independent
    recurrences; time blocks run innermost so the h scratch carries across.
  * Backward is a second Pallas kernel sweeping time in reverse (block
    index_map + reversed inner loop), carrying dh in scratch. The
    production path (gru_layer_scan_x) computes ALL SIX gradients in that
    one sweep: dx per step as MXU co-work on the serial chain, and
    dW_ih/db_ih/dW_hh/db_hh accumulated into VMEM-resident constant-index
    output blocks across the whole (batch, time) grid (VERDICT r2 next 2)
    — the packed gate cotangents dgi/dgh never touch HBM, removing a
    (T,B,6Hp) bf16 write+read per layer per step with identical MXU work.
    Measured v5 lite, full train step: B=512 20.9k -> 35.4k SMILES/s
    (+70%; the old backward was HBM-bound there), B=256 29.8k -> 32.8k.
    The legacy hoisted-gi kernel (gru_layer_scan) keeps the outside-einsum
    reduction.

Numerics: matmuls bf16 with fp32 accumulation; h carry and gate adds fp32;
residuals and h_seq stored bf16 (halves HBM traffic; fp32 master state never
leaves the kernel mid-sweep). A strict-fp32 mode (matmul_dtype='float32' on
gru_layer_scan_x, selected by compute_dtype='float32' configs) keeps every
operand, residual, and cotangent fp32 — the dtype contract of VERDICT r4
next 4; ~2x HBM traffic and fp32 MXU rate, measured cost in BASELINE.md.
Lane padding: H rounds up to 128 with gates stored padded-per-gate ([r|z|n]
each Hp wide) so slice boundaries stay lane-aligned.

The jnp reference is molvax.nn.gru.gru_layer_recurrence; tests/kernels/
check interpret-mode agreement incl. gradients (SURVEY.md 4.3).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_info import vmem_limit as _vmem_limit

Array = jax.Array

_B_BLK = 128  # preferred batch rows per grid block
_B_MIN = 16  # bf16 sublane granule: block batch dims must be multiples
_warned_fp32 = False  # one-time fused_stack-is-bf16-only notice (gru_forward_pallas)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_b_blk(B: int) -> int | None:
    """Batch rows per grid block: 128 when it divides B, else the largest
    divisor of B that is a multiple of the bf16 sublane granule (16). Lets
    the reference config's batch 64 (BASELINE.json:7) and other non-128
    batches run the kernel instead of silently falling back to XLA
    (VERDICT r1 weak 2). None = unsupported batch (caller falls back).
    MOLVAX_GRU_B_BLK overrides for sweeps (e.g. 256-row blocks hosting two
    interleaved 128-row chains with MOLVAX_GRU_CHAINS=2)."""
    import os

    forced = os.environ.get("MOLVAX_GRU_B_BLK")
    if forced:
        fb = int(forced)
        if B % fb == 0 and fb % _B_MIN == 0:
            return fb
    if B % _B_BLK == 0:
        return _B_BLK
    start = (min(B, _B_BLK) // _B_MIN) * _B_MIN  # largest 16-aligned <= B
    for cand in range(start, _B_MIN - 1, -_B_MIN):
        if B % cand == 0:
            return cand
    return None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _time_block(T: int, Hp: int, bytes_per_row: int, b_blk: int) -> int:
    """Timesteps per grid block: biggest divisor of T whose double-buffered
    in/out/residual blocks fit the device's streaming VMEM budget (weights +
    scratch reserved out of the budget; see kernels/tpu_info.py).
    bytes_per_row = per-timestep bytes per batch row (fwd: gi 6 + hseq 2 +
    rzn 6 + ghn 2 = 16*Hp bf16-ish; bwd: 26*Hp).

    MOLVAX_GRU_TIME_BLK forces K for overhead sweeps (round 5: measuring
    the per-grid-step overhead slope at Hp=1024 to bound what a small-K
    sub-stack plan would cost — see docs/PERFORMANCE.md stack ceiling)."""
    import os

    forced = os.environ.get("MOLVAX_GRU_TIME_BLK")
    if forced:
        fk = int(forced)
        if T % fk == 0:
            return fk
    from .tpu_info import stream_budget

    budget = stream_budget()
    per_step = bytes_per_row * b_blk * 2  # x2: double buffering
    cap = max(1, budget // max(per_step, 1))
    for k in (12, 10, 8, 6, 5, 4, 3, 2, 1):
        if T % k == 0 and k <= cap:
            return k
    return 1


# --------------------------------------------------------------------------
# padding helpers: gates packed [r|z|n], each padded H -> Hp
# --------------------------------------------------------------------------

def _pad_tail(x: Array, axis: int, target: int) -> Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_gates(x: Array, H: int, Hp: int) -> Array:
    """(..., 3H) -> (..., 3Hp), per-gate zero padding."""
    if H == Hp:
        return x
    parts = [x[..., :H], x[..., H : 2 * H], x[..., 2 * H :]]
    return jnp.concatenate([_pad_tail(p, -1, Hp) for p in parts], axis=-1)


def _unpad_gates(x: Array, H: int, Hp: int) -> Array:
    if H == Hp:
        return x
    return jnp.concatenate(
        [x[..., :H], x[..., Hp : Hp + H], x[..., 2 * Hp : 2 * Hp + H]], axis=-1
    )


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _pick_chains(b_blk: int) -> int:
    """Independent batch sub-chains per block (1 = plain serial loop).

    Splitting the block's rows into P interleaved chains hides serial
    h @ W_hh latency in the FUSED stack kernel (gru_stack.py, where
    in-kernel input-gate dots keep the MXU busy), but a round-2 sweep on
    THIS kernel measured it monotonically harmful — v5 lite, B=256 f+b:
    P=1 11.84 ms, P=2 11.87, P=4 12.12, P=8 12.47. The round-4 follow-up
    (bench.chain_probe) tested FULL 128-row chains in 256-row blocks on
    the scan_x kernels and also lost (f+b 3.63 vs 3.32 ms; b128/P2 ties
    exactly — docs/PERFORMANCE.md design table). With the input GEMMs
    in-kernel, the recurrence dot is throughput- not latency-bound at
    these widths. Default 1; MOLVAX_GRU_CHAINS (divisor of b_blk/16)
    re-enables for sweeps on other hardware."""
    import os

    forced = os.environ.get("MOLVAX_GRU_CHAINS")
    if forced:
        p = int(forced)
        return p if b_blk % (16 * p) == 0 else 1
    return 1


def _fwd_kernel(
    gi_ref, w_ref, b_ref, h0_ref, hseq_ref, rzn_ref, ghn_ref, h_scr, *, n_chains: int
):
    K = gi_ref.shape[0]
    b_blk, Hp = h0_ref.shape
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    rows = lambda c: slice(c * R, (c + 1) * R)
    h = [h_scr[rows(c)] for c in range(P)]  # fp32 carries per chain

    def issue(c, k):
        gh = (
            jnp.dot(
                h[c].astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32
            )
            + b_ref[:]
        )
        gi = gi_ref[k, rows(c)].astype(jnp.float32)
        return gi, gh

    def gates(c, k, gi, gh):
        r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
        z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
        ghn = gh[:, 2 * Hp :]
        n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)
        h[c] = (1.0 - z) * n + z * h[c]
        hseq_ref[k, rows(c)] = h[c].astype(jnp.bfloat16)
        rzn_ref[k, rows(c)] = jnp.concatenate([r, z, n], axis=-1).astype(jnp.bfloat16)
        ghn_ref[k, rows(c)] = ghn.astype(jnp.bfloat16)

    if P == 1:
        for k in range(K):
            gates(0, k, *issue(0, k))
    else:
        # Rotating software pipeline: chain c's gates retire right after
        # chain c+1's issue (see _pick_chains; same emit order as the
        # fused-stack kernel in gru_stack.py).
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
        h_scr[rows(c)] = h[c]


@jax.jit
def _fwd_call(gi_p: Array, w_p: Array, b_p: Array, h0_p: Array):
    T, B, Gp = gi_p.shape
    Hp = Gp // 3
    b_blk = _pick_b_blk(B) or B
    K = _time_block(T, Hp, 16 * Hp, b_blk)
    nB, nT = B // b_blk, T // K
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_chains=_pick_chains(b_blk)),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, b_blk, Gp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Gp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, Hp), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, b_blk, Hp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Gp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),  # h_seq
            jax.ShapeDtypeStruct((T, B, Gp), jnp.bfloat16),  # r|z|n residual
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),  # gh_n residual
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(gi_p, w_p, b_p, h0_p)


# --------------------------------------------------------------------------
# backward kernel (reverse time sweep)
# --------------------------------------------------------------------------

def _bwd_kernel(
    dy_ref,
    rzn_ref,
    ghn_ref,
    hprev_ref,
    wt_ref,
    dgi_ref,
    dgh_ref,
    dh0_ref,
    dh_scr,
    *,
    n_chains: int,
):
    K = dy_ref.shape[0]
    b_blk, Hp = dh0_ref.shape
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    rows = lambda c: slice(c * R, (c + 1) * R)
    dh = [dh_scr[rows(c)] for c in range(P)]

    def issue(c, k):
        # residual loads only — prefetchable, independent of the serial
        # reverse chain; the chain's dgh @ W^T dot sits in gates() and its
        # latency hides behind the other chains' gate math.
        rzn = rzn_ref[k, rows(c)].astype(jnp.float32)
        ghn = ghn_ref[k, rows(c)].astype(jnp.float32)
        h_prev = hprev_ref[k, rows(c)].astype(jnp.float32)
        dy = dy_ref[k, rows(c)]
        return rzn, ghn, h_prev, dy

    def gates(c, k, rzn, ghn, h_prev, dy):
        r, z, n = rzn[:, :Hp], rzn[:, Hp : 2 * Hp], rzn[:, 2 * Hp :]
        dout = dy + dh[c]
        dz = dout * (h_prev - n) * z * (1.0 - z)
        dn = dout * (1.0 - z) * (1.0 - n * n)
        dghn = dn * r
        dr = dn * ghn
        drpre = dr * r * (1.0 - r)
        dgi = jnp.concatenate([drpre, dz, dn], axis=-1)
        dgh = jnp.concatenate([drpre, dz, dghn], axis=-1)
        dh[c] = dout * z + jnp.dot(
            dgh.astype(jnp.bfloat16), wt_ref[:], preferred_element_type=jnp.float32
        )
        dgi_ref[k, rows(c)] = dgi.astype(jnp.bfloat16)
        dgh_ref[k, rows(c)] = dgh.astype(jnp.bfloat16)

    if P == 1:
        for k in range(K - 1, -1, -1):
            gates(0, k, *issue(0, k))
    else:
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
        dh_scr[rows(c)] = dh[c]

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


@jax.jit
def _bwd_call(dy_p, rzn, ghn, hprev_p, wt_p):
    T, B, Hp = dy_p.shape
    Gp = 3 * Hp
    b_blk = _pick_b_blk(B) or B
    K = _time_block(T, Hp, 26 * Hp, b_blk)
    nB, nT = B // b_blk, T // K
    rev3 = lambda b, t: (nT - 1 - t, b, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_chains=_pick_chains(b_blk)),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Gp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, Hp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, b_blk, Gp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Gp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, Hp), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Gp), jnp.bfloat16),  # dgi
            jax.ShapeDtypeStruct((T, B, Gp), jnp.bfloat16),  # dgh
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),  # dh0
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Hp), jnp.float32)],
        # default scoped-vmem limit is 16MB; at Hp=1024 the resident W^T
        # (6.3MB bf16) + double-buffered blocks just overflow it (measured:
        # 16.28MB requested on the 4xGRU-1024 config at B=256). The chip
        # has ~120MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(dy_p, rzn, ghn, hprev_p, wt_p)


# --------------------------------------------------------------------------
# custom-VJP wrapper: gru_layer_scan
# --------------------------------------------------------------------------

@jax.custom_vjp
def gru_layer_scan(gi_seq: Array, w_hh: Array, b_hh: Array, h0: Array) -> Array:
    """Recurrent half of one GRU layer.

    gi_seq: (T, B, 3H) precomputed input gates (x @ W_ih + b_ih)
    w_hh:   (H, 3H), b_hh: (3H,), h0: (B, H)
    returns h_seq: (T, B, H) fp32.

    Drop-in replacement for molvax.nn.gru.gru_layer_recurrence (same math,
    torch gate order r|z|n). B must satisfy pallas_batch_ok (any multiple of
    16 in practice, incl. the reference config's 64); other sizes fall back
    in the caller."""
    h_seq, _ = _fwd_impl(gi_seq, w_hh, b_hh, h0)
    return h_seq


def _fwd_impl(gi_seq, w_hh, b_hh, h0):
    T, B, G = gi_seq.shape
    H = G // 3
    Hp = _round_up(H, 128)
    gi_p = _pad_gates(gi_seq, H, Hp).astype(jnp.bfloat16)
    w_p = _pad_gates(_pad_tail(w_hh, 0, Hp), H, Hp).astype(jnp.bfloat16)
    b_p = _pad_gates(b_hh, H, Hp).astype(jnp.float32)[None, :]
    h0_p = _pad_tail(h0.astype(jnp.float32), 1, Hp)
    hseq_p, rzn, ghn = _fwd_call(gi_p, w_p, b_p, h0_p)
    h_seq = hseq_p[..., :H].astype(jnp.float32)
    return h_seq, (rzn, ghn, hseq_p, h0_p, w_hh)


def _vjp_fwd(gi_seq, w_hh, b_hh, h0):
    return _fwd_impl(gi_seq, w_hh, b_hh, h0)


def _vjp_bwd(res, dY):
    rzn, ghn, hseq_p, h0_p, w_hh = res
    H = w_hh.shape[0]
    T, B, Hp = hseq_p.shape
    hprev_p = jnp.concatenate(
        [h0_p[None].astype(jnp.bfloat16), hseq_p[:-1]], axis=0
    )
    dy_p = _pad_tail(dY.astype(jnp.float32), 2, Hp)
    wt_p = jnp.swapaxes(_pad_gates(_pad_tail(w_hh, 0, Hp), H, Hp), 0, 1).astype(
        jnp.bfloat16
    )

    dgi_p, dgh_p, dh0_p = _bwd_call(dy_p, rzn, ghn, hprev_p, wt_p)

    # Weight/bias grads: two large GEMM reductions over the whole sequence
    # (MXU-friendly; outside the kernel so no VMEM accumulators needed).
    dw_p = jnp.einsum(
        "tbh,tbg->hg", hprev_p, dgh_p, preferred_element_type=jnp.float32
    )
    dw_hh = _unpad_gates(dw_p[:H], H, Hp)
    db_hh = _unpad_gates(jnp.sum(dgh_p.astype(jnp.float32), axis=(0, 1)), H, Hp)
    dgi = _unpad_gates(dgi_p, H, Hp).astype(jnp.float32)
    dh0 = dh0_p[:, :H]
    return dgi, dw_hh, db_hh, dh0


gru_layer_scan.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# custom-VJP wrapper: gru_layer_scan_x — in-kernel input-gate GEMM
# --------------------------------------------------------------------------

def _fwd_kernel_x(
    x_ref, wih_ref, bih_ref, whh_ref, bhh_ref, h0_ref, hseq_ref, rzn_ref,
    ghn_ref, h_scr, *, n_chains: int, md=jnp.bfloat16,
):
    K = x_ref.shape[0]
    b_blk, Hp = h0_ref.shape
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = h0_ref[:]

    rows = lambda c: slice(c * R, (c + 1) * R)
    h = [h_scr[rows(c)] for c in range(P)]

    def issue(c, k):
        # The x @ W_ih dot has no dependence on the serial chain, so Mosaic
        # prefetches/overlaps it while h @ W_hh waits on the carry — the MXU
        # co-work that made the fused-stack forward fast, brought to the
        # per-layer kernel (measured: 3-layer fwd 5.0 -> 4.2 ms at B=256 vs
        # the hoisted-GEMM variant, bench/proto_gi_kernel.py).
        gi = (
            jnp.dot(
                x_ref[k, rows(c)], wih_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bih_ref[:]
        )
        gh = (
            jnp.dot(
                h[c].astype(md), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bhh_ref[:]
        )
        return gi, gh

    def gates(c, k, gi, gh):
        r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
        z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
        ghn = gh[:, 2 * Hp :]
        n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)
        h[c] = (1.0 - z) * n + z * h[c]
        hseq_ref[k, rows(c)] = h[c].astype(md)
        rzn_ref[k, rows(c)] = jnp.concatenate([r, z, n], axis=-1).astype(md)
        ghn_ref[k, rows(c)] = ghn.astype(md)

    if P == 1:
        for k in range(K):
            gates(0, k, *issue(0, k))
    else:
        # Rotating software pipeline (same emit order as _fwd_kernel):
        # chain c's serial dot issues while chain c-1's gates retire, so P
        # independent h @ W_hh chains interleave on the MXU.
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
        h_scr[rows(c)] = h[c]


@functools.partial(jax.jit, static_argnames=("md_name",))
def _fwd_call_x(x_p, wih_p, bih_p, whh_p, bhh_p, h0_p, md_name="bfloat16"):
    md = jnp.dtype(md_name)
    itm = md.itemsize
    T, B, Ip = x_p.shape
    Hp = h0_p.shape[1]
    Gp = 3 * Hp
    b_blk = _pick_b_blk(B) or B
    K = _time_block(T, Hp, itm * (Ip + 5 * Hp), b_blk)
    nB, nT = B // b_blk, T // K
    const = lambda b, t: (0, 0)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_x, n_chains=_pick_chains(b_blk), md=md
        ),
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
            jax.ShapeDtypeStruct((T, B, Hp), md),
            jax.ShapeDtypeStruct((T, B, Gp), md),
            jax.ShapeDtypeStruct((T, B, Hp), md),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(x_p, wih_p, bih_p, whh_p, bhh_p, h0_p)


def _bwd_kernel_x(
    dy_ref,
    rzn_ref,
    ghn_ref,
    hprev_ref,
    x_ref,
    wt_ref,
    wihT_ref,
    dx_ref,
    dh0_ref,
    dwih_ref,
    dbih_ref,
    dwhh_ref,
    dbhh_ref,
    dh_scr,
    *,
    n_chains: int,
    md=jnp.bfloat16,
):
    K = dy_ref.shape[0]
    b_blk, Hp = dh0_ref.shape
    P = n_chains
    R = b_blk // P

    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        # Weight/bias gradient accumulators: constant-index output blocks
        # stay VMEM-resident across the whole (batch, time) grid and flush
        # to HBM once at the end (VERDICT r2 next 2: accumulating in-kernel
        # removes the (T,B,6Hp) bf16 dgi/dgh HBM round trip the outside
        # einsums used to pay, with the same MXU work).
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dbih_ref[:] = jnp.zeros_like(dbih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    rows = lambda c: slice(c * R, (c + 1) * R)
    dh = [dh_scr[rows(c)] for c in range(P)]
    dgis = [[None] * P for _ in range(K)]
    dghs = [[None] * P for _ in range(K)]

    def issue(c, k):
        # residual loads only — independent of the serial reverse chain
        rzn = rzn_ref[k, rows(c)].astype(jnp.float32)
        ghn = ghn_ref[k, rows(c)].astype(jnp.float32)
        h_prev = hprev_ref[k, rows(c)].astype(jnp.float32)
        dy = dy_ref[k, rows(c)]
        return rzn, ghn, h_prev, dy

    def gates(c, k, rzn, ghn, h_prev, dy):
        r, z, n = rzn[:, :Hp], rzn[:, Hp : 2 * Hp], rzn[:, 2 * Hp :]
        dout = dy + dh[c]
        dz = dout * (h_prev - n) * z * (1.0 - z)
        dn = dout * (1.0 - z) * (1.0 - n * n)
        dghn = dn * r
        dr = dn * ghn
        drpre = dr * r * (1.0 - r)
        dgi = jnp.concatenate([drpre, dz, dn], axis=-1)
        dgh = jnp.concatenate([drpre, dz, dghn], axis=-1)
        dh[c] = dout * z + jnp.dot(
            dgh.astype(md), wt_ref[:], preferred_element_type=jnp.float32
        )
        # dx has no dependence on the serial reverse chain — MXU co-work
        # that overlaps the dgh @ W_hh^T latency (mirror of the forward's
        # in-kernel input-gate dot), and it replaces a (T,B,3H)-reading
        # einsum outside the kernel.
        dx_ref[k, rows(c)] = jnp.dot(
            dgi.astype(md), wihT_ref[:], preferred_element_type=jnp.float32
        ).astype(md)
        dgis[k][c] = dgi.astype(md)
        dghs[k][c] = dgh.astype(md)

    if P == 1:
        for k in range(K - 1, -1, -1):
            gates(0, k, *issue(0, k))
    else:
        # rotating pipeline, reverse time (same emit order as _bwd_kernel)
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
        dh_scr[rows(c)] = dh[c]

    # Block-level gradient accumulation: flatten the K timesteps into one
    # (K*b_blk)-row contraction per matmul — off the serial chain, same
    # rounding as the old outside einsums (bf16 operands, fp32 accumulate).
    # Chain pieces concatenate in c-ascending order == original row order,
    # matching hprev_flat/x_flat's k-major reshape row for row.
    dgi_flat = jnp.concatenate(
        [p for ks in dgis for p in ks], axis=0
    )  # (K*b, Gp) matmul dtype
    dgh_flat = jnp.concatenate([p for ks in dghs for p in ks], axis=0)
    hprev_flat = hprev_ref[:].reshape(K * b_blk, Hp)
    x_flat = x_ref[:].reshape(K * b_blk, x_ref.shape[2])
    contract_rows = (((0,), (0,)), ((), ()))
    dwhh_ref[:] += jax.lax.dot_general(
        hprev_flat, dgh_flat, contract_rows, preferred_element_type=jnp.float32
    )
    dbhh_ref[:] += jnp.sum(dgh_flat.astype(jnp.float32), axis=0, keepdims=True)
    dwih_ref[:] += jax.lax.dot_general(
        x_flat, dgi_flat, contract_rows, preferred_element_type=jnp.float32
    )
    dbih_ref[:] += jnp.sum(dgi_flat.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


@functools.partial(jax.jit, static_argnames=("md_name",))
def _bwd_call_x(dy_p, rzn, ghn, hprev_p, x_p, wt_p, wihT_p, md_name="bfloat16"):
    md = jnp.dtype(md_name)
    itm = md.itemsize
    T, B, Hp = dy_p.shape
    Gp = 3 * Hp
    Ip = wihT_p.shape[1]
    b_blk = _pick_b_blk(B) or B
    # streamed rows (bf16, itm=2): dy f32 4 + rzn 6 + ghn 2 + hprev 2 +
    # x 2Ip + dx out 2Ip (double-buffered by _time_block) + block-local
    # dgi/dgh lists 12 (once); itm scales the non-dy terms for fp32 mode
    K = _time_block(T, Hp, (4 + 8 * itm) * Hp + 2 * itm * Ip, b_blk)
    nB, nT = B // b_blk, T // K
    rev3 = lambda b, t: (nT - 1 - t, b, 0)
    const = lambda b, t: (0, 0)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_x, n_chains=_pick_chains(b_blk), md=md
        ),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Gp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Hp), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b_blk, Ip), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, Hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, Ip), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, b_blk, Ip), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, Hp), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Gp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Ip), md),  # dx
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),  # dh0
            jax.ShapeDtypeStruct((Ip, Gp), jnp.float32),  # dw_ih
            jax.ShapeDtypeStruct((1, Gp), jnp.float32),  # db_ih
            jax.ShapeDtypeStruct((Hp, Gp), jnp.float32),  # dw_hh
            jax.ShapeDtypeStruct((1, Gp), jnp.float32),  # db_hh
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(dy_p, rzn, ghn, hprev_p, x_p, wt_p, wihT_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_layer_scan_x_md(
    md_name: str, x_seq: Array, w_ih: Array, b_ih: Array, w_hh: Array,
    b_hh: Array, h0: Array,
) -> Array:
    h_seq, _ = _fwd_impl_x(md_name, x_seq, w_ih, b_ih, w_hh, b_hh, h0)
    return h_seq


def gru_layer_scan_x(
    x_seq: Array,
    w_ih: Array,
    b_ih: Array,
    w_hh: Array,
    b_hh: Array,
    h0: Array,
    matmul_dtype: str = "bfloat16",
) -> Array:
    """One full GRU layer — input gates computed IN-kernel from x.

    x_seq: (T, B, I), w_ih: (I, 3H), w_hh: (H, 3H), h0: (B, H)
    returns h_seq (T, B, H) fp32. Same math/gate order as gru_layer_scan,
    but the x @ W_ih GEMM rides inside the recurrence kernel where it
    overlaps the serial chain (see _fwd_kernel_x).

    ``matmul_dtype`` (VERDICT r4 next 4, the dtype contract): 'bfloat16'
    (default, the measured production mode — fp32 gate math/accumulation/
    carries, bf16 matmul operands and residual stores) or 'float32' (strict
    mode: every operand, residual, and cotangent stays fp32, so
    compute_dtype='float32' configs get exactly the dtype they declare;
    fwd+bwd both honor it). gi stays fp32 either way (no store round-trip
    — the hoisted variant rounds gi at the kernel boundary)."""
    return _gru_layer_scan_x_md(
        str(matmul_dtype), x_seq, w_ih, b_ih, w_hh, b_hh, h0
    )


def _fwd_impl_x(md_name, x_seq, w_ih, b_ih, w_hh, b_hh, h0):
    md = jnp.dtype(md_name)
    T, B, I = x_seq.shape
    H = w_hh.shape[0]
    Hp = _round_up(H, 128)
    Ip = _round_up(I, 128)
    x_p = _pad_tail(x_seq, 2, Ip).astype(md)
    wih_p = _pad_gates(_pad_tail(w_ih, 0, Ip), H, Hp).astype(md)
    bih_p = _pad_gates(b_ih, H, Hp).astype(jnp.float32)[None, :]
    whh_p = _pad_gates(_pad_tail(w_hh, 0, Hp), H, Hp).astype(md)
    bhh_p = _pad_gates(b_hh, H, Hp).astype(jnp.float32)[None, :]
    h0_p = _pad_tail(h0.astype(jnp.float32), 1, Hp)
    hseq_p, rzn, ghn = _fwd_call_x(
        x_p, wih_p, bih_p, whh_p, bhh_p, h0_p, md_name=md_name
    )
    h_seq = hseq_p[..., :H].astype(jnp.float32)
    return h_seq, (rzn, ghn, hseq_p, h0_p, x_p, wih_p, w_hh, I)


def _vjp_fwd_x(md_name, x_seq, w_ih, b_ih, w_hh, b_hh, h0):
    return _fwd_impl_x(md_name, x_seq, w_ih, b_ih, w_hh, b_hh, h0)


def _vjp_bwd_x(md_name, res, dY):
    md = jnp.dtype(md_name)
    rzn, ghn, hseq_p, h0_p, x_p, wih_p, w_hh, I = res
    H = w_hh.shape[0]
    T, B, Hp = hseq_p.shape
    hprev_p = jnp.concatenate([h0_p[None].astype(md), hseq_p[:-1]], axis=0)
    dy_p = _pad_tail(dY.astype(jnp.float32), 2, Hp)
    wt_p = jnp.swapaxes(_pad_gates(_pad_tail(w_hh, 0, Hp), H, Hp), 0, 1).astype(md)

    # All six gradients come out of ONE kernel sweep: dx per-step as MXU
    # co-work on the serial chain, dW/db accumulated in VMEM-resident
    # constant-index blocks across the (batch, time) grid (VERDICT r2 next
    # 2) — the dgi/dgh gate cotangents never touch HBM.
    dx_p, dh0_p, dwih_p, dbih_p, dwhh_p, dbhh_p = _bwd_call_x(
        dy_p, rzn, ghn, hprev_p, x_p, wt_p, jnp.swapaxes(wih_p, 0, 1),
        md_name=md_name,
    )

    dw_hh = _unpad_gates(dwhh_p[:H], H, Hp)
    db_hh = _unpad_gates(dbhh_p[0], H, Hp)
    dx = dx_p[..., :I].astype(jnp.float32)
    dw_ih = _unpad_gates(dwih_p[:I], H, Hp)
    db_ih = _unpad_gates(dbih_p[0], H, Hp)
    dh0 = dh0_p[:, :H]
    return dx, dw_ih, db_ih, dw_hh, db_hh, dh0


_gru_layer_scan_x_md.defvjp(_vjp_fwd_x, _vjp_bwd_x)


def pallas_batch_ok(B: int) -> bool:
    """True if the Pallas recurrence supports this batch size on TPU (any
    batch with a block-decomposition into sublane-aligned rows; in practice
    every multiple of 16, including the reference config's 64)."""
    return _pick_b_blk(B) is not None


# --------------------------------------------------------------------------
# full stacked forward (Pallas path used by the decoder)
# --------------------------------------------------------------------------

def _route_stack(kernel: str) -> bool:
    """True when gru_forward_pallas should try the fused all-layers kernel.

    'auto' routes to the stack on hardware at every batch: with the round-4
    v3 backward (in-kernel dW/db accumulation), the P=2 chain default, and
    the in-kernel layer-0 input GEMM, the stack won every measured same-run
    pair on v5 lite (zinc250k preset: 24.3k vs 23.3k @64, 34.1-34.8k vs
    31.5-32.2k @256, 37.4k vs 34.8k @512 SMILES/s) — the per-layer kernel
    serves shapes whose stack plan exceeds the VMEM budget (e.g. the
    4xGRU-1024 moses_scaled config; stack_plan_ok gates in the caller) and
    interpret mode (CPU tests, multichip dryruns), where the all-layers
    unrolled kernel is far slower to execute and the stack path has its own
    explicit-kernel tests (tests/kernels/test_gru_stack.py)."""
    return kernel == "fused_stack" or (kernel == "auto" and not _interpret())


def gru_forward_pallas(
    layers: List,
    x_seq: Array,
    h0: Array | None = None,
    compute_dtype=jnp.bfloat16,
    kernel: str = "auto",
) -> Tuple[Array, Array]:
    """Drop-in for molvax.nn.gru.gru_forward via Pallas recurrence kernels.
    x_seq (B, T, in) -> (out (B, T, H), h_final).

    kernel='per_layer': one kernel per layer with the input-gate GEMM
    computed IN-kernel (gru_layer_scan_x) so it overlaps the serial chain;
    gate residuals stored for the backward. The round-2 full-train-step
    matrix on v5 lite (bench/step_matrix.py) made this the then-winner:
    29.8k/30.1k SMILES/s at B=256/512 (H=501) vs the fused-stack kernel's
    then-22.1k/22.8k, and ~8.0k vs ~3.7k on the scaled 4xGRU-1024 config.

    kernel='fused_stack': the all-layers kernel (molvax/kernels/gru_stack.py).
    Round 4 gave it the same two moves that made per-layer fast — in-kernel
    dW/db accumulation in the backward (v3) and the in-kernel input GEMM
    (extended to layer 0) — plus the measured P=2 chain depth, and it now
    wins every same-run pair at H=512: 24.3k vs 23.3k @64, 34.1-34.8k vs
    31.5-32.2k @256, 37.4k vs 34.8k @512 (zinc250k preset full train step).

    kernel='auto' (default) routes by that measurement: fused_stack on
    hardware whenever the VMEM plan fits (stack_plan_ok), per_layer for
    oversize shapes (moses_scaled's 4xGRU-1024 plan needs ~167 MB vs the
    ~100 MB budget) and in interpret mode.

    Falls back to the per-layer kernel when the stack shape or VMEM plan
    rules the fused kernel out, and to the pure-XLA scan when the batch is
    not a multiple of the kernel's batch block (e.g. tiny eval batches).

    Dtype contract (VERDICT r4 next 4): ``compute_dtype`` is HONORED here.
    'bfloat16' runs the measured production kernels (bf16 matmul operands,
    fp32 gate math/accumulation/carries). 'float32' runs the per-layer
    kernels in strict-fp32 mode (gru_layer_scan_x matmul_dtype='float32':
    fp32 operands, residuals, and cotangents end to end) — the fused-stack
    kernel is bf16-by-design, so strict fp32 always takes the per-layer
    path (a pinned kernel='fused_stack' gets a one-time note)."""
    B, T, _ = x_seq.shape
    if not _interpret() and not pallas_batch_ok(B):
        from ..nn.gru import gru_forward

        return gru_forward(layers, x_seq, h0, compute_dtype)
    strict_fp32 = compute_dtype not in (jnp.bfloat16, "bfloat16")
    md_name = "float32" if strict_fp32 else "bfloat16"
    if strict_fp32 and kernel == "fused_stack":
        global _warned_fp32
        if not _warned_fp32:
            _warned_fp32 = True
            import sys

            print(
                "[molvax] note: the fused-stack kernel is bf16-only; "
                "compute_dtype='float32' routes the strict-fp32 per-layer "
                "kernels instead",
                file=sys.stderr,
            )

    if not strict_fp32 and _route_stack(kernel):
        from .gru_stack import gru_forward_wavefront, stack_plan_ok

        if stack_plan_ok(layers, B, T):
            return gru_forward_wavefront(layers, x_seq, h0, compute_dtype)

    L = len(layers)
    H = layers[0]["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((L, B, H), dtype=jnp.float32)

    inp = jnp.swapaxes(x_seq, 0, 1)  # (T, B, in) scan-major once
    finals = []
    for li, layer in enumerate(layers):
        # input gates ride inside the kernel (gru_layer_scan_x): the x@W_ih
        # dot overlaps the serial h@W_hh chain instead of materializing a
        # (T,B,3H) gi array through HBM
        inp = gru_layer_scan_x(
            inp, layer["w_ih"], layer["b_ih"], layer["w_hh"], layer["b_hh"],
            h0[li], matmul_dtype=md_name,
        )  # (T, B, H)
        finals.append(inp[-1])
    return jnp.swapaxes(inp, 0, 1), jnp.stack(finals)
