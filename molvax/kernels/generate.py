"""Pallas TPU kernel: fused autoregressive generation (greedy / sampled).

Reference parity: free-running decode - per step: GRU stack -> softmax ->
argmax/sample -> feed back (SURVEY.md 3.4). The jnp path
(molvax/latent/sample.py) is a lax.scan; this kernel is its latency-optimal
TPU form: ALL decoder weights pinned in VMEM for the whole 120-step loop,
hidden states and the previous one-hot live as loop carries, so one kernel
launch generates the entire batch with zero per-step HBM weight traffic or
op-dispatch overhead.

Structure per step (inside a single fori_loop):
  gi_1 = giz1 + prev @ W_c          # giz1 = z_emb @ W_ih[:L] + b precomputed
  h_1  = gru_gate(gi_1, h_1 @ W_hh1)
  h_l  = gru_gate(h_{l-1} @ W_ihl + b_l, h_l @ W_hhl)   l = 2..L
  logits = h_L @ W_out + b_out      # pad lanes masked to -inf
  code = argmax(logits [+ gumbel/temperature])
  prev = one_hot(code)              # iota compare, stays in VMEM

Sampling uses the on-chip PRNG (gumbel-max; same caveat as
kernels/sampler.py: key-deterministic but a different stream than
jax.random). Falls back to the jnp scan off-TPU, for 'repeat_z' decoders,
for batches not divisible by the 128-row block, or when the decoder weights
exceed the VMEM budget (the 4xGRU-1024 scaled config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .gru import _pad_gates, _pad_tail, _round_up
from .sampler import _seed_from_key
from .tpu_info import vmem_limit as _vmem_limit

Array = jax.Array

_B_BLK = 128


def _weight_budget() -> int:
    # bf16 decoder weights must stay VMEM-resident across the whole decode
    # loop. Device-derived (ADVICE r2): half of capacity leaves room for
    # carries/logits/temporaries — 64 MB on the 128 MB-class dev chip (which
    # admits the scaled 4xGRU-1024 decoder, ~45 MB bf16), 8 MB on the 16 MB
    # conservative baseline (falls back to the jnp scan).
    from .tpu_info import vmem_capacity_bytes

    return vmem_capacity_bytes() // 2


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def generation_kernel_supported(cfg: ModelConfig, batch: int) -> bool:
    if _interpret() or cfg.decoder_conditioning != "teacher_forced":
        return False
    # bf16-only kernel: a strict-fp32 config falls back to the fp32 lax.scan
    # path so the declared dtype is honored (VERDICT r4 next 4)
    from ..utils import matmul_dtype

    if matmul_dtype(cfg) != jnp.bfloat16:
        return False
    if batch % _B_BLK != 0:
        return False
    Hp = _round_up(cfg.gru_hidden, 128)
    Gp = 3 * Hp
    Cp = _round_up(cfg.charset_size, 128)
    wb = 2 * (Cp * Gp + Hp * Gp)  # layer 1: W_c + W_hh
    wb += 2 * (Hp * Gp + Hp * Gp) * (cfg.gru_layers - 1)
    wb += 2 * Hp * Cp  # output head
    return wb <= _weight_budget()


def _gate(gi, gh, h, Hp):
    r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
    n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
    return n + z * (h - n)


def _make_kernel(L: int, T: int, C: int, greedy: bool):
    def kernel(seed_ref, temp_ref, start_ref, giz1_ref, wc_ref, *refs):
        # refs: w_hh_1, b_hh_1, (w_ih_l, b_ih_l, w_hh_l, b_hh_l) for
        #       l=2..L, w_out, b_out, codes_ref (out)
        w_hh1, b_hh1 = refs[0], refs[1]
        rest = refs[2 : 2 + 4 * (L - 1)]
        w_out, b_out, codes_ref = refs[2 + 4 * (L - 1) :]
        Bb = giz1_ref.shape[0]
        Hp = w_hh1.shape[0]
        Cp = wc_ref.shape[0]

        if not greedy:
            # distinct stream per batch block
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        lane_c = jax.lax.broadcasted_iota(jnp.int32, (Bb, Cp), 1)
        neg_mask = jnp.where(lane_c >= C, -1e30, 0.0).astype(jnp.float32)
        giz1 = giz1_ref[:]

        def step(t, carry):
            prev, *hs = carry
            gi = giz1 + jnp.dot(
                prev.astype(jnp.bfloat16), wc_ref[:],
                preferred_element_type=jnp.float32,
            )
            gh = (
                jnp.dot(
                    hs[0].astype(jnp.bfloat16), w_hh1[:],
                    preferred_element_type=jnp.float32,
                )
                + b_hh1[:]
            )
            new_hs = [_gate(gi, gh, hs[0], Hp)]
            for l in range(1, L):
                w_ih, b_ih, w_hh, b_hh = rest[4 * (l - 1) : 4 * l]
                gi_l = (
                    jnp.dot(
                        new_hs[-1].astype(jnp.bfloat16), w_ih[:],
                        preferred_element_type=jnp.float32,
                    )
                    + b_ih[:]
                )
                gh_l = (
                    jnp.dot(
                        hs[l].astype(jnp.bfloat16), w_hh[:],
                        preferred_element_type=jnp.float32,
                    )
                    + b_hh[:]
                )
                new_hs.append(_gate(gi_l, gh_l, hs[l], Hp))
            logits = (
                jnp.dot(
                    new_hs[-1].astype(jnp.bfloat16), w_out[:],
                    preferred_element_type=jnp.float32,
                )
                + b_out[:]
                + neg_mask
            )
            if not greedy:
                bits = pltpu.bitcast(pltpu.prng_random_bits((Bb, Cp)), jnp.uint32)
                i24 = pltpu.bitcast(
                    jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
                )
                u = (i24.astype(jnp.float32) + 1.0) * (1.0 / (1 << 24))
                gumbel = -jnp.log(-jnp.log(u))
                # temperature is a traced SMEM scalar (not baked into the
                # kernel) so sweeping it never recompiles the decode loop
                logits = logits / temp_ref[0] + gumbel
            code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            codes_ref[t, :] = code
            prev_new = (lane_c == code[:, None]).astype(jnp.float32)
            return (prev_new, *new_hs)

        h0 = [jnp.zeros((Bb, Hp), jnp.float32) for _ in range(L)]
        # start token: zero vector (reference) or the learned one, padded
        prev0 = jnp.broadcast_to(start_ref[0], (Bb, Cp)).astype(jnp.float32)
        jax.lax.fori_loop(0, T, step, (prev0, *h0))

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "greedy"))
def fused_generate(
    dec_params,
    cfg: ModelConfig,
    z_emb: Array,
    key: Array,
    greedy: bool = True,
    temperature: float = 1.0,
) -> Array:
    """z_emb (B, latent) [already selu(linear_3(z))] -> codes (B, T) int32."""
    B = z_emb.shape[0]
    T, C, L = cfg.max_len, cfg.charset_size, cfg.gru_layers
    H = cfg.gru_hidden
    Hp = _round_up(H, 128)
    Gp = 3 * Hp
    Cp = _round_up(C, 128)
    gru = dec_params["gru"]

    # layer-1 input split: constant z part precomputed as one XLA GEMM,
    # one-hot part becomes the in-kernel (B, Cp) @ (Cp, Gp) matmul
    Lz = z_emb.shape[-1]
    w_ih1 = gru[0]["w_ih"]  # (Lz + C, 3H)
    giz1 = _pad_gates(
        jnp.dot(z_emb, w_ih1[:Lz], preferred_element_type=jnp.float32)
        + gru[0]["b_ih"],
        H,
        Hp,
    )  # (B, Gp) f32
    wc = _pad_gates(_pad_tail(w_ih1[Lz:], 0, Cp), H, Hp).astype(jnp.bfloat16)
    whh1 = _pad_gates(_pad_tail(gru[0]["w_hh"], 0, Hp), H, Hp).astype(jnp.bfloat16)
    bhh1 = _pad_gates(gru[0]["b_hh"], H, Hp)[None, :].astype(jnp.float32)

    rest = []
    for l in range(1, L):
        rest.append(
            _pad_gates(_pad_tail(gru[l]["w_ih"], 0, Hp), H, Hp).astype(jnp.bfloat16)
        )
        rest.append(_pad_gates(gru[l]["b_ih"], H, Hp)[None, :].astype(jnp.float32))
        rest.append(
            _pad_gates(_pad_tail(gru[l]["w_hh"], 0, Hp), H, Hp).astype(jnp.bfloat16)
        )
        rest.append(_pad_gates(gru[l]["b_hh"], H, Hp)[None, :].astype(jnp.float32))
    w_out = _pad_tail(
        _pad_tail(dec_params["linear_out"]["w"], 0, Hp), 1, Cp
    ).astype(jnp.bfloat16)
    b_out = _pad_tail(dec_params["linear_out"]["b"], 0, Cp)[None, :].astype(
        jnp.float32
    )
    seed = _seed_from_key(key)
    b_blk = _B_BLK if B % _B_BLK == 0 else B

    start = dec_params.get("start_token")
    start_p = _pad_tail(
        start.astype(jnp.float32)
        if start is not None
        else jnp.zeros((C,), jnp.float32),
        0,
        Cp,
    )[None, :]
    temp = jnp.reshape(jnp.asarray(temperature, jnp.float32), (1,))
    args = [seed, temp, start_p, giz1, wc, whh1, bhh1, *rest, w_out, b_out]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [
        pl.BlockSpec(
            ((b_blk, Gp) if a is giz1 else a.shape),
            functools.partial(
                (lambda nd, b: (b, 0)) if a is giz1 else (lambda nd, b: tuple([0] * nd)),
                a.ndim,
            ),
            memory_space=pltpu.VMEM,
        )
        for a in args[2:]
    ]
    codes_tb = pl.pallas_call(
        _make_kernel(L, T, C, greedy),
        grid=(B // b_blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (T, b_blk), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(*args)
    return jnp.swapaxes(codes_tb, 0, 1)
