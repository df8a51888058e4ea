"""Beam-search decoding: approximate-MAP sequences from a latent.

Beyond-reference capability (the reference decodes greedy/multinomial only,
SURVEY.md 2.10/3.4): greedy decoding commits to the locally best character
and cannot revise, which caps exact-string reconstruction; beam search
keeps the K best prefixes and returns the highest-probability completion.

TPU-native design: the beams ride the batch dimension — the GRU step runs
once per timestep on a (B*K, ·) batch (one MXU-shaped matmul, K times the
work of greedy but still one device program), and beam bookkeeping is a
`jax.lax.top_k` over (B, K*C) plus gathers, all inside a single `lax.scan`
over the static T. No host round-trips, no dynamic shapes.

Composes with the valence automaton (`latent/constrain.py`): with
``constrained=True`` the per-step legal-token mask is applied before
`log_softmax`, so scores are renormalized over *chemically legal*
continuations and every returned string is valid by construction —
constrained beam search over the valid-SMILES manifold.

Finished beams (pad emitted — pad is always a suffix, featurize.py
decode convention) are frozen: they can only extend with pad at logprob 0,
so their score stays comparable while live beams keep accumulating.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.charset import Charset, DEFAULT_CHARSET
from ..data.featurize import decode_codes
from ..nn.decoder import latent_embed
from ..nn.encoder import linear
from ..nn.gru import gru_stack_step

Array = jax.Array

_NEG = -1e30  # additive -inf that stays nan-free under summation


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam", "constrained", "charset")
)
def beam_generate(
    params,
    cfg: ModelConfig,
    z: Array,
    beam: int = 5,
    constrained: bool = False,
    charset: Charset = DEFAULT_CHARSET,
) -> Tuple[Array, Array]:
    """z: (B, L) -> (codes (B, T) int32, logprob (B,) of the best beam).

    Deterministic; `beam=1` reproduces greedy decoding. For 'repeat_z'
    models the decoder is non-autoregressive, so per-position argmax IS the
    mode — beam search reduces to greedy and this routes there."""
    dec = params["decoder"]
    B = z.shape[0]
    K = beam
    T, C = cfg.max_len, cfg.charset_size
    pad_id = charset.chars.index(" ") if " " in charset.chars else 0

    if cfg.decoder_conditioning == "repeat_z":
        import dataclasses

        from .sample import generate

        # force the scan path: this branch consumes logits, which the fused
        # generation kernel never materializes (generate's contract note)
        codes, logits = generate(
            params, dataclasses.replace(cfg, use_pallas_generation=False),
            z, greedy=True, constrained=constrained, charset=charset,
        )
        if constrained:
            # renormalize over the LEGAL tokens, matching the
            # autoregressive branch's mask-then-log_softmax (review
            # finding: raw-softmax scores included illegal tokens' mass
            # and were not comparable across decoder_conditioning modes).
            # One automaton replay over the chosen codes rebuilds the
            # per-step masks.
            from .constrain import (
                advance as con_adv,
                build_tables,
                init_state as con_init,
                step_mask_rem,
            )

            tb = build_tables(charset)

            def msk(st, inp):
                t, tok_t = inp
                m = step_mask_rem(tb, st, T - 1 - t)
                return con_adv(tb, st, tok_t), m

            _, masks_t = jax.lax.scan(
                msk,
                con_init(B, T),
                (jnp.arange(T), jnp.swapaxes(codes, 0, 1)),
            )
            logits = jnp.where(
                jnp.swapaxes(masks_t, 0, 1), logits, _NEG
            )
        logp = jax.nn.log_softmax(logits, axis=-1)
        best = jnp.sum(
            jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0],
            axis=-1,
        )
        return codes, best

    con_tb = None
    if constrained:
        from .constrain import advance, build_tables, init_state, step_mask

        if charset.size != C:
            raise ValueError(
                "constrained beam search: model charset_size "
                f"{C} != charset size {charset.size}"
            )
        con_tb = build_tables(charset)

    z_emb = latent_embed(dec, cfg, z)  # (B, E)
    z_tiled = jnp.repeat(z_emb, K, axis=0)  # (B*K, E)

    L = len(dec["gru"])
    H = dec["gru"][0]["w_hh"].shape[0]
    h0 = jnp.zeros((L, B * K, H), jnp.float32)
    start = dec.get("start_token")
    prev0 = (
        jnp.broadcast_to(start.astype(jnp.float32)[None, :], (B * K, C))
        if start is not None
        else jnp.zeros((B * K, C), jnp.float32)
    )
    # only beam 0 is live at t=0, so top-k picks K *distinct* first tokens
    scores0 = jnp.full((B, K), _NEG, jnp.float32).at[:, 0].set(0.0)
    buf0 = jnp.zeros((B, K, T), jnp.int32)
    done0 = jnp.zeros((B, K), bool)
    cst0 = init_state(B * K, T) if constrained else None

    pad_only = jnp.full((C,), _NEG, jnp.float32).at[pad_id].set(0.0)

    def gather_beams(x, parent):
        """x: (B*K, ...); parent: (B, K) int32 — reindex beams per row."""
        xk = x.reshape((B, K) + x.shape[1:])
        idx = parent.reshape((B, K) + (1,) * (xk.ndim - 2))
        return jnp.take_along_axis(xk, idx.astype(jnp.int32), axis=1).reshape(
            x.shape
        )

    def gather_hs(hs, parent):
        """hs: (L, B*K, H) — beam reindex on the middle axis."""
        hk = hs.reshape(L, B, K, H)
        idx = parent[None, :, :, None].astype(jnp.int32)
        return jnp.take_along_axis(hk, idx, axis=2).reshape(L, B * K, H)

    def step(carry, t):
        hs, prev, scores, buf, done, cst = carry
        x_t = jnp.concatenate([z_tiled, prev], axis=-1)
        hs_new, out = gru_stack_step(dec["gru"], hs, x_t)
        logits_t = linear(dec["linear_out"], out)  # (B*K, C)
        if constrained:
            m = step_mask(con_tb, cst, t, T)
            logits_t = jnp.where(m, logits_t, _NEG)
        logp = jax.nn.log_softmax(logits_t, axis=-1)  # (B*K, C)
        # frozen beams extend only with pad, at no cost
        logp = jnp.where(done.reshape(B * K)[:, None], pad_only[None, :], logp)
        cand = scores[:, :, None] + logp.reshape(B, K, C)  # (B, K, C)
        new_scores, flat_idx = jax.lax.top_k(cand.reshape(B, K * C), K)
        parent = flat_idx // C  # (B, K)
        token = (flat_idx % C).astype(jnp.int32)  # (B, K)

        hs_new = gather_hs(hs_new, parent)
        buf = gather_beams(buf.reshape(B * K, T), parent).reshape(B, K, T)
        buf = buf.at[:, :, t].set(token)
        done = gather_beams(done.reshape(B * K), parent).reshape(B, K)
        done = done | (token == pad_id)
        prev_new = jax.nn.one_hot(
            token.reshape(B * K), C, dtype=jnp.float32
        )
        if constrained:
            cst = jax.tree.map(lambda a: gather_beams(a, parent), cst)
            cst = advance(con_tb, cst, token.reshape(B * K))
        return (hs_new, prev_new, new_scores, buf, done, cst), None

    carry0 = (h0, prev0, scores0, buf0, done0, cst0)
    (_, _, scores, buf, _, _), _ = jax.lax.scan(
        step, carry0, jnp.arange(T)
    )
    best = jnp.argmax(scores, axis=1)  # (B,)
    codes = jnp.take_along_axis(buf, best[:, None, None], axis=1)[:, 0]
    return codes, jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


def beam_reconstruct(
    params,
    cfg: ModelConfig,
    smiles: List[str],
    beam: int = 5,
    charset: Charset = DEFAULT_CHARSET,
    constrained: bool = False,
) -> List[str]:
    """encode -> mu -> beam-search decode -> strings."""
    from ..data.featurize import encode_smiles
    from ..nn.vae import encode as vae_encode

    codes = jnp.asarray(encode_smiles(smiles, charset, cfg.max_len))
    mu, _ = vae_encode(params, cfg, codes)
    out_codes, _ = beam_generate(
        params, cfg, mu, beam=beam, constrained=constrained, charset=charset
    )
    return decode_codes(out_codes, charset)
