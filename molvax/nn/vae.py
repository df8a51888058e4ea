"""MolecularVAE: encode / reparameterize / decode / forward.

Reference parity (SURVEY.md L2, 2.3-2.5, 3.2): same public API surface as the
reference `nn.Module` - ``encode(x) -> (mu, logvar)``,
``reparameterize/sampling``, ``decode(z)``, ``forward(x) -> (y, mu, logvar)``
- expressed functionally: params are an explicit pytree, every entry point is
jit-compatible, PRNG keys are threaded explicitly (SURVEY.md section 7, PRNG
discipline).

TPU-native design: inputs are uint8 code arrays; one-hot happens inside the
traced function and fuses into the encoder. The params pytree is what gets
sharded by GSPMD (replicated over the 'data' mesh axis) and checkpointed by
orbax.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.featurize import one_hot
from .decoder import decode as _decode
from .decoder import init_decoder_params
from .encoder import encode as _encode
from .encoder import init_encoder_params
from .property_head import init_property_head_params, predict_properties

Array = jax.Array
Params = Dict[str, Any]


class VAEOutput(NamedTuple):
    logits: Array  # (B, T, C) decoder logits
    mu: Array  # (B, L)
    logvar: Array  # (B, L)
    z: Array  # (B, L) sampled latent
    properties: Optional[Array] = None  # (B, P) if the head is configured
    kl: Optional[Array] = None  # (B,) per-sample KL when the fused sampler ran


def init_vae_params(key: Array, cfg: ModelConfig) -> Params:
    k_enc, k_dec, k_prop = jax.random.split(key, 3)
    params: Params = {
        "encoder": init_encoder_params(k_enc, cfg),
        "decoder": init_decoder_params(k_dec, cfg),
    }
    if cfg.n_properties > 0:
        params["property_head"] = init_property_head_params(k_prop, cfg)
    return params


def encode(params: Params, cfg: ModelConfig, codes: Array) -> Tuple[Array, Array]:
    """codes: (B, T) uint8/int -> (mu, logvar). One-hot happens on device."""
    x = one_hot(codes, cfg.charset_size)
    return _encode(params["encoder"], cfg, x)


def reparameterize(
    key: Array, mu: Array, logvar: Array, eps_scale: float = 1.0
) -> Array:
    """z = mu + eps_scale * exp(0.5*logvar) * eps, eps ~ N(0, I)
    (SURVEY.md 2.4; compact ports scale eps by 1e-2 - cfg.eps_scale)."""
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + eps_scale * jnp.exp(0.5 * logvar) * eps


def decode(
    params: Params,
    cfg: ModelConfig,
    z: Array,
    teacher_codes: Optional[Array] = None,
) -> Array:
    """z -> logits (B, T, C). teacher_codes (B, T) required for
    teacher-forced decoding; see molvax.latent.sample for free-running."""
    teacher = (
        one_hot(teacher_codes, cfg.charset_size) if teacher_codes is not None else None
    )
    return _decode(params["decoder"], cfg, z, teacher)


def forward(
    params: Params,
    cfg: ModelConfig,
    key: Array,
    codes: Array,
    ss_prob: Optional[Array] = None,
    wd_prob: Optional[Array] = None,
) -> VAEOutput:
    """Full training-path forward: codes (B, T) -> VAEOutput.

    With ``cfg.use_pallas`` on TPU, the encoder runs as the fused Pallas
    kernel (one-hot never leaves VMEM) and z/KL come from the fused on-chip
    sampler (a different - still key-deterministic - noise stream than
    jax.random.normal; see molvax/kernels/sampler.py).

    ``ss_prob`` (traced scalar) enables parallel two-pass scheduled sampling
    (VERDICT r1 weak 6): a first teacher-forced decode produces the model's
    own predictions; each input character is then replaced by its (argmax,
    stop-gradient) prediction with probability ss_prob and the loss-bearing
    decode runs on the mixed inputs. Keeps training batch-parallel — no
    sequential sampling loop — at the cost of a second decode pass. Pass
    None (not 0.0) when off so the extra pass never enters the graph.

    ``wd_prob`` (traced scalar) applies word dropout (Bowman et al. 2016) to
    the teacher inputs: each teacher character's one-hot row is zeroed with
    probability wd_prob, so the decoder cannot lean on local context alone
    and must route molecule identity through z. This attacks strong-decoder
    posterior collapse, which beta annealing and free bits only soften
    (measured round 2: at beta=1 the latent carried length but no character
    identity — free-running round-trip non-pad accuracy ~9%). Pass None
    when off."""
    kl = None
    # The fused encoder kernel is bf16-matmul by design; a strict-fp32
    # config (compute_dtype='float32', the honored dtype contract) takes
    # the XLA encode path, which runs exactly the declared dtype. The
    # fused sampler is fp32-internal either way.
    from ..utils import matmul_dtype

    if (
        cfg.use_pallas
        and _use_pallas_here()
        and matmul_dtype(cfg) == jnp.bfloat16
    ):
        from ..kernels.conv_enc import fused_encode
        from ..kernels.sampler import fused_sample_kl

        mu, logvar = fused_encode(params["encoder"], cfg, codes)
        z, kl = fused_sample_kl(key, mu, logvar, cfg.eps_scale)
    else:
        mu, logvar = encode(params, cfg, codes)
        z = reparameterize(key, mu, logvar, cfg.eps_scale)
    teacher = codes if cfg.decoder_conditioning == "teacher_forced" else None
    if ss_prob is not None and teacher is not None:
        pass1 = decode(params, cfg, jax.lax.stop_gradient(z), teacher)
        pred = jnp.argmax(jax.lax.stop_gradient(pass1), axis=-1).astype(codes.dtype)
        k_mix = jax.random.fold_in(key, 0x5C4ED)
        mix = jax.random.bernoulli(k_mix, ss_prob, codes.shape)
        teacher = jnp.where(mix, pred, codes)
    if wd_prob is not None and teacher is not None:
        # drop to the ZERO vector (not the pad char, which is a real symbol)
        toh = one_hot(teacher, cfg.charset_size)
        k_wd = jax.random.fold_in(key, 0xD409)
        drop = jax.random.bernoulli(k_wd, wd_prob, teacher.shape)
        toh = jnp.where(drop[..., None], jnp.zeros_like(toh), toh)
        logits = _decode(params["decoder"], cfg, z, toh)
    else:
        logits = decode(params, cfg, z, teacher)
    props = None
    if cfg.n_properties > 0 and "property_head" in params:
        props = predict_properties(params["property_head"], cfg, z)
    return VAEOutput(
        logits=logits, mu=mu, logvar=logvar, z=z, properties=props, kl=kl
    )


def _use_pallas_here() -> bool:
    from ..kernels import pallas_enabled

    return pallas_enabled()


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
