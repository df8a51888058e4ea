"""KL-annealed ELBO (+ optional multi-task property loss) and metrics.

Reference parity (SURVEY.md 2.6, 3.3):
  * recon: per-character cross-entropy of the decoder distribution vs the
    ground-truth characters, summed over the 120 positions ('ce' mode, the
    spec per BASELINE.json:5). The compact-port variant - elementwise binary
    cross-entropy of softmax probabilities vs the one-hot targets
    (``F.binary_cross_entropy(softmax(out), x, size_average=False)``) - is
    kept as 'bce' for parity experiments (SURVEY.md note on 2.6).
  * kl: -0.5 * sum(1 + logvar - mu^2 - exp(logvar)).
  * total = recon + beta(step) * kl, beta from train/schedules.py.

Reduction convention: per-molecule sums, batch MEAN (the reference sums over
the batch too; mean makes gradients batch-size invariant - identical
trajectory up to the lr scale, and parity tests compare per-sample sums
exactly).

Everything is fp32 even under the bf16 matmul policy (SURVEY.md section 7).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.featurize import one_hot

Array = jax.Array


def recon_ce(logits: Array, codes: Array) -> Array:
    """Per-sample summed cross-entropy. logits (B,T,C), codes (B,T) -> (B,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, codes[..., None].astype(jnp.int32), axis=-1)
    return jnp.sum(nll[..., 0], axis=-1)


def recon_bce(logits: Array, codes: Array, charset_size: int) -> Array:
    """Compact-port BCE-on-softmax, per-sample sum. Matches
    torch.nn.functional.binary_cross_entropy(softmax(logits), onehot)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    x = one_hot(codes, charset_size)
    eps = 1e-12
    bce = -(x * jnp.log(probs + eps) + (1.0 - x) * jnp.log(1.0 - probs + eps))
    return jnp.sum(bce, axis=(-1, -2))


def gaussian_kl(mu: Array, logvar: Array) -> Array:
    """Per-sample KL(q(z|x) || N(0, I)): -0.5*sum(1+logvar-mu^2-e^logvar)."""
    return jnp.sum(gaussian_kl_per_dim(mu, logvar), axis=-1)


def gaussian_kl_per_dim(mu: Array, logvar: Array) -> Array:
    """Per-dimension KL terms (B, L): the summands of gaussian_kl. Needed by
    the free-bits floor, which clips each dim separately."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * (1.0 + logvar - mu * mu - jnp.exp(logvar))


def recon_accuracy(logits: Array, codes: Array, pad_index: int = 0) -> Tuple[Array, Array]:
    """(teacher-forced) char accuracy: over all T positions, and non-pad only.
    The >=95%-at-epoch-50 target (BASELINE.json:2,5) is the all-positions one
    (the reference scores all 120 chars including padding)."""
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == codes).astype(jnp.float32)
    acc_all = jnp.mean(hit)
    nonpad = (codes != pad_index).astype(jnp.float32)
    acc_nonpad = jnp.sum(hit * nonpad) / jnp.maximum(jnp.sum(nonpad), 1.0)
    return acc_all, acc_nonpad


def vae_loss(
    cfg: ModelConfig,
    logits: Array,
    codes: Array,
    mu: Array,
    logvar: Array,
    beta: Array,
    properties_pred: Optional[Array] = None,
    properties_true: Optional[Array] = None,
    property_loss_weight: float = 1.0,
    kl: Optional[Array] = None,
    kl_free_bits: float = 0.0,
) -> Tuple[Array, Dict[str, Array]]:
    """Returns (scalar loss, metrics dict). All metrics are batch means.
    ``kl`` may be supplied precomputed (fused Pallas sampler path).
    ``kl_free_bits`` > 0 floors each latent dim's KL at that many nats in
    the LOSS term only (config KLScheduleConfig.free_bits; the reported
    'kl' metric stays the true KL) — dims under the floor contribute a
    constant, so the objective stops collapsing them toward the prior."""
    if cfg.recon_loss == "ce":
        recon = recon_ce(logits, codes)
    else:
        recon = recon_bce(logits, codes, cfg.charset_size)
    if kl is None:
        kl = gaussian_kl(mu, logvar)
    if kl_free_bits > 0.0:
        # per-dim floor needs the summands, not the (possibly precomputed)
        # total; mu/logvar are always available and this is elementwise.
        kl_loss = jnp.sum(
            jnp.maximum(gaussian_kl_per_dim(mu, logvar), kl_free_bits), axis=-1
        )
    else:
        kl_loss = kl
    elbo_terms = recon + beta * kl_loss
    loss = jnp.mean(elbo_terms)

    metrics: Dict[str, Array] = {
        "loss": loss,
        "recon": jnp.mean(recon),
        "kl": jnp.mean(kl),
        "elbo": jnp.mean(recon + kl),  # beta=1 ELBO, comparable across schedules
        "beta": jnp.asarray(beta, jnp.float32),
    }
    acc_all, acc_nonpad = recon_accuracy(logits, codes)
    metrics["acc"] = acc_all
    metrics["acc_nonpad"] = acc_nonpad

    # In-batch proxy of evaluate.posterior_prior_metrics' post_std_mean
    # (aggregate-z std per dim, including the eps-scaled encoder noise;
    # prior: 1). Posterior collapse drives it toward ~eps_scale (round 4
    # measured 0.015 on collapsed stack-kernel runs vs O(0.1-1) healthy),
    # so the train loop's collapse guard (TrainConfig.collapse_std_floor)
    # can catch a collapsing run at log cadence instead of burning the
    # full step budget (VERDICT r4 next 1). Elementwise + one batch
    # reduction: free next to the GRU step.
    mu32 = mu.astype(jnp.float32)
    logvar32 = logvar.astype(jnp.float32)
    var_z = jnp.var(mu32, axis=0) + (cfg.eps_scale**2) * jnp.mean(
        jnp.exp(logvar32), axis=0
    )
    metrics["post_std_batch"] = jnp.mean(jnp.sqrt(var_z))

    if properties_pred is not None and properties_true is not None:
        # Targets are standardized per property when the config carries stats
        # (VERDICT r1 weak 7: raw SAS~1-10 / logP~+-5 swamp QED's (0,1)
        # gradient in an unnormalized sum). The head predicts in the same
        # normalized space; inference de-normalizes
        # (nn.property_head.denormalize_properties).
        from ..nn.property_head import normalize_targets

        target = normalize_targets(cfg, properties_true)
        per_prop = jnp.mean((properties_pred - target) ** 2, axis=0)  # (P,)
        prop_mse = jnp.sum(per_prop)
        loss = loss + property_loss_weight * prop_mse
        metrics["prop_mse"] = prop_mse
        for i in range(cfg.n_properties):
            metrics[f"prop_mse_{i}"] = per_prop[i]
        metrics["loss"] = loss
    return loss, metrics
