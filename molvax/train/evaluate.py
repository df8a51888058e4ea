"""Headline evaluation: teacher-forced metrics, generation quality,
round-trip reconstruction.

Reference parity: the reference's implicit eval is teacher-forced recon
accuracy + eyeballing sampled strings (SURVEY.md 2.9, 4). Here those become
measured quantities, plus the MOSES-style sample-quality metrics that the
scaled preset targets (BASELINE.json:10): validity (grammar-level - no RDKit
offline, SURVEY.md section 7), uniqueness, and novelty vs the training set.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.charset import Charset, DEFAULT_CHARSET
from ..data.featurize import decode_codes, is_valid_smiles
from ..data.smiles_check import chem_valid, chem_valid_fraction
from ..data.native import decode_codes_native
from ..data.zinc import Dataset
from ..latent.sample import generate
from ..nn import vae

Array = jax.Array


def novelty_reference(dataset: Dataset, cap: int = 50000) -> set:
    """The decoded training-string set against which novelty is scored.
    Build ONCE per evaluate() and pass to the *_metrics functions via
    ``train_set`` — rebuilding it per metric decoded the 50k-row corpus
    up to 7 times per report (round-3 review finding)."""
    return set(
        decode_codes_native(
            dataset.codes[: min(len(dataset), cap)], dataset.charset
        )
    )


def _sample_quality(smiles, valid_smiles, train_set: Optional[set]):
    """(valid_frac, uniqueness-among-valid, novelty-of-unique-valid,
    mean_len) — the shared MOSES-convention block (VERDICT r2 weak 5)."""
    uniq_valid = set(valid_smiles)
    novelty = 1.0
    if train_set is not None:
        novelty = len([s for s in uniq_valid if s not in train_set]) / max(
            len(uniq_valid), 1
        )
    return (
        len(valid_smiles) / max(len(smiles), 1),
        len(uniq_valid) / max(len(valid_smiles), 1),
        novelty,
        float(np.mean([len(s) for s in smiles])),
    )


def teacher_forced_metrics(
    state, cfg: Config, dataset: Dataset, batches: int = 8
) -> Dict[str, float]:
    """Mean ELBO / recon / KL / char accuracy over held-out batches."""
    from .loop import make_eval_step

    eval_step = make_eval_step(cfg)
    B = cfg.train.batch_size
    out: List[Dict] = []
    for i in range(batches):
        lo = (i * B) % max(len(dataset) - B, 1)
        codes = jnp.asarray(dataset.codes[lo : lo + B])
        props = (
            jnp.asarray(dataset.properties[lo : lo + B])
            if dataset.properties is not None and cfg.model.n_properties > 0
            else None
        )
        out.append(eval_step(state, codes, props))
    return {
        k: float(np.mean([np.asarray(m[k]) for m in out])) for k in out[0]
    }


def generation_metrics(
    params,
    cfg: Config,
    key: Array,
    n: int = 1000,
    train_dataset: Optional[Dataset] = None,
    charset: Optional[Charset] = None,
    temperature: float = 1.0,
    train_set: Optional[set] = None,
) -> Dict[str, float]:
    """MOSES-style sample quality from the prior: validity (grammar),
    uniqueness among valid samples, novelty of the unique valid samples vs
    the training corpus, mean length (VERDICT r2 weak 5: both uniqueness and
    novelty follow the MOSES convention and count only valid strings).
    ``train_set`` short-circuits the novelty-reference rebuild (see
    `novelty_reference`)."""
    if charset is None:
        charset = train_dataset.charset if train_dataset is not None else DEFAULT_CHARSET
    if charset.size < cfg.model.charset_size:
        # a smaller decode table than the model's code range would index
        # out of bounds deep in featurize; a LARGER table is safe (tiny
        # test models emit codes < charset_size <= table size)
        raise ValueError(
            f"charset size {charset.size} < model charset_size "
            f"{cfg.model.charset_size}: pass the training charset (the "
            "DEFAULT_CHARSET fallback cannot decode a larger model's codes)"
        )
    if train_set is None and train_dataset is not None:
        train_set = novelty_reference(train_dataset)
    k_z, k_g = jax.random.split(key)
    z = jax.random.normal(k_z, (n, cfg.model.latent_dim), jnp.float32)
    codes, _ = generate(
        params, cfg.model, z, k_g, greedy=False, temperature=temperature
    )
    smiles = decode_codes(codes, charset)
    valid, uniq, novelty, mean_len = _sample_quality(
        smiles, [s for s in smiles if is_valid_smiles(s, charset)], train_set
    )
    return {
        "gen_valid": valid,
        # chemistry-level validity (real parser with valence accounting,
        # data/smiles_check.py) — meaningful when training on
        # 'synthetic_chem' or real corpora; near zero on the grammar-level
        # synthetic corpus whose own training data is chemically invalid
        "gen_chem_valid": chem_valid_fraction(smiles),
        "gen_unique": uniq,
        "gen_novelty": novelty,
        "gen_mean_len": mean_len,
    }


def constrained_generation_metrics(
    params,
    cfg: Config,
    key: Array,
    n: int = 256,
    train_dataset: Optional[Dataset] = None,
    charset: Optional[Charset] = None,
    temperature: float = 1.0,
    train_set: Optional[set] = None,
) -> Dict[str, float]:
    """Sample quality from the prior under valence-constrained decoding
    (`latent/constrain.py`): the automaton masks parser-illegal tokens at
    each step, so ``con_chem_valid`` is 1.0 by construction — the numbers
    that matter are uniqueness/novelty/length, i.e. whether the model still
    produces diverse molecules when confined to the valid-SMILES manifold."""
    if charset is None:
        charset = (
            train_dataset.charset if train_dataset is not None else DEFAULT_CHARSET
        )
    if train_set is None and train_dataset is not None:
        train_set = novelty_reference(train_dataset)
    k_z, k_g = jax.random.split(key)
    z = jax.random.normal(k_z, (n, cfg.model.latent_dim), jnp.float32)
    codes, _ = generate(
        params, cfg.model, z, k_g, greedy=False, temperature=temperature,
        constrained=True, charset=charset,
    )
    smiles = decode_codes(codes, charset)
    valid, uniq, novelty, mean_len = _sample_quality(
        smiles, [s for s in smiles if chem_valid(s)], train_set
    )
    return {
        "con_chem_valid": valid,
        "con_unique": uniq,
        "con_novelty": novelty,
        "con_mean_len": mean_len,
    }


def reconstruction_metrics(
    params,
    cfg: Config,
    dataset: Dataset,
    key: Array,
    n: int = 256,
    charset: Optional[Charset] = None,
) -> Dict[str, float]:
    """Free-running round trip (encode -> z=mu -> greedy decode): exact-match
    string rate and per-char accuracy. Stricter than the teacher-forced
    target - the decoder consumes its own samples."""
    charset = charset or dataset.charset
    codes = jnp.asarray(dataset.codes[:n])
    mu, _ = vae.encode(params, cfg.model, codes)
    out_codes, _ = generate(params, cfg.model, mu, key, greedy=True)
    inp = decode_codes(codes, charset)
    out = decode_codes(out_codes, charset)
    exact = float(np.mean([a == b for a, b in zip(inp, out)]))
    hit = np.asarray(out_codes) == np.asarray(codes)
    char_acc = float(np.mean(hit))
    # All-positions accuracy is inflated by the pad tail (~2/3 of T=120 on
    # ZINC-length strings); the non-pad number is the honest one.
    nonpad = np.asarray(codes) != 0
    char_acc_nonpad = float(hit[nonpad].mean()) if nonpad.any() else 1.0
    return {
        "recon_exact": exact,
        "recon_char_acc": char_acc,
        "recon_char_acc_nonpad": char_acc_nonpad,
    }


def beam_reconstruction_metrics(
    params,
    cfg: Config,
    dataset: Dataset,
    n: int = 256,
    beam: int = 5,
    charset: Optional[Charset] = None,
) -> Dict[str, float]:
    """Round trip with beam-search decoding (latent/beam.py): the
    approximate-MAP string instead of the greedy one. Reported next to
    `recon_exact` to show what decode-time search buys on the same model."""
    from ..latent.beam import beam_generate

    charset = charset or dataset.charset
    codes = jnp.asarray(dataset.codes[:n])
    mu, _ = vae.encode(params, cfg.model, codes)
    out_codes, _ = beam_generate(params, cfg.model, mu, beam=beam)
    inp = decode_codes(codes, charset)
    out = decode_codes(out_codes, charset)
    exact = float(np.mean([a == b for a, b in zip(inp, out)]))
    hit = np.asarray(out_codes) == np.asarray(codes)
    nonpad = np.asarray(codes) != 0
    return {
        "recon_beam_exact": exact,
        "recon_beam_char_acc_nonpad": (
            float(hit[nonpad].mean()) if nonpad.any() else 1.0
        ),
    }


def interpolation_metrics(
    params,
    cfg: Config,
    dataset: Dataset,
    key: Array,
    n_pairs: int = 64,
    steps: int = 9,
    charset: Optional[Charset] = None,
    spherical: bool = True,
) -> Dict[str, float]:
    """Latent-interpolation quality over random held-out pairs (VERDICT r2
    next 3; BASELINE.json:11 names interpolation a workload — this makes it
    a measured one).

    * interp_valid          — fraction of grammar-valid decoded waypoints
    * interp_endpoint_exact — endpoint decodes exactly recovering the inputs
    * interp_endpoint_char  — endpoint non-pad char accuracy vs the inputs
    * interp_distinct       — mean (#unique strings along a path) / steps:
                              ~1 = every waypoint differs (smooth morphing),
                              ~2/steps = the path teleports endpoint-to-
                              endpoint with no intermediate structure.
    """
    from ..latent.interpolate import lerp, slerp

    charset = charset or dataset.charset
    n_pairs = min(n_pairs, len(dataset) // 2)
    if n_pairs < 1:
        raise ValueError(
            f"interpolation_metrics needs >= 2 molecules, got {len(dataset)}"
        )
    k_pick, k_gen = jax.random.split(key)
    idx = np.asarray(
        jax.random.choice(
            k_pick, len(dataset), (2 * n_pairs,), replace=False
        )
    )
    codes = jnp.asarray(dataset.codes[idx])
    mu, _ = vae.encode(params, cfg.model, codes)
    z0, z1 = mu[:n_pairs], mu[n_pairs:]
    t = jnp.linspace(0.0, 1.0, steps)[None, :, None]  # (1, steps, 1)
    fn = slerp if spherical else lerp
    zs = fn(z0[:, None, :], z1[:, None, :], t)  # (pairs, steps, L)
    out_codes, _ = generate(
        params, cfg.model, zs.reshape(-1, zs.shape[-1]), k_gen, greedy=True
    )
    smiles = decode_codes(out_codes, charset)
    paths = [smiles[i * steps : (i + 1) * steps] for i in range(n_pairs)]
    inputs = decode_codes(codes, charset)

    valid = float(
        np.mean([is_valid_smiles(s, charset) for p in paths for s in p])
    )
    ends = [(p[0], inputs[i]) for i, p in enumerate(paths)] + [
        (p[-1], inputs[n_pairs + i]) for i, p in enumerate(paths)
    ]
    exact = float(np.mean([a == b for a, b in ends]))
    # endpoint char accuracy on the encoded grid (non-pad positions)
    end_codes = np.asarray(out_codes).reshape(n_pairs, steps, -1)
    end_pred = np.concatenate([end_codes[:, 0], end_codes[:, -1]], axis=0)
    end_true = np.asarray(codes)
    nonpad = end_true != 0
    char = float((end_pred == end_true)[nonpad].mean()) if nonpad.any() else 1.0
    distinct = float(np.mean([len(set(p)) / steps for p in paths]))
    return {
        "interp_valid": valid,
        "interp_chem_valid": chem_valid_fraction(
            [s for p in paths for s in p]
        ),
        "interp_endpoint_exact": exact,
        "interp_endpoint_char": char,
        "interp_distinct": distinct,
    }


def posterior_prior_metrics(
    params, cfg: Config, dataset: Dataset, n: int = 4096
) -> Dict[str, float]:
    """How far the aggregate posterior sits from the N(0, I) prior the
    sampling workloads draw from (VERDICT r2 weak 6: without this number
    a preset cannot see its own prior-mismatch failure mode).

    * post_mean_norm — ||E[mu]|| (prior: 0)
    * post_std_mean  — mean over dims of std(z_d) including the eps-scaled
                       encoder noise (prior: 1)
    * post_prior_w2  — diagonal-Gaussian 2-Wasserstein distance
                       sqrt(||E[z]||^2 + sum_d (std_d - 1)^2): 0 = match;
                       large = prior samples land off the posterior manifold
                       and `fit_aggregate_posterior` sampling is advised.
    """
    from ..latent.embed import encode_codes_chunked

    mu_all, logvar_all = encode_codes_chunked(
        params, cfg.model, dataset.codes[: min(len(dataset), n)], batch=512
    )
    mu_all = mu_all.astype(np.float64)
    var_z = mu_all.var(axis=0) + cfg.model.eps_scale**2 * np.exp(
        logvar_all.astype(np.float64)
    ).mean(axis=0)
    mean = mu_all.mean(axis=0)
    std = np.sqrt(var_z)
    w2 = float(np.sqrt(np.sum(mean**2) + np.sum((std - 1.0) ** 2)))
    return {
        "post_mean_norm": float(np.linalg.norm(mean)),
        "post_std_mean": float(std.mean()),
        "post_prior_w2": w2,
    }


def aggregate_generation_metrics(
    params,
    cfg: Config,
    key: Array,
    dataset: Dataset,
    n: int = 1000,
    temperature: float = 1.0,
    train_set: Optional[set] = None,
    fit=None,
) -> Dict[str, float]:
    """generation_metrics, but sampling z from the fitted aggregate
    posterior N(mean, cov) instead of the prior (VERDICT r2 next 1): keys
    ``agg_valid`` / ``agg_unique`` / ``agg_novelty`` / ``agg_mean_len``.

    ``fit``: a precomputed ``(mean, chol)`` from fit_aggregate_posterior —
    pass it when sweeping (e.g. temperatures) so the 20k-molecule encode +
    covariance fit runs once, not once per call (review finding round 5)."""
    from ..latent.sample import fit_aggregate_posterior, sample_aggregate

    charset = dataset.charset
    if train_set is None:
        train_set = novelty_reference(dataset)
    mean, chol = (
        fit
        if fit is not None
        else fit_aggregate_posterior(params, cfg.model, dataset.codes)
    )
    smiles = sample_aggregate(
        params,
        cfg.model,
        n,
        key,
        mean,
        chol,
        charset=charset,
        greedy=False,
        temperature=temperature,
    )
    valid, uniq, novelty, mean_len = _sample_quality(
        smiles, [s for s in smiles if is_valid_smiles(s, charset)], train_set
    )
    return {
        "agg_valid": valid,
        "agg_chem_valid": chem_valid_fraction(smiles),
        "agg_unique": uniq,
        "agg_novelty": novelty,
        "agg_mean_len": mean_len,
    }


def optimization_metrics(
    params,
    cfg: Config,
    dataset: Dataset,
    key: Array,
    n: int = 64,
    steps: int = 100,
    lr: float = 0.05,
    property_index: int = 0,
    charset: Optional[Charset] = None,
    constrained: bool = False,
    variants=None,
) -> Dict[str, float]:
    """The ChemVAE headline loop, closed offline (SURVEY.md 2.10/2.11,
    BASELINE.json:11): encode molecules -> gradient-ascend the property
    head's prediction in z (latent/optimize.py) -> greedy-decode -> and
    RE-compute the property on the decoded strings with the structural
    calculator (data/properties.py). The lift is scored in actual computed
    property units on the decoded molecules, not the head's belief:

    * opt_pred_lift  — mean predicted gain the head claims (de-normalized)
    * opt_real_lift  — mean computed gain, optimized decode vs seed decode,
                       over pairs where both decodes parse chemically
    * opt_chem_valid — fraction of optimized decodes that parse chemically
    * opt_pairs      — number of scored pairs behind opt_real_lift

    ``constrained=True`` decodes both the seed and the optimized latent
    under the valence automaton (`latent/constrain.py`) — chem_valid
    becomes 1.0 by construction and every pair scores, so opt_real_lift is
    measured over the full batch instead of the subset that happened to
    parse. Keys gain the prefix ``opt_con_``."""
    from ..data.properties import properties_of
    from ..latent.optimize import default_objective, optimize_z

    charset = charset or dataset.charset
    codes = jnp.asarray(dataset.codes[:n])
    mu, _ = vae.encode(params, cfg.model, codes)
    objective = default_objective(cfg.model, property_index=property_index)
    result = optimize_z(
        params, cfg.model, mu, objective=objective, steps=steps, lr=lr
    )
    k1, k2 = jax.random.split(key)
    pred_lift = float(jnp.mean(result.objective - result.objective_start))
    out: Dict[str, float] = {}
    # the 100-step optimization above is the expensive part and is shared:
    # each variant only re-DECODES the same latents (review finding round
    # 3 — evaluate() previously re-ran the whole optimization to add the
    # constrained decode)
    for con in variants if variants is not None else (constrained,):
        seed_codes, _ = generate(
            params, cfg.model, mu, k1, greedy=True,
            constrained=con, charset=charset,
        )
        opt_codes, _ = generate(
            params, cfg.model, result.z, k2, greedy=True,
            constrained=con, charset=charset,
        )
        seed_smiles = decode_codes(seed_codes, charset)
        opt_smiles = decode_codes(opt_codes, charset)
        lifts = []
        chem_ok = 0
        for s0, s1 in zip(seed_smiles, opt_smiles):
            p1 = properties_of(s1)
            if p1 is not None:
                chem_ok += 1
            p0 = properties_of(s0)
            if p0 is not None and p1 is not None:
                lifts.append(p1[property_index] - p0[property_index])
        pre = "opt_con_" if con else "opt_"
        out.update({
            pre + "pred_lift": pred_lift,
            pre + "real_lift": float(np.mean(lifts)) if lifts else 0.0,
            pre + "chem_valid": chem_ok / max(len(opt_smiles), 1),
            pre + "pairs": float(len(lifts)),
        })
    return out


def temperature_sweep(
    params,
    cfg: Config,
    key: Array,
    temperatures=(0.5, 0.7, 1.0, 1.3),
    n: int = 500,
    train_dataset: Optional[Dataset] = None,
    train_set: Optional[set] = None,
) -> Dict[str, float]:
    """Prior-sample quality vs softmax temperature (VERDICT r1 weak 6):
    lower T trades diversity for validity; this quantifies the trade so a
    deployment can pick its operating point. Keys: ``gen_valid@T`` etc."""
    if train_set is None and train_dataset is not None:
        train_set = novelty_reference(train_dataset)
    out: Dict[str, float] = {}
    for i, t in enumerate(temperatures):
        m = generation_metrics(
            params,
            cfg,
            jax.random.fold_in(key, i),
            n=n,
            train_dataset=train_dataset,
            temperature=float(t),
            train_set=train_set,
        )
        for k, v in m.items():
            out[f"{k}@{t:g}"] = v
    return out


def evaluate(
    state,
    cfg: Config,
    dataset: Dataset,
    key: Optional[Array] = None,
    n_prior: int = 1000,
    sweep_temperatures: bool = False,
    interpolation: bool = True,
    aggregate_posterior: bool = True,
    train_dataset: Optional[Dataset] = None,
    constrained: bool = True,
    beam: int = 0,
) -> Dict[str, float]:
    """Full report: teacher-forced + generation + reconstruction +
    interpolation-path + posterior/prior-mismatch (+ aggregate-posterior
    generation, + optional temperature sweep) metrics.

    For held-out evaluation pass the held-out split as ``dataset`` (drives
    teacher-forced/reconstruction/interpolation/posterior metrics) and the
    training split as ``train_dataset`` — the novelty reference set and the
    aggregate-posterior fit must come from data the model trained on.
    With ``train_dataset=None`` both roles fall to ``dataset`` (the
    historical in-sample report)."""
    from .loop import ema_eval_state

    # EMA weights, when trained, are the evaluation iterate (round-5 seed
    # study: the last iterate's free-running fidelity is noise-dominated)
    state = ema_eval_state(state)
    if cfg.model.n_properties > 0 and cfg.model.property_mean is None:
        # train() standardizes property targets via effective_config and the
        # stats persist in the checkpoint's config.json — but a caller who
        # built cfg by hand (not via _restore) would otherwise compare the
        # head's normalized predictions against raw targets here. Fit the
        # stats from whichever split actually carries properties, training
        # split preferred (round-3 review finding: guarding on one split
        # while fitting from the other silently no-ops the backfill).
        from .loop import effective_config

        stats_src = train_dataset if train_dataset is not None else dataset
        if stats_src.properties is None and dataset.properties is not None:
            stats_src = dataset
        if stats_src.properties is not None:
            cfg = effective_config(cfg, stats_src)
    key = key if key is not None else jax.random.key(0)
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    ref = train_dataset if train_dataset is not None else dataset
    ref_set = novelty_reference(ref)
    metrics = teacher_forced_metrics(state, cfg, dataset)
    metrics.update(
        generation_metrics(
            state.params, cfg, k1, n=n_prior, train_dataset=ref,
            train_set=ref_set,
        )
    )
    if constrained:
        metrics.update(
            constrained_generation_metrics(
                state.params, cfg, k7, n=min(n_prior, 256), train_dataset=ref,
                train_set=ref_set,
            )
        )
    metrics.update(reconstruction_metrics(state.params, cfg, dataset, k2))
    if beam > 1:
        metrics.update(
            beam_reconstruction_metrics(state.params, cfg, dataset, beam=beam)
        )
    metrics.update(posterior_prior_metrics(state.params, cfg, dataset))
    if interpolation:
        n_pairs = min(64, len(dataset) // 2)
        if n_pairs >= 2:
            metrics.update(
                interpolation_metrics(
                    state.params, cfg, dataset, k4, n_pairs=n_pairs
                )
            )
    if aggregate_posterior:
        metrics.update(
            aggregate_generation_metrics(
                state.params, cfg, k5, ref, n=n_prior, train_set=ref_set
            )
        )
    if cfg.model.n_properties > 0 and "property_head" in state.params:
        metrics.update(
            optimization_metrics(
                state.params, cfg, dataset, k6,
                variants=(False, True) if constrained else (False,),
            )
        )
    if sweep_temperatures:
        metrics.update(
            temperature_sweep(
                state.params, cfg, k3, train_dataset=ref, train_set=ref_set
            )
        )
    return metrics
