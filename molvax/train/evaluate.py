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
from ..data.featurize import decode_codes, valid_fraction
from ..data.native import decode_codes_native
from ..data.zinc import Dataset
from ..latent.sample import generate
from ..nn import vae

Array = jax.Array


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
) -> Dict[str, float]:
    """MOSES-style sample quality from the prior: validity (grammar),
    uniqueness among valid, novelty vs the training corpus, mean length."""
    if charset is None:
        charset = train_dataset.charset if train_dataset is not None else DEFAULT_CHARSET
    k_z, k_g = jax.random.split(key)
    z = jax.random.normal(k_z, (n, cfg.model.latent_dim), jnp.float32)
    codes, _ = generate(
        params, cfg.model, z, k_g, greedy=False, temperature=temperature
    )
    smiles = decode_codes(codes, charset)
    nonempty = [s for s in smiles if s]
    valid = valid_fraction(smiles, charset)
    uniq = len(set(nonempty)) / max(len(nonempty), 1)
    novelty = 1.0
    if train_dataset is not None:
        train_set = set(
            decode_codes_native(
                train_dataset.codes[: min(len(train_dataset), 50000)], charset
            )
        )
        novel = [s for s in set(nonempty) if s not in train_set]
        novelty = len(novel) / max(len(set(nonempty)), 1)
    return {
        "gen_valid": valid,
        "gen_unique": uniq,
        "gen_novelty": novelty,
        "gen_mean_len": float(np.mean([len(s) for s in smiles])),
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


def temperature_sweep(
    params,
    cfg: Config,
    key: Array,
    temperatures=(0.5, 0.7, 1.0, 1.3),
    n: int = 500,
    train_dataset: Optional[Dataset] = None,
) -> Dict[str, float]:
    """Prior-sample quality vs softmax temperature (VERDICT r1 weak 6):
    lower T trades diversity for validity; this quantifies the trade so a
    deployment can pick its operating point. Keys: ``gen_valid@T`` etc."""
    out: Dict[str, float] = {}
    for i, t in enumerate(temperatures):
        m = generation_metrics(
            params,
            cfg,
            jax.random.fold_in(key, i),
            n=n,
            train_dataset=train_dataset,
            temperature=float(t),
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
) -> Dict[str, float]:
    """Full report: teacher-forced + generation + reconstruction metrics
    (+ optional temperature sweep)."""
    key = key if key is not None else jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    metrics = teacher_forced_metrics(state, cfg, dataset)
    metrics.update(
        generation_metrics(
            state.params, cfg, k1, n=n_prior, train_dataset=dataset
        )
    )
    metrics.update(reconstruction_metrics(state.params, cfg, dataset, k2))
    if sweep_temperatures:
        metrics.update(
            temperature_sweep(state.params, cfg, k3, train_dataset=dataset)
        )
    return metrics
