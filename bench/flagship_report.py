"""Flagship chemistry + property-optimization + beam-search report.

VERDICT r3 next 2/3/4 in one harness: train at the quality budget on the
chemically-valid corpus (post-r3 parser/corpus/automaton tightening), with a
5%% HELD-OUT split, and publish every headline chemistry number from one
coherent run — replacing BASELINE.md's self-declared-stale row.

Two trained models, JSON-line reports:

  * flagship  — the `zinc250k_quality` recipe (preset eps_scale, free_bits
                0.1, 16k steps, 250k molecules) on `synthetic_chem`:
                full `evaluate` on the held-out split (teacher-forced,
                round-trip recon, prior/aggregate/constrained sampling,
                interpolation, temperature sweep) + beam-search recon at
                beam in {2, 5, 10} with measured throughput cost vs greedy.
  * property  — the `property_joint` preset (same recipe + logP/QED/SAS
                head, multi-task ELBO): held-out property-head fit and the
                ChemVAE headline loop — gradient-ascend logP in z, decode,
                RE-compute logP on the decoded molecules
                (opt_pred_lift vs opt_real_lift, + constrained variant).

Split discipline: reconstruction/teacher-forced/interpolation/posterior
metrics run on the held-out split; the novelty reference set and the
aggregate-posterior fit come from the training split (evaluate()'s
train_dataset contract).

    python -m bench.flagship_report [--steps 16000] [--corpus 250000] \
        [--skip-property] [--skip-flagship]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def _train_holdout(cfg, with_properties: bool):
    """Load the corpus, carve the held-out split, train on the rest."""
    import jax

    from molvax.data import load_dataset
    from molvax.train import train

    ds = load_dataset(
        cfg.data.source,
        max_len=cfg.data.max_len,
        synthetic_n=cfg.data.n_synthetic,
        seed=cfg.data.seed,
        with_properties=with_properties,
        property_source=cfg.data.property_source,
    )
    train_ds, eval_ds = ds.split(0.05, cfg.data.seed)
    t0 = time.time()
    state, _ = train(cfg, dataset=train_ds, verbose=False)
    train_s = time.time() - t0
    del jax  # noqa: F821  (imported for side effects symmetry)
    return state, train_ds, eval_ds, train_s


def _beam_metrics(state, cfg, eval_ds, beams=(2, 5, 10), n=256):
    """recon_beam_exact/char at each width + drain-honest throughput cost
    (VERDICT r3 next 4: a number on beam search, in either direction)."""
    import jax
    import jax.numpy as jnp

    from molvax.latent.beam import beam_generate
    from molvax.latent.sample import generate
    from molvax.nn import vae
    from molvax.train.evaluate import beam_reconstruction_metrics

    out = {}
    for k in beams:
        m = beam_reconstruction_metrics(
            state.params, cfg, eval_ds, n=n, beam=k
        )
        out[f"recon_beam{k}_exact"] = round(m["recon_beam_exact"], 4)
        out[f"recon_beam{k}_char_nonpad"] = round(
            m["recon_beam_char_acc_nonpad"], 4
        )

    # throughput: greedy scan vs beam=5, same 256 latents, bench.py's
    # drain methodology (several dispatches per round, one host fetch)
    codes = jnp.asarray(eval_ds.codes[:n])
    mu, _ = vae.encode(state.params, cfg.model, codes)
    scan_cfg = dataclasses.replace(cfg.model, use_pallas_generation=False)
    key = jax.random.key(0)

    def timed(fn, calls=8, rounds=4):
        fn()
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(calls):
                o = fn()
            int(np.asarray(o)[0, 0])
            ts.append((time.perf_counter() - t0) / calls)
        return n / float(np.median(ts[1:]))

    out["beam_greedy_smiles_per_sec"] = round(
        timed(lambda: generate(state.params, scan_cfg, mu, key, greedy=True)[0]), 1
    )
    out["beam5_smiles_per_sec"] = round(
        timed(lambda: beam_generate(state.params, scan_cfg, mu, beam=5)[0]), 1
    )
    return out


def run_flagship(steps: int, corpus: int, beams=(2, 5, 10)):
    import jax

    from molvax.config import zinc250k_quality
    from molvax.train.evaluate import evaluate

    cfg = zinc250k_quality()
    cfg = dataclasses.replace(
        cfg,
        name="flagship_chem",
        # eps frontier is CORPUS-DEPENDENT: the quality preset's held-out
        # re-ablation moved its default to 0.02 on the plain corpus, but on
        # synthetic_chem 0.02 measured 94.1% recon / 15.5% prior chem-valid
        # vs 0.03's 91.5% / 29.6% (both held-out, 2026-08-19) — chem
        # validity is this report's criterion, so it pins 0.03
        model=dataclasses.replace(cfg.model, eps_scale=0.03),
        train=dataclasses.replace(cfg.train, steps=steps, log_every=2000),
        data=dataclasses.replace(
            cfg.data, source="synthetic_chem", n_synthetic=corpus
        ),
    )
    state, train_ds, eval_ds, train_s = _train_holdout(cfg, False)
    report = evaluate(
        state,
        cfg,
        eval_ds,
        key=jax.random.key(7),
        n_prior=1000,
        sweep_temperatures=True,
        train_dataset=train_ds,
    )
    report = {k: round(float(v), 4) for k, v in report.items()}
    report.update(_beam_metrics(state, cfg, eval_ds, beams))
    report.update(
        config="flagship_chem", holdout=True, steps=steps, corpus=corpus,
        train_s=round(train_s, 1),
    )
    return report


def run_property(steps: int, corpus: int):
    import jax

    from molvax.config import property_joint
    from molvax.train.evaluate import (
        evaluate,
        optimization_metrics,
    )
    from molvax.train.loop import effective_config

    cfg = property_joint()
    cfg = dataclasses.replace(
        cfg,
        name="property_report",
        train=dataclasses.replace(cfg.train, steps=steps, log_every=2000),
        data=dataclasses.replace(cfg.data, n_synthetic=corpus),
    )
    state, train_ds, eval_ds, train_s = _train_holdout(cfg, True)
    cfg = effective_config(cfg, train_ds)
    report = evaluate(
        state,
        cfg,
        eval_ds,
        key=jax.random.key(7),
        n_prior=1000,
        interpolation=False,
        aggregate_posterior=False,
        train_dataset=train_ds,
    )
    report = {k: round(float(v), 4) for k, v in report.items()}
    # the headline loop on a larger pool for a tighter opt_real_lift
    report.update(
        {
            k: round(float(v), 4)
            for k, v in optimization_metrics(
                state.params,
                cfg,
                eval_ds,
                jax.random.key(11),
                n=128,
                variants=(False, True),
            ).items()
        }
    )
    report.update(
        config="property_report", holdout=True, steps=steps, corpus=corpus,
        train_s=round(train_s, 1),
    )
    return report


def main(argv):
    steps, corpus = 16_000, 250_000
    if "--steps" in argv:
        steps = int(argv[argv.index("--steps") + 1])
    if "--corpus" in argv:
        corpus = int(argv[argv.index("--corpus") + 1])
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    if "--skip-flagship" not in argv:
        print(json.dumps(run_flagship(steps, corpus)), flush=True)
    if "--skip-property" not in argv:
        print(json.dumps(run_property(steps, corpus)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
