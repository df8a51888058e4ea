"""Round-5 quality endgame probe: scheduled sampling is the only measured
lever that makes held-out round-trip fidelity SEED-ROBUST (ss=0.25, eps
0.02: {96.5, 97.2, 97.2}% across seeds vs {95.7, 37.8, 53.3} teacher-forced
— the plain operating point is a basin lottery that neither grad clipping,
cosine decay, EMA, 48k steps, nor best-checkpoint selection fixes, see
docs/PERFORMANCE.md). Its cost is aggregate-sampler validity (51-75% at
T=1.0): the ss-trained decoder drifts off-grammar on sampled z.

This probe asks whether sampling TEMPERATURE recovers that axis: train the
ss recipe per seed, then sweep the aggregate sampler's temperature and
report agg_valid / agg_unique / agg_novelty at each T, plus the round-trip
row for the same trained instance.

    python -m bench.ss_temp_probe [--seeds 0 1 2] [--temps 1.0 0.8 0.7]
        [--ss 0.25] [--eps 0.02] [--steps 16000] [--corpus 250000]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time


def main(argv):
    import jax

    from bench.quality_ablation import build_quality_cfg
    from molvax.data import load_dataset
    from molvax.train import train
    from molvax.train.evaluate import (
        aggregate_generation_metrics,
        novelty_reference,
        reconstruction_metrics,
    )
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()

    def arg_list(flag, cast, default):
        if flag not in argv:
            return default
        i = argv.index(flag) + 1
        out = []
        while i < len(argv) and not argv[i].startswith("--"):
            out.append(cast(argv[i]))
            i += 1
        return out

    seeds = arg_list("--seeds", int, [0])
    temps = arg_list("--temps", float, [1.0, 0.9, 0.8, 0.7, 0.6])
    ss = float(argv[argv.index("--ss") + 1]) if "--ss" in argv else 0.25
    eps = float(argv[argv.index("--eps") + 1]) if "--eps" in argv else 0.02
    steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 16000
    corpus = (
        int(argv[argv.index("--corpus") + 1]) if "--corpus" in argv else 250_000
    )

    base = build_quality_cfg(eps, steps, corpus, ss=ss)
    ds = load_dataset(
        base.data.source,
        max_len=base.data.max_len,
        synthetic_n=corpus,
        seed=base.data.seed,
    )
    train_ds, eval_ds = ds.split(0.05, base.data.seed)
    # loop-invariant: one corpus decode, not one per seed (the round-3
    # evaluate() finding, re-found here in round-5 review)
    ref = novelty_reference(train_ds)

    for seed in seeds:
        cfg = dataclasses.replace(
            base, train=dataclasses.replace(base.train, seed=seed)
        )
        t0 = time.time()
        state, _ = train(cfg, dataset=train_ds, verbose=False)
        train_s = time.time() - t0
        rt = reconstruction_metrics(
            state.params, cfg, eval_ds, jax.random.key(7)
        )
        from molvax.latent.sample import fit_aggregate_posterior

        # one fit per trained model; the temperature sweep below reuses it
        agg_fit = fit_aggregate_posterior(
            state.params, cfg.model, train_ds.codes
        )
        row = {
            "seed": seed,
            "ss": ss,
            "eps": eps,
            "steps": steps,
            "train_s": round(train_s, 1),
            **{k: round(float(v), 4) for k, v in rt.items()},
        }
        for t in temps:
            m = aggregate_generation_metrics(
                state.params,
                cfg,
                jax.random.key(11),
                train_ds,
                n=1000,
                temperature=t,
                train_set=ref,
                fit=agg_fit,
            )
            row[f"T{t:g}"] = {
                k: round(float(v), 4)
                for k, v in m.items()
                if k in ("agg_valid", "agg_chem_valid", "agg_unique", "agg_novelty")
            }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
