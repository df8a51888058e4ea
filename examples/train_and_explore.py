"""End-to-end molvax walkthrough: train -> evaluate -> explore latent space.

Run:  python examples/train_and_explore.py [--preset zinc250k] [--steps 2000]

Covers every workload a user of the reference repo would expect
(SURVEY.md section 0): training with KL annealing, checkpointing, prior
sampling, interpolation, reconstruction, and gradient-based property
optimization in z.
"""

from __future__ import annotations

import argparse
import json
import tempfile

import jax

from molvax.config import apply_overrides, get_preset
from molvax.data import load_dataset, valid_fraction
from molvax.latent import interpolate, optimize_from_smiles, sample_prior
from molvax.train import evaluate, train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="property_joint")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    cfg = get_preset(args.preset)
    ckpt = args.ckpt or tempfile.mkdtemp(prefix="molvax_ckpt_")
    cfg = apply_overrides(
        cfg,
        {
            "train.checkpoint_dir": ckpt,
            "train.log_every": max(args.steps // 10, 1),
            "train.eval_every": max(args.steps // 5, 1),
            "data.n_synthetic": 50_000,
        },
    )

    print(f"== training {cfg.name} for {args.steps} steps "
          f"on {jax.devices()[0].platform} ==")
    dataset = load_dataset(
        cfg.data.source,
        max_len=cfg.data.max_len,
        synthetic_n=cfg.data.n_synthetic,
        seed=cfg.data.seed,
        with_properties=cfg.model.n_properties > 0,
    )
    # reconcile cfg with the dataset (charset width, property-target stats)
    # so the post-training workloads below see the same effective config the
    # run records in its checkpoint
    from molvax.train import effective_config

    cfg = effective_config(cfg, dataset)
    state, history = train(cfg, dataset=dataset, max_steps=args.steps)
    last = [h for h in history if "loss" in h][-1]
    print(f"final: loss {last['loss']:.2f}, teacher-forced acc {last['acc']:.3f}")

    print("\n== evaluation ==")
    report = evaluate(state, cfg, dataset, n_prior=500)
    print(json.dumps({k: round(v, 4) for k, v in report.items()}, indent=2))

    print("\n== prior samples ==")
    samples = sample_prior(
        state.params, cfg.model, 10, jax.random.key(1),
        charset=dataset.charset, greedy=False, temperature=0.9,
    )
    for s in samples:
        print(" ", s)
    print(f"grammar-valid: {valid_fraction(samples, dataset.charset):.0%}")

    print("\n== interpolation CCO -> c1ccccc1 ==")
    for s in interpolate(
        state.params, cfg.model, "CCO", "c1ccccc1", steps=7,
        charset=dataset.charset,
    ):
        print(" ", s)

    if cfg.model.n_properties > 0:
        print("\n== property optimization (maximize property 0) ==")
        out, res = optimize_from_smiles(
            state.params, cfg.model, ["CCO", "CCNC"], jax.random.key(2),
            steps=80, lr=0.1, charset=dataset.charset,
        )
        import numpy as np

        for s_in, s_out, o0, o1 in zip(
            ["CCO", "CCNC"], out,
            np.asarray(res.objective_start), np.asarray(res.objective),
        ):
            print(f"  {s_in} -> {s_out}   objective {o0:.3f} -> {o1:.3f}")

    print(f"\ncheckpoints in {ckpt}; resume by re-running with --ckpt {ckpt}")


if __name__ == "__main__":
    main()
