"""VERDICT r2 next 1: make one preset a real VAE.

Round 2 left a trade: high-fidelity reconstruction (eps_scale=1e-2, 96.4%
non-pad round trip, but prior validity 85%) OR high prior validity (99.4%
at full eps, but ~9% round trip). This harness ablates the escape hatches
at the same 16k-step budget and reports, per config:

  * recon_char_acc_nonpad  (target >= 0.95)
  * gen_valid              (prior z ~ N(0,I))
  * agg_valid              (z ~ fitted aggregate posterior N(mu, Sigma))
  * post_prior_w2          (how far the posterior sits from the prior)

"Done" = one config with recon_nonpad >= 0.95 AND (gen_valid >= 0.95 or
agg_valid >= 0.95 with the aggregate sampler documented as the preset's
sampling path).

    python -m bench.quality_ablation [--steps 16000] [--corpus 250000] \
        [--eps 0.01 0.1 0.3] [--seeds 0 1 2] [--insample] \
        [--gru-kernel per_layer|auto|fused_stack] \
        [--ss 0.25] [--ss-warmup 5000] [--wd 0.1] [--latent 512] \
        [--grad-clip 1.0] [--lr-schedule cosine] [--kl cyclical|linear] \
        [--ema 0.999] [--select-best] [--beam 5] [--source synthetic]

``--ss``/``--wd`` set TrainConfig.scheduled_sampling / word_dropout for the
VERDICT r4 task-2 ablation (the knobs exist since round 1 but had never been
measured on a trained model); both default 0.0 = the preset's behavior.

Evaluation runs on a 5% HELD-OUT split by default (reconstruction/teacher-
forced metrics on unseen molecules; novelty and the aggregate-posterior fit
on the training split); ``--insample`` restores the historical in-sample
report for continuity comparisons only.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time


def build_quality_cfg(
    eps: float,
    steps: int,
    corpus: int,
    free_bits: float = 0.1,
    source: str = "synthetic",
    seed: int = 0,
    gru_kernel: str = "per_layer",
    ss: float = 0.0,
    ss_warmup: int = 5000,
    wd: float = 0.0,
    latent_dim: int = 0,
    grad_clip: float = 0.0,
    lr_schedule: str = "constant",
    kl_kind: str = "cyclical",
    ema: float = 0.0,
    select_best: bool = False,
):
    """THE quality-recipe config: single source for run_one and every other
    round-5 probe (bench/ss_temp_probe.py) so the recipe cannot silently
    drift between the harnesses that claim to measure it."""
    from molvax.config import zinc250k

    cfg = zinc250k()
    model_kw = dict(eps_scale=eps, gru_kernel=gru_kernel)
    if latent_dim:
        model_kw["latent_dim"] = latent_dim
    return dataclasses.replace(
        cfg,
        name=f"quality_eps{eps:g}",
        model=dataclasses.replace(cfg.model, **model_kw),
        train=dataclasses.replace(
            cfg.train,
            steps=steps,
            seed=seed,
            kl=(
                dataclasses.replace(cfg.train.kl, free_bits=free_bits)
                if kl_kind == "cyclical"
                # monotonic probe: linear warmup to beta_max over the first
                # quarter of the budget, no mid-training beta restart
                else dataclasses.replace(
                    cfg.train.kl,
                    kind=kl_kind,
                    warmup_steps=max(steps // 4, 1),
                    free_bits=free_bits,
                )
            ),
            log_every=2000,
            scheduled_sampling=ss,
            scheduled_sampling_warmup=ss_warmup,
            word_dropout=wd,
            grad_clip_norm=grad_clip or None,
            lr_schedule=lr_schedule,
            lr_decay_steps=steps,
            ema_decay=ema,
            # --select-best: probe held-out round-trip at eval cadence and
            # return the best iterate (train() carves its own internal 5%
            # split from the training split for the probe, so the outer
            # held-out evaluation below stays selection-unbiased)
            eval_every=2000 if select_best else 0,
            eval_batches=1,
            eval_roundtrip_n=256 if select_best else 0,
            select_best=select_best,
        ),
        data=dataclasses.replace(cfg.data, n_synthetic=corpus, source=source),
    )


def run_one(
    eps: float,
    steps: int,
    corpus: int,
    free_bits: float = 0.1,
    holdout: bool = True,
    source: str = "synthetic",
    seed: int = 0,
    gru_kernel: str = "per_layer",
    ss: float = 0.0,
    ss_warmup: int = 5000,
    wd: float = 0.0,
    latent_dim: int = 0,
    grad_clip: float = 0.0,
    lr_schedule: str = "constant",
    kl_kind: str = "cyclical",
    ema: float = 0.0,
    select_best: bool = False,
    beam: int = 0,
):
    """One 16k-step quality run. ``gru_kernel`` defaults to 'per_layer'
    to match the zinc250k_quality preset's pinned path: the round-4
    seed re-ablation measured the fused stack flipping the eps=0.02
    near-collapse point (same seed: 95.7% recon per-layer vs 21% stack;
    stack seeds {0,1,2} -> {21, 78, 4}% — see the preset docstring).
    Pass --gru-kernel auto/fused_stack to probe the stack path.
    ``ss``/``ss_warmup``/``wd``: scheduled-sampling target probability (with
    its linear warmup length) and word-dropout probability for the round-5
    measure-or-delete ablation (VERDICT r4 next 2)."""
    import jax

    from molvax.data import load_dataset
    from molvax.train import train
    from molvax.train.evaluate import evaluate

    cfg = build_quality_cfg(
        eps,
        steps,
        corpus,
        free_bits=free_bits,
        source=source,
        seed=seed,
        gru_kernel=gru_kernel,
        ss=ss,
        ss_warmup=ss_warmup,
        wd=wd,
        latent_dim=latent_dim,
        grad_clip=grad_clip,
        lr_schedule=lr_schedule,
        kl_kind=kl_kind,
        ema=ema,
        select_best=select_best,
    )
    ds = load_dataset(
        cfg.data.source,
        max_len=cfg.data.max_len,
        synthetic_n=cfg.data.n_synthetic,
        seed=cfg.data.seed,
    )
    train_ds, eval_ds = ds, ds
    if holdout:
        # --holdout: reconstruction/teacher-forced metrics on data the
        # model never saw; novelty/aggregate-fit stay on the train split
        train_ds, eval_ds = ds.split(0.05, cfg.data.seed)
    # Observability (round 5: a wedged axon tunnel stalled a 3-seed batch
    # invisibly for 30 min): MOLVAX_METRICS_DIR writes each run's step
    # metrics as JSONL so progress/stalls are visible from outside.
    import os

    mdir = os.environ.get("MOLVAX_METRICS_DIR")
    mpath = None
    if mdir:
        os.makedirs(mdir, exist_ok=True)
        mpath = os.path.join(
            mdir,
            f"eps{eps:g}_seed{seed}_ss{ss:g}_wd{wd:g}_{gru_kernel}"
            f"_s{steps}_L{latent_dim or 'def'}"
            f"_gc{grad_clip:g}_{lr_schedule}_{kl_kind}_e{ema:g}"
            f"{'_sb' if select_best else ''}_{source}.jsonl",
        )
        # MetricsLogger appends; a re-run of the identical config must not
        # interleave two step streams into one file
        if os.path.exists(mpath):
            os.remove(mpath)
    t0 = time.time()
    state, _ = train(cfg, dataset=train_ds, verbose=False, metrics_path=mpath)
    train_s = time.time() - t0
    report = evaluate(
        state,
        cfg,
        eval_ds,
        key=jax.random.key(7),
        n_prior=1000,
        train_dataset=train_ds if holdout else None,
        beam=beam,
    )
    keep = {
        k: round(float(v), 4)
        for k, v in report.items()
        if k
        in (
            "recon_char_acc_nonpad",
            "recon_exact",
            "recon_beam_exact",
            "recon_beam_char_acc_nonpad",
            "gen_valid",
            "gen_chem_valid",
            "agg_chem_valid",
            "con_chem_valid",
            "con_unique",
            "con_novelty",
            "con_mean_len",
            "gen_unique",
            "gen_novelty",
            "agg_valid",
            "agg_unique",
            "agg_novelty",
            "post_prior_w2",
            "post_mean_norm",
            "post_std_mean",
            "kl",
            "acc",
        )
    }
    keep["eps"] = eps
    keep["seed"] = seed
    keep["gru_kernel"] = gru_kernel
    if ss > 0:
        keep["ss"] = ss
    if wd > 0:
        keep["wd"] = wd
    if latent_dim:
        keep["latent_dim"] = latent_dim
    if grad_clip:
        keep["grad_clip"] = grad_clip
    if lr_schedule != "constant":
        keep["lr_schedule"] = lr_schedule
    if kl_kind != "cyclical":
        keep["kl_kind"] = kl_kind
    if ema:
        keep["ema"] = ema
    if select_best:
        keep["select_best"] = True
    if beam > 1:
        keep["beam"] = beam
    keep["steps"] = steps
    if holdout:
        keep["holdout"] = True
    keep["train_s"] = round(train_s, 1)
    return keep


def main(argv):
    steps, corpus = 16000, 250_000
    eps_list = [0.01, 0.1, 0.3]
    seeds = [0]
    source = "synthetic"
    # held-out evaluation is the DEFAULT (VERDICT r3 next 2: no quality
    # number may be split-ambiguous); --insample opts into the historical
    # in-sample report for continuity comparisons only
    holdout = "--insample" not in argv
    if "--steps" in argv:
        steps = int(argv[argv.index("--steps") + 1])
    if "--corpus" in argv:
        corpus = int(argv[argv.index("--corpus") + 1])
    if "--source" in argv:
        source = argv[argv.index("--source") + 1]
    gru_kernel = "per_layer"
    if "--gru-kernel" in argv:
        gru_kernel = argv[argv.index("--gru-kernel") + 1]
    ss = float(argv[argv.index("--ss") + 1]) if "--ss" in argv else 0.0
    ss_warmup = (
        int(argv[argv.index("--ss-warmup") + 1]) if "--ss-warmup" in argv else 5000
    )
    wd = float(argv[argv.index("--wd") + 1]) if "--wd" in argv else 0.0
    latent_dim = (
        int(argv[argv.index("--latent") + 1]) if "--latent" in argv else 0
    )
    grad_clip = (
        float(argv[argv.index("--grad-clip") + 1])
        if "--grad-clip" in argv
        else 0.0
    )
    lr_schedule = (
        argv[argv.index("--lr-schedule") + 1]
        if "--lr-schedule" in argv
        else "constant"
    )
    kl_kind = argv[argv.index("--kl") + 1] if "--kl" in argv else "cyclical"
    ema = float(argv[argv.index("--ema") + 1]) if "--ema" in argv else 0.0
    select_best = "--select-best" in argv
    beam = int(argv[argv.index("--beam") + 1]) if "--beam" in argv else 0
    if beam == 1:
        # evaluate() gates beam metrics on beam > 1 (beam-1 IS greedy);
        # silently emitting a row without recon_beam_* would be a no-op
        raise SystemExit("--beam must be >= 2 (beam 1 is the greedy decode)")
    if "--seeds" in argv:
        i = argv.index("--seeds") + 1
        seeds = []
        while i < len(argv) and not argv[i].startswith("--"):
            seeds.append(int(argv[i]))
            i += 1
    if "--eps" in argv:
        i = argv.index("--eps") + 1
        eps_list = []
        while i < len(argv) and not argv[i].startswith("--"):
            eps_list.append(float(argv[i]))
            i += 1
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    for eps in eps_list:
        for seed in seeds:
            out = run_one(
                eps,
                steps,
                corpus,
                holdout=holdout,
                source=source,
                seed=seed,
                gru_kernel=gru_kernel,
                ss=ss,
                ss_warmup=ss_warmup,
                wd=wd,
                latent_dim=latent_dim,
                grad_clip=grad_clip,
                lr_schedule=lr_schedule,
                kl_kind=kl_kind,
                ema=ema,
                select_best=select_best,
                beam=beam,
            )
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
