"""Training loop: optax Adam, one jitted+donated train step, GSPMD-ready.

Reference parity (SURVEY.md 2.9, 3.1): epoch loop of forward -> loss ->
backward -> Adam.step with periodic logging, eval, and checkpointing - same
behavior, but the whole step (one-hot, forward, ELBO, backward, Adam update,
metrics) is ONE compiled XLA program per step with donated state (params and
optimizer state update in place in HBM; zero host round-trips except at log
cadence).

PRNG discipline (SURVEY.md section 7): the state carries a base key; each
step derives its key with fold_in(base_key, step) - reproducible regardless
of batching/restarts, and safe under GSPMD (same key on every shard; the
reparam noise depends only on the global step and sample index).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.pipeline import BatchIterator
from ..data.zinc import Dataset, load_dataset
from ..nn import vae
from ..parallel import mesh as meshlib
from .loss import vae_loss
from .metrics import MetricsLogger
from .schedules import beta_at, ss_prob_at

Array = jax.Array


def _cadence_crossed(every: int, prev_step: int, now_step: int) -> bool:
    """True iff a multiple of ``every`` lies in (prev_step, now_step].

    The fused chunk trainer advances `chunk` steps per host iteration; eval
    and checkpoint actions can only run at chunk boundaries, so they fire
    AT MOST once per host iteration: exactly once per crossed window when
    ``every >= chunk``, and once per chunk (not per window) when ``every``
    is smaller than the chunk — train() warns loudly about that config."""
    return every > 0 and now_step // every > prev_step // every


class PosteriorCollapseError(RuntimeError):
    """Raised by train() when the posterior-collapse guard trips
    (TrainConfig.collapse_std_floor/collapse_abort). The run checkpoints
    before raising (when checkpointing is on), so the state at the moment
    of detection is recoverable."""


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # () int32
    base_key: Array  # PRNG key; per-step key = fold_in(base_key, step)
    # Polyak/EMA average of params (TrainConfig.ema_decay > 0), updated
    # inside the jitted step and preferred by evaluation/inference entry
    # points via ema_eval_state(). None when EMA is off — a None pytree
    # leaf keeps old checkpoints structurally compatible.
    ema_params: Any = None


def ema_eval_state(state: TrainState) -> TrainState:
    """The state evaluation/inference should read: when EMA weights exist,
    substitute them for the raw (last-iterate) params. The round-5 seed
    study measured held-out round-trip fidelity varying 38-96% across seeds
    because the final step lands at a random point of the late-training
    noise; the averaged iterate evaluates the trajectory's center."""
    if state.ema_params is None:
        return state
    return state._replace(params=state.ema_params, ema_params=None)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam (the reference's optimizer, SURVEY.md 2.9) with optional LR
    scheduling - schedules trace into the jitted step via the optimizer
    state's step count, so they cost nothing per step and survive
    checkpoint/resume exactly."""
    t = cfg.train
    if t.lr_schedule == "constant":
        lr = t.learning_rate
    elif t.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            t.learning_rate, t.lr_decay_steps, alpha=0.1
        )
    else:  # warmup_cosine
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=t.learning_rate,
            warmup_steps=t.lr_warmup_steps,
            decay_steps=t.lr_decay_steps,
            end_value=0.1 * t.learning_rate,
        )
    tx = optax.adam(lr)
    if t.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), tx)
    return tx


def effective_config(cfg: Config, dataset) -> Config:
    """Reconcile a config with the dataset it will train on. train() applies
    this automatically; callers that keep using their own cfg after train()
    (scripts, notebooks) should call it too, so inference paths see the same
    effective config the run recorded in its checkpoint's config.json.

    Two reconciliations:
      * charset width: a corpus-derived charset (.smi/.h5 source) may differ
        from DEFAULT_CHARSET; a silent mismatch would one-hot out-of-range
        codes to all-zero rows.
      * property-target standardization: per-property mean/std from the
        corpus (loss.py trains the head in normalized space - VERDICT r1
        weak 7; property_head.denormalize_properties maps back at inference).
    """
    import dataclasses
    import sys as _sys

    if dataset.charset.size != cfg.model.charset_size:
        print(
            f"[molvax] adapting model.charset_size "
            f"{cfg.model.charset_size} -> {dataset.charset.size} (dataset charset)",
            file=_sys.stderr,
        )
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, charset_size=dataset.charset.size
            ),
        )
    if (
        cfg.model.n_properties > 0
        and dataset.properties is not None
        and cfg.model.property_mean is None
    ):
        import numpy as _np

        mean = _np.mean(dataset.properties, axis=0)
        std = _np.maximum(_np.std(dataset.properties, axis=0), 1e-6)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                property_mean=tuple(float(m) for m in mean),
                property_std=tuple(float(s) for s in std),
            ),
        )
    return cfg


def init_state(cfg: Config, key: Optional[Array] = None) -> TrainState:
    key = key if key is not None else jax.random.key(cfg.train.seed)
    k_init, k_base = jax.random.split(key)
    params = vae.init_vae_params(k_init, cfg.model)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        base_key=k_base,
        ema_params=(
            jax.tree.map(jnp.copy, params)
            if cfg.train.ema_decay > 0
            else None
        ),
    )


def _make_one_step(cfg: Config, optimizer):
    """THE optimizer-step body: key derivation, schedules, loss, grad,
    update. Single source shared by make_train_step and make_train_chunk
    (review finding round 3: two verbatim copies had to be edited in
    lockstep), so chunked and unchunked training are the same program by
    construction."""
    mcfg = cfg.model
    # Resolved once at step-construction: when a config leaves the knobs
    # at 0.0 (every preset except zinc250k_quality, whose ss=0.25 is the
    # measured seed-robustness lever — docs/PERFORMANCE.md "basin
    # lottery"; word dropout measured as a strict loser and no preset uses
    # it), the traced program contains no ss/word-dropout ops at all.
    use_ss = cfg.train.scheduled_sampling > 0
    wd_static = cfg.train.word_dropout if cfg.train.word_dropout > 0 else None
    ema_decay = cfg.train.ema_decay

    def one_step(state: TrainState, batch):
        codes, props = batch
        step_key = jax.random.fold_in(state.base_key, state.step)
        beta = beta_at(cfg.train.kl, state.step)
        ss = ss_prob_at(cfg.train, state.step) if use_ss else None
        wd = wd_static

        def loss_fn(params):
            out = vae.forward(params, mcfg, step_key, codes, ss_prob=ss, wd_prob=wd)
            return vae_loss(
                mcfg,
                out.logits,
                codes.astype(jnp.int32),
                out.mu,
                out.logvar,
                beta,
                properties_pred=out.properties,
                properties_true=props,
                property_loss_weight=cfg.train.property_loss_weight,
                kl=out.kl,
                kl_free_bits=cfg.train.kl.free_bits,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay > 0 and ema is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema,
                params,
            )
        return (
            TrainState(params, opt_state, state.step + 1, state.base_key, ema),
            metrics,
        )

    return one_step


def make_train_step(cfg: Config):
    """Build the jitted train step: (state, codes, props?) -> (state, metrics)."""
    one_step = _make_one_step(cfg, make_optimizer(cfg))

    def train_step(
        state: TrainState, codes: Array, props: Optional[Array]
    ) -> Tuple[TrainState, Dict[str, Array]]:
        return one_step(state, (codes, props))

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_chunk(cfg: Config, chunk: int):
    """Fused multi-step trainer: ONE compiled program runs `chunk` optimizer
    steps via lax.scan over a stacked batch (chunk, B, T).

    Rationale: host->device dispatch has fixed per-call latency (severe on
    remote PJRT tunnels like this dev box's axon link; nonzero everywhere).
    Scanning K steps inside one program amortizes it K-fold and lets XLA
    keep params/optimizer state pinned without host round-trips. Metrics
    come back stacked (chunk, ...) so logging granularity is preserved."""
    one_step = _make_one_step(cfg, make_optimizer(cfg))

    def train_chunk(state: TrainState, codes_stack, props_stack):
        # codes_stack: (chunk, B, T); props_stack: (chunk, B, P) or None
        return jax.lax.scan(one_step, state, (codes_stack, props_stack))

    return jax.jit(train_chunk, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def make_eval_step(cfg: Config):
    """Teacher-forced eval: fixed key, no optimizer. Cached per config so
    repeated evaluate() calls reuse one jitted executable instead of
    retracing the full forward+loss graph (round-3 review finding)."""
    mcfg = cfg.model

    def eval_step(state: TrainState, codes: Array, props: Optional[Array]):
        key = jax.random.fold_in(state.base_key, 0x7FFFFFFF)  # disjoint from train steps
        out = vae.forward(state.params, mcfg, key, codes)
        _, metrics = vae_loss(
            mcfg,
            out.logits,
            codes.astype(jnp.int32),
            out.mu,
            out.logvar,
            jnp.float32(1.0),
            properties_pred=out.properties,
            properties_true=props,
            property_loss_weight=cfg.train.property_loss_weight,
            kl=out.kl,
            kl_free_bits=cfg.train.kl.free_bits,
        )
        return metrics

    return jax.jit(eval_step)


def train(
    cfg: Config,
    dataset: Optional[Dataset] = None,
    eval_dataset: Optional[Dataset] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    metrics_path: Optional[str] = None,
    max_steps: Optional[int] = None,
    verbose: bool = True,
) -> Tuple[TrainState, list]:
    """End-to-end training per config. Returns (final state, metric history).

    With ``cfg.train.eval_every`` set, a held-out eval (teacher-forced ELBO +
    recon accuracy, the reference's periodic eval - SURVEY.md 2.9) runs on
    ``eval_dataset`` (or a split carved from ``dataset``) and logs metrics
    prefixed ``eval_``."""
    from ..io import checkpoint as ckpt_io

    if dataset is None:
        dataset = load_dataset(
            cfg.data.source,
            max_len=cfg.data.max_len,
            synthetic_n=cfg.data.n_synthetic,
            seed=cfg.data.seed,
            with_properties=cfg.model.n_properties > 0,
            property_source=cfg.data.property_source,
        )
    cfg = effective_config(cfg, dataset)
    if eval_dataset is None and cfg.train.eval_every:
        dataset, eval_dataset = dataset.split(cfg.data.test_fraction, cfg.data.seed)
    if mesh is None:
        n_dev = len(jax.devices())
        want = cfg.mesh.data_axis * cfg.mesh.model_axis
        if want > 1 and want <= n_dev and cfg.train.batch_size % cfg.mesh.data_axis == 0:
            mesh = meshlib.make_mesh(cfg.mesh)
        else:
            # auto: largest power-of-two device count dividing the batch
            use = 1
            while use * 2 <= n_dev and cfg.train.batch_size % (use * 2) == 0:
                use *= 2
            if want > 1:
                import sys as _sys

                print(
                    f"[molvax] configured mesh {cfg.mesh.data_axis}x"
                    f"{cfg.mesh.model_axis} unusable here (devices={n_dev}, "
                    f"batch={cfg.train.batch_size}); using an auto {use}-device "
                    "data mesh",
                    file=_sys.stderr,
                )
            mesh = meshlib.make_mesh(devices=jax.devices()[:use])

    it = BatchIterator(
        dataset,
        cfg.train.batch_size,
        seed=cfg.train.seed,
        sharding=meshlib.batch_sharding(mesh),
        with_properties=cfg.model.n_properties > 0,
    )
    state = init_state(cfg)
    state = meshlib.replicate(mesh, state)
    train_step = make_train_step(cfg)

    total_steps = (
        max_steps
        if max_steps is not None
        else (cfg.train.steps or cfg.train.epochs * max(it.steps_per_epoch, 1))
    )
    import sys

    logger = MetricsLogger(metrics_path, stream=sys.stderr if verbose else False)

    manager = None
    if cfg.train.checkpoint_dir:
        manager = ckpt_io.make_manager(
            cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints
        )
        # Record the training charset and full config next to the
        # checkpoints: inference entry points decode with the exact table the
        # model was trained on, and `--ckpt` alone is enough to restore (no
        # re-passing presets/overrides).
        import json
        import os

        from ..config import to_dict

        with open(
            os.path.join(cfg.train.checkpoint_dir, "charset.json"), "w"
        ) as f:
            json.dump(list(dataset.charset.chars), f)
        with open(
            os.path.join(cfg.train.checkpoint_dir, "config.json"), "w"
        ) as f:
            json.dump(to_dict(cfg), f, indent=1)
        restored = ckpt_io.restore_latest(manager, state)
        if restored is not None:
            state = restored

    eval_step = None
    eval_it = None
    if (
        cfg.train.eval_every
        and cfg.train.eval_batches > 0
        and eval_dataset is not None
        and len(eval_dataset) > 0
    ):
        eval_step = make_eval_step(cfg)
        eval_it = BatchIterator(
            eval_dataset,
            cfg.train.batch_size,
            seed=cfg.train.seed + 1,
            sharding=meshlib.batch_sharding(mesh),
            with_properties=cfg.model.n_properties > 0,
        )

    chunk = max(1, cfg.train.train_chunk_size)
    if chunk > 1:
        for _name, _every in (
            ("eval_every", cfg.train.eval_every),
            ("checkpoint_every", cfg.train.checkpoint_every),
        ):
            if _every and _every < chunk:
                print(
                    f"[molvax] {_name}={_every} < train_chunk_size={chunk}: "
                    "actions fire at chunk boundaries, at most once per "
                    "chunk (raise the cadence or shrink the chunk)",
                    file=sys.stderr,
                )
    train_chunk = make_train_chunk(cfg, chunk) if chunk > 1 else None
    stacked_sh = meshlib.stacked_batch_sharding(mesh)

    # Preemption safety (SURVEY.md 5.3): on SIGTERM/SIGINT finish the current
    # step, checkpoint, and return cleanly; the next run resumes exactly
    # (see fast_forward below). Only installed when checkpointing is on and
    # we're in the main thread (signal module requirement).
    stop_requested = {"flag": False}
    old_handlers = {}
    if manager is not None:
        import os
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():

            def _on_signal(signum, frame):
                if stop_requested["flag"]:
                    # second signal: the user means it - restore the default
                    # disposition and re-deliver so the process actually dies
                    # even if a device call is wedged
                    signal.signal(signum, signal.SIG_DFL)
                    os.kill(os.getpid(), signum)
                    return
                stop_requested["flag"] = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _on_signal)

    # Posterior-collapse guard (VERDICT r4 next 1): watch the in-batch
    # aggregate-z std metric at log cadence; below the floor after the
    # guard-warmup the latent is collapsing (round 4: collapsed runs sat
    # at ~0.015 vs O(0.1-1) healthy) — kill the run in ~1k steps instead
    # of burning the full budget. Checks ride the existing metric pulls,
    # so the guard costs nothing when logging is on.
    # Best-checkpoint selection (TrainConfig.select_best doc): track the
    # highest held-out round-trip probe; the selected iterate is returned
    # and saved under <checkpoint_dir>/best/, while the regular last-step
    # checkpoints keep serving preemption/resume.
    select_best = cfg.train.select_best
    best = {"metric": -1.0, "params": None, "ema": None, "step": -1}
    if select_best and (
        cfg.train.eval_roundtrip_n <= 0
        or cfg.train.eval_every <= 0
        or cfg.train.eval_batches <= 0
        or eval_dataset is None
        or len(eval_dataset) == 0
    ):
        print(
            "[molvax] select_best needs eval_every>0, eval_batches>0, "
            "eval_roundtrip_n>0 and a held-out split; falling back to "
            "last-step selection",
            file=sys.stderr,
        )
        select_best = False
    best_meta_path = None
    if select_best and cfg.train.checkpoint_dir:
        # Persist the winning probe value: a rerun/resume on this dir must
        # not let a worse segment overwrite best/ (review finding round 5).
        import json as _json
        import os as _os

        best_meta_path = _os.path.join(
            cfg.train.checkpoint_dir, "best", "probe.json"
        )
        if _os.path.exists(best_meta_path):
            with open(best_meta_path) as f:
                prior = _json.load(f)
            best["metric"] = float(prior.get("metric", -1.0))
            best["step"] = int(prior.get("step", -1))
            print(
                f"[molvax] select_best: existing best/ has probe "
                f"{best['metric']:.4f} at step {best['step']}; this run "
                "only replaces it if beaten",
                file=sys.stderr,
            )

    def _consider_best(metric: float, st: TrainState, at_step: int):
        if metric > best["metric"]:
            best["metric"] = metric
            # device-side copies of the EVAL-relevant leaves only (params
            # + ema): `st` itself is donated to the next step, and copying
            # the Adam moments too would pin ~3-4x the parameter bytes in
            # HBM for the rest of the run (review finding round 5)
            best["params"] = jax.tree.map(jnp.copy, st.params)
            best["ema"] = (
                jax.tree.map(jnp.copy, st.ema_params)
                if st.ema_params is not None
                else None
            )
            best["step"] = at_step

    guard_floor = cfg.train.collapse_std_floor
    guard_hot = {"warned": False}
    if guard_floor > 0 and cfg.train.log_every <= 0:
        print(
            "[molvax] collapse_std_floor set but log_every=0: the guard "
            "only checks at log cadence and will never fire",
            file=sys.stderr,
        )

    def _collapse_check(entry: dict):
        if guard_floor <= 0:
            return
        v = entry.get("post_std_batch")
        s = entry["step"]
        if v is None or s < cfg.train.collapse_guard_after:
            return
        if v >= guard_floor:
            guard_hot["warned"] = False
            return
        msg = (
            f"[molvax] posterior collapse detected at step {s}: "
            f"post_std_batch={v:.4g} < collapse_std_floor={guard_floor:g} "
            "(aggregate-z spread collapsed; see TrainConfig.collapse_std_floor)"
        )
        if cfg.train.collapse_abort:
            if manager is not None:
                # Save under the CURRENT host step: with the fused-chunk
                # trainer, detection step s can sit mid-chunk while `state`
                # is already the post-chunk state — labeling the checkpoint
                # with s would make the orbax step disagree with the saved
                # step counter (review finding round 5).
                ckpt_io.save(manager, step_now, state)
                manager.wait_until_finished()
                msg += f" — checkpointed at step {step_now}"
            raise PosteriorCollapseError(msg)
        if not guard_hot["warned"]:
            print(msg + " - continuing (collapse_abort=False)", file=sys.stderr)
            guard_hot["warned"] = True

    history = []
    last_probe = {"step": -1, "metric": -1.0}

    def _roundtrip_probe(st: TrainState):
        """The free-running round-trip probe — single definition so the
        cadence and final-step call sites cannot drift (review finding
        round 5). Key constant 0x7EED5EED is disjoint from the per-step
        training keys fold_in(base_key, step) for any realistic budget
        (the old 0x5EED collided at step 24301), matching eval_step's
        0x7FFFFFFF convention."""
        from .evaluate import reconstruction_metrics

        return reconstruction_metrics(
            ema_eval_state(st).params,
            cfg,
            eval_dataset,
            jax.random.fold_in(st.base_key, 0x7EED5EED),
            n=min(cfg.train.eval_roundtrip_n, len(eval_dataset)),
        )
    # Host-side step mirror: avoids a device sync per iteration (the device
    # `state.step` is only read at restore time).
    step_now = int(jax.device_get(state.step))
    if step_now > 0:
        # resume: replay the deterministic shuffle so the data order matches
        # an uninterrupted run (one batch consumed per optimizer step)
        it.fast_forward(step_now)
        if eval_it is not None:
            # the eval stream consumes eval_batches per crossed cadence
            # window; replay those too so a resumed run's eval batches match
            # the uninterrupted run's (review finding round 3)
            eval_it.fast_forward(
                (step_now // cfg.train.eval_every) * cfg.train.eval_batches
            )
    try:
        while step_now < total_steps:
            prev_step = step_now
            if train_chunk is not None and step_now + chunk <= total_steps:
                codes_stack, props_stack = it.next_stack(chunk, stacked_sh)
                state, stacked = train_chunk(state, codes_stack, props_stack)
                step_now += chunk
                if cfg.train.log_every > 0:
                    # Every step's metrics come back stacked (chunk, ...);
                    # log each step that lands on the cadence with ITS OWN
                    # metrics - chunking changes dispatch, not observability.
                    host_stack = None
                    for i in range(chunk):
                        s = prev_step + i + 1
                        if s % cfg.train.log_every == 0 or s == total_steps:
                            if host_stack is None:
                                host_stack = jax.device_get(stacked)
                            entry = logger.log(
                                s, jax.tree.map(lambda x: x[i], host_stack)
                            )
                            history.append(entry)
                            _collapse_check(entry)
            else:
                codes, props = next(it)
                state, metrics = train_step(state, codes, props)
                step_now += 1
                if cfg.train.log_every > 0 and (
                    step_now % cfg.train.log_every == 0
                    or step_now == total_steps
                ):
                    entry = logger.log(step_now, metrics)
                    history.append(entry)
                    _collapse_check(entry)
            if eval_step is not None and _cadence_crossed(
                cfg.train.eval_every, prev_step, step_now
            ):
                acc = []
                for _ in range(cfg.train.eval_batches):
                    e_codes, e_props = next(eval_it)
                    acc.append(eval_step(state, e_codes, e_props))
                mean = {
                    f"eval_{k}": jnp.mean(jnp.stack([m[k] for m in acc]))
                    for k in acc[0]
                }
                if cfg.train.eval_roundtrip_n > 0:
                    # Free-running fidelity probe (config field doc): the
                    # quality failure mode is invisible to teacher-forced
                    # metrics, so measure the real thing at eval cadence.
                    rt = _roundtrip_probe(state)
                    mean.update({f"eval_{k}": v for k, v in rt.items()})
                    last_probe["step"] = step_now
                    last_probe["metric"] = rt["recon_char_acc_nonpad"]
                    if select_best:
                        _consider_best(
                            rt["recon_char_acc_nonpad"], state, step_now
                        )
                history.append(logger.log(step_now, mean))
            if manager is not None and _cadence_crossed(
                cfg.train.checkpoint_every, prev_step, step_now
            ):
                ckpt_io.save(manager, step_now, state)
            if stop_requested["flag"]:
                import sys as _s

                print(
                    f"[molvax] signal received: checkpointing at step {step_now} "
                    "and stopping",
                    file=_s.stderr,
                )
                break
        if manager is not None:
            ckpt_io.save(manager, step_now, state)
            manager.wait_until_finished()
        if select_best:
            # the final iterate competes too — unless the cadence probe
            # already measured this exact step (review finding round 5:
            # recomputing the identical probe wastes a full decode pass)
            if last_probe["step"] == step_now:
                final_metric = last_probe["metric"]
            else:
                rt = _roundtrip_probe(state)
                final_metric = rt["recon_char_acc_nonpad"]
                _consider_best(final_metric, state, step_now)
            if best["params"] is not None:
                # this run produced the winner: swap it in and persist it
                if best["step"] != step_now:
                    print(
                        f"[molvax] select_best: step {best['step']} probe "
                        f"{best['metric']:.4f} beats final step {step_now} "
                        f"({final_metric:.4f}); returning it",
                        file=sys.stderr,
                    )
                state = TrainState(
                    params=best["params"],
                    # Adam moments are not part of the selection (best/ is
                    # an inference artifact; resume uses the last-step
                    # checkpoints above)
                    opt_state=state.opt_state,
                    step=jnp.asarray(best["step"], jnp.int32),
                    base_key=state.base_key,
                    ema_params=best["ema"],
                )
                if manager is not None:
                    import json as _json
                    import os

                    best_mgr = ckpt_io.make_manager(
                        os.path.join(cfg.train.checkpoint_dir, "best"),
                        keep=1,
                    )
                    # force=True: orbax's should_save silently skips any
                    # step <= a stale best/'s latest (review finding
                    # round 5 — probe.json and weights would diverge)
                    ckpt_io.save(best_mgr, best["step"], state, force=True)
                    best_mgr.wait_until_finished()
                    with open(best_meta_path, "w") as f:
                        _json.dump(
                            {"step": best["step"], "metric": best["metric"]},
                            f,
                        )
            elif best["step"] >= 0:
                print(
                    f"[molvax] select_best: existing best/ (probe "
                    f"{best['metric']:.4f} at step {best['step']}) stands; "
                    "this run did not beat it",
                    file=sys.stderr,
                )
                # honor the contract that train() returns the selected
                # iterate: load the standing winner back from best/ — with
                # a mesh-replicated template so the returned state's
                # sharding matches every other path, and tolerating a
                # stale/incompatible best/ (this sits at the very end of
                # the budget; failing here would discard the whole run —
                # review finding round 5)
                import os

                best_mgr = ckpt_io.make_manager(
                    os.path.join(cfg.train.checkpoint_dir, "best"), keep=1
                )
                try:
                    restored_best = ckpt_io.restore_latest(
                        best_mgr, meshlib.replicate(mesh, init_state(cfg))
                    )
                except ValueError as e:
                    print(
                        f"[molvax] select_best: standing best/ is "
                        f"incompatible with this config ({e}); returning "
                        "this run's final state instead",
                        file=sys.stderr,
                    )
                    restored_best = None
                if restored_best is not None:
                    state = restored_best
    finally:
        # always restore signal dispositions and flush the logger, even when
        # the loop raises (a wedged handler would make the process
        # uninterruptible for the rest of its life)
        if old_handlers:
            import signal

            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        logger.close()
    return state, history
