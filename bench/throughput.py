"""Benchmark harness: train / generation throughput for any preset.

`python -m bench.throughput --mode train --preset zinc250k --batch 256`
`python -m bench.throughput --mode generate --preset chemvae_5k --batch 512`
`python -m bench.throughput --mode torch --batch 64`   (CPU twin baseline)

The driver-facing single-line benchmark stays in /bench.py; this harness is
for development: per-config numbers, drain-honest timing (see
molvax.train.profiling.step_timer), JSON output.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def bench_train(preset: str, batch: int, steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from molvax.config import get_preset
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.parallel import make_mesh, replicate, shard_batch
    from molvax.train import init_state, make_train_step
    from molvax.train.profiling import step_timer

    cfg = get_preset(preset)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, charset_size=DEFAULT_CHARSET.size),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    mesh = make_mesh(devices=jax.devices()[:1])
    state = replicate(mesh, init_state(cfg))
    step = make_train_step(cfg)
    ds = synthetic_dataset(batch * 4, max_len=cfg.model.max_len, seed=0)
    b = shard_batch(mesh, ds.codes[:batch])

    holder = {"state": state}

    def one(_):
        holder["state"], m = step(holder["state"], b, None)
        return m["loss"]

    import numpy as np

    dt = step_timer(one, 0, steps=steps, rounds=3, fetch=lambda x: float(np.asarray(x)))
    return {
        "mode": "train",
        "preset": preset,
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 3),
        "smiles_per_sec": round(batch / dt, 1),
        "use_pallas": cfg.model.use_pallas,
        "backend": jax.default_backend(),
    }


def bench_generate(preset: str, batch: int, steps: int) -> dict:
    import jax
    import numpy as np

    from molvax.config import get_preset
    from molvax.data import DEFAULT_CHARSET
    from molvax.latent.sample import generate
    from molvax.nn import init_vae_params
    from molvax.train.profiling import step_timer

    cfg = dataclasses.replace(
        get_preset(preset).model, charset_size=DEFAULT_CHARSET.size
    )
    params = init_vae_params(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (batch, cfg.latent_dim))

    def one(_):
        codes, _logits = generate(params, cfg, z, jax.random.key(2), greedy=True)
        return codes

    dt = step_timer(
        one, 0, steps=steps, rounds=3,
        fetch=lambda c: int(np.asarray(c[0, 0])),
    )
    return {
        "mode": "generate",
        "preset": preset,
        "batch": batch,
        "ms_per_batch": round(dt * 1e3, 3),
        "smiles_per_sec": round(batch / dt, 1),
        "backend": jax.default_backend(),
    }


def bench_torch(batch: int, steps: int) -> dict:
    import time

    import numpy as np
    import torch

    from molvax.data import DEFAULT_CHARSET, synthetic_dataset

    from .torch_twin import model as mod

    ds = synthetic_dataset(batch * 4, max_len=120, seed=0)
    torch.manual_seed(0)
    model = mod.MolecularVAETwin(charset_size=DEFAULT_CHARSET.size)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    onehot = np.eye(DEFAULT_CHARSET.size, dtype=np.float32)[ds.codes]

    def one(i):
        lo = (i * batch) % (ds.codes.shape[0] - batch)
        x = torch.from_numpy(onehot[lo : lo + batch])
        y = torch.from_numpy(ds.codes[lo : lo + batch].astype(np.int64))
        logits, mu, logvar, _, _ = model(x)
        loss, _, _ = mod.vae_loss_twin(model, logits, y, mu, logvar)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one(0)
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        one(i)
    dt = (time.perf_counter() - t0) / steps
    return {
        "mode": "torch-cpu",
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 1),
        "smiles_per_sec": round(batch / dt, 1),
    }


def main():
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "generate", "torch"], default="train")
    ap.add_argument("--preset", default="zinc250k")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    if args.mode == "train":
        out = bench_train(args.preset, args.batch, args.steps)
    elif args.mode == "generate":
        out = bench_generate(args.preset, args.batch, args.steps)
    else:
        out = bench_torch(args.batch, min(args.steps, 5))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
