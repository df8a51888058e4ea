"""Profile-trace the FULL production train step and print per-op times.

Attribution for the remaining speed-of-light gap: after the in-kernel
input-GEMM recurrence (29.7k SMILES/s, 46.5% MFU at B=256), what does the
other half of the roofline go to?

    python -m bench.profile_step [B]
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import numpy as np


def main(batch=256):
    from bench.profile_gru import run_traced, summarize
    from molvax.config import zinc250k
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.parallel import make_mesh, replicate, shard_batch
    from molvax.train import init_state, make_train_step
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    cfg = zinc250k()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, charset_size=DEFAULT_CHARSET.size),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    ds = synthetic_dataset(4096, max_len=120, seed=0)
    mesh = make_mesh(devices=jax.devices()[:1])
    b = shard_batch(mesh, ds.codes[:batch])
    state = replicate(mesh, init_state(cfg))
    step = make_train_step(cfg)

    import jax.numpy as jnp

    # reduce ALL updated params into the output so XLA cannot DCE the
    # backward pass or the optimizer (returning only the loss profiles just
    # the forward)
    def fb(state, b):
        s, m = step(state, b, None)
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), s.params, m["loss"]
        )

    tdir = run_traced("full_step", fb, state, b)
    print(f"[full train step] B={batch}", flush=True)
    summarize(tdir, top=28)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
