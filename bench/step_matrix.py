"""Full-train-step throughput matrix: batch x GRU kernel.

Times the production chunked trainer (16-step fused chunks, zinc250k-style
config) across batch sizes and both Pallas recurrence kernels, to pick the
production operating point from data.

    python -m bench.step_matrix [--preset NAME] [B ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def rate(cfg, codes, steps=48):
    import jax

    from molvax.parallel import make_mesh, replicate, stacked_batch_sharding
    from molvax.train import init_state
    from molvax.train.loop import make_train_chunk

    K = cfg.train.train_chunk_size
    batch = cfg.train.batch_size
    mesh = make_mesh(devices=jax.devices()[:1])
    state = replicate(mesh, init_state(cfg))
    chunk_fn = make_train_chunk(cfg, K)
    sh = stacked_batch_sharding(mesh)
    n = codes.shape[0]
    if n < K * batch:  # tile the corpus up to one full chunk (B=1024 case)
        codes = np.concatenate([codes] * (-(-(K * batch) // n)), axis=0)
        n = codes.shape[0]
    n_chunks = steps // K
    stacks = [
        jax.device_put(
            codes[(i * K * batch) % max(n - K * batch, 1) :][: K * batch].reshape(
                K, batch, codes.shape[1]
            ),
            sh,
        )
        for i in range(n_chunks)
    ]
    state, m = chunk_fn(state, stacks[0], None)
    float(np.asarray(m["loss"][-1]))
    rates = []
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(n_chunks):
            state, m = chunk_fn(state, stacks[i], None)
        float(np.asarray(m["loss"][-1]))
        rates.append(batch * K * n_chunks / (time.perf_counter() - t0))
    return float(np.median(rates[1:]))


def main(batches, preset="zinc250k"):
    from molvax.config import get_preset
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    ds = synthetic_dataset(8192, max_len=120, seed=0)
    base = get_preset(preset)
    base = dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model, charset_size=DEFAULT_CHARSET.size, use_pallas=True
        ),
    )
    for B in batches:
        for kern in ("per_layer", "fused_stack"):
            cfg = dataclasses.replace(
                base,
                model=dataclasses.replace(base.model, gru_kernel=kern),
                train=dataclasses.replace(base.train, batch_size=B),
            )
            r = rate(cfg, ds.codes)
            print(f"B={B:5d} {kern:12s} {r:9.0f} SMILES/sec", flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    preset = "zinc250k"
    if "--preset" in argv:
        i = argv.index("--preset")
        preset = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    main([int(a) for a in argv] or [256, 512], preset=preset)
