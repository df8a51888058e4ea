"""A/B: fused-stack kernel vs per-layer kernel, isolated and end-to-end.

Round-2 decision harness: the fused stack kernel won the isolated forward
(2.75 vs 3.9 ms) but bench.py regressed end-to-end vs the round-1 per-layer
path — this pins down where the time actually goes. Forces each path by
monkeypatching stack_plan_ok; everything else identical.

    python -m bench.stack_vs_layer [B ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, rounds=4, inner=10):
    # Reduce ALL outputs to ONE device scalar inside the jit: every extra
    # host fetch pays a full tunnel round trip (~10 ms) and poisons the
    # measurement (first cut of this harness fetched ~12 scalars and read
    # 4x-inflated times).
    out = jax.jit(
        lambda *a: jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)
        )
    )
    float(np.asarray(out(*args)))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = out(*args)
        float(np.asarray(r))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts[1:]) * 1e3)


def main(batches):
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.nn.gru import init_gru_params
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    T, I, H, L = 120, 292 + 38, 501, 3

    for B in batches:
        layers = init_gru_params(jax.random.key(0), I, H, L)
        x = jax.random.normal(jax.random.key(1), (B, T, I))

        for name, kern in (("fused", "fused_stack"), ("perlayer", "per_layer")):

            def fwd(layers, x):
                return gru_forward_pallas(layers, x, kernel=kern)

            def fb(layers, x):
                def loss(layers, x):
                    out, hf = fwd(layers, x)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                return jax.grad(loss)(layers, x)

            fwd_ms = timeit(fwd, layers, x)
            fb_ms = timeit(fb, layers, x)
            print(
                f"B={B:5d} {name:9s} fwd {fwd_ms:7.3f} ms   f+b {fb_ms:7.3f} ms   "
                f"({B / fb_ms * 1e3:8.0f} samples/s f+b)",
                flush=True,
            )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [256])
