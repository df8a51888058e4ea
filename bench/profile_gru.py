"""Profile-trace the GRU f+b paths and print a per-op time breakdown.

Captures a jax.profiler device trace of (a) the fused-stack path, (b) the
per-layer path, (c) the raw gru_stack_scan without its wrapper, then
aggregates XLA/Mosaic op durations from the trace protobuf. Attribution for
the round-2 routing decision (fused lost end-to-end despite winning
isolated forwards).

    python -m bench.profile_gru
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(tag, fn, *args, iters=6):
    out = jax.jit(
        lambda *a: jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)
        )
    )
    float(np.asarray(out(*args)))  # compile + warm
    tdir = f"/tmp/gru_trace_{tag}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        r = None
        for _ in range(iters):
            r = out(*args)
        float(np.asarray(r))
    return tdir


def summarize(tdir, iters=6, top=18):
    """Aggregate device-side event durations from the trace.json.gz."""
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"  no trace files under {tdir}", flush=True)
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    by_name = defaultdict(float)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
    }
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        by_name[ev["name"]] += ev.get("dur", 0.0)
    total = sum(by_name.values())
    print(f"  device total {total / 1e3 / iters:8.3f} ms/iter over {iters} iters")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {us / 1e3 / iters:8.3f} ms  {name[:100]}")


def main():
    import molvax.kernels.gru_stack as gs
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.nn.gru import init_gru_params
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()

    B, T, I, H, L = 256, 120, 330, 501, 3
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x = jax.random.normal(jax.random.key(1), (B, T, I))

    for tag, kern in (("fused", "fused_stack"), ("perlayer", "per_layer")):

        def fb(layers, x):
            def loss(layers, x):
                out, hf = gru_forward_pallas(layers, x, kernel=kern)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.grad(loss)(layers, x)

        tdir = run_traced(tag, fb, layers, x)
        print(f"[{tag}] f+b", flush=True)
        summarize(tdir)

    # raw kernel, no wrapper: pre-transposed x0, stacked weights
    Hh = layers[0]["w_hh"].shape[0]
    x0 = jax.random.normal(jax.random.key(2), (T, B, I))
    wih0, bih0 = layers[0]["w_ih"], layers[0]["b_ih"]
    wih = jnp.stack([l["w_ih"] for l in layers[1:]])
    bih = jnp.stack([l["b_ih"] for l in layers[1:]])
    whh = jnp.stack([l["w_hh"] for l in layers])
    bhh = jnp.stack([l["b_hh"] for l in layers])
    h0 = jnp.zeros((L, B, Hh), jnp.float32)

    def raw_fb(x0, wih0, bih0, wih, bih, whh, bhh, h0):
        def loss(*a):
            out, hf = gs.gru_stack_scan(*a)
            return jnp.sum(out**2)

        return jax.grad(loss, argnums=(0, 1, 5))(
            x0, wih0, bih0, wih, bih, whh, bhh, h0
        )

    tdir = run_traced("raw_stack", raw_fb, x0, wih0, bih0, wih, bih, whh, bhh, h0)
    print("[raw_stack] f+b (no wrapper)", flush=True)
    summarize(tdir)


if __name__ == "__main__":
    sys.exit(main())
