"""Probe: can 256-row blocks hosting two interleaved 128-row chains hide
the GRU serial-chain latency that caps the flagship at ~52% MFU?

Background (docs/PERFORMANCE.md roofline): at B=256 the per-layer kernels
run two 128-row blocks as SEQUENTIAL grid cells — their serial h @ W_hh
chains never overlap. The round-2 chain sweep found in-block chains
monotonically harmful, but at b_blk=128 a chain is only 16 rows (VPU-tile
waste). With MOLVAX_GRU_B_BLK=256 + MOLVAX_GRU_CHAINS=2 the hoisted-gi
kernel runs two FULL 128-row chains whose dependent dots interleave on the
MXU — the same latency-hiding mechanism, without the tile waste.

Configs are env-dependent at trace time, so each is probed in a fresh
subprocess:

    python -m bench.chain_probe          # orchestrates all configs
    python -m bench.chain_probe --one hoisted|scan_x fwd|fwdbwd

Prints layer-sweep ms for the hoisted kernel (chains supported) and the
production scan_x kernel (no chains — its number is the bar to beat).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

B, T, H, L = 256, 120, 501, 1  # one layer isolates the chain
I = 501  # layer>0 shape: input width == hidden


def run_one(variant: str, mode: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    from molvax.kernels import gru as gk

    key = jax.random.key(0)
    Hp = 512
    h0 = jnp.zeros((B, H), jnp.float32)
    if variant == "hoisted":
        gi = jax.random.normal(key, (T, B, 3 * H), jnp.float32) * 0.1
        w_hh = jax.random.normal(jax.random.key(1), (H, 3 * H)) * 0.05
        b_hh = jnp.zeros((3 * H,))

        def fwd(gi, w, b):
            return gk.gru_layer_scan(gi, w, b, h0)

        args = (gi, w_hh, b_hh)
    else:
        x = jax.random.normal(key, (T, B, I), jnp.float32) * 0.1
        w_ih = jax.random.normal(jax.random.key(2), (I, 3 * H)) * 0.05
        b_ih = jnp.zeros((3 * H,))
        w_hh = jax.random.normal(jax.random.key(1), (H, 3 * H)) * 0.05
        b_hh = jnp.zeros((3 * H,))

        def fwd(x, wi, bi, wh, bh):
            return gk.gru_layer_scan_x(x, wi, bi, wh, bh, h0)

        args = (x, w_ih, b_ih, w_hh, b_hh)

    if mode == "fwd":
        fn = jax.jit(lambda *a: jnp.sum(fwd(*a)))
    else:
        # reduce the cotangent to a scalar INSIDE jit: returning the full
        # (T,B,I) dx makes the timing loop measure the tunnel transfer
        # (~61 MB/fetch), not the kernel
        grad = jax.grad(lambda *a: jnp.sum(jnp.tanh(fwd(*a))))
        fn = jax.jit(lambda *a: jnp.sum(grad(*a)))

    out = fn(*args)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        ts.append((time.perf_counter() - t0) / 20)
    print(json.dumps({"ms": float(np.median(ts[1:])) * 1e3}))


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 1], sys.argv[i + 2])
        return
    configs = [
        ("scan_x (production)", "scan_x", {}),
        ("scan_x b256 P2", "scan_x",
         {"MOLVAX_GRU_B_BLK": "256", "MOLVAX_GRU_CHAINS": "2"}),
        ("scan_x b256 P1", "scan_x", {"MOLVAX_GRU_B_BLK": "256"}),
        ("scan_x b128 P2", "scan_x", {"MOLVAX_GRU_CHAINS": "2"}),
        ("hoisted b128 P1", "hoisted", {}),
        ("hoisted b256 P2", "hoisted",
         {"MOLVAX_GRU_B_BLK": "256", "MOLVAX_GRU_CHAINS": "2"}),
        ("hoisted b256 P1", "hoisted", {"MOLVAX_GRU_B_BLK": "256"}),
        ("hoisted b128 P2", "hoisted", {"MOLVAX_GRU_CHAINS": "2"}),
    ]
    modes = ("fwd", "fwdbwd")
    if "--mode" in sys.argv:
        modes = (sys.argv[sys.argv.index("--mode") + 1],)
    for mode in modes:
        for label, variant, env in configs:
            e = dict(os.environ, **env)
            r = subprocess.run(
                [sys.executable, "-m", "bench.chain_probe", "--one",
                 variant, mode],
                capture_output=True, text=True, env=e, timeout=560,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                ms = json.loads(line)["ms"]
                print(f"{mode:6s} {label:22s} {ms:8.3f} ms", flush=True)
            except Exception:
                print(f"{mode:6s} {label:22s} FAILED: "
                      f"{(r.stderr or '').strip()[-200:]}", flush=True)


if __name__ == "__main__":
    main()
