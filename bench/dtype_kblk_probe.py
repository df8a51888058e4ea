"""Round-5 probes: strict-fp32 kernel cost + small-K grid-overhead slope.

1. ``fp32`` — the dtype contract's price tag (VERDICT r4 next 4): the full
   zinc250k-shape train step with compute_dtype='float32' (strict-fp32
   per-layer Pallas kernels + XLA fp32 encoder) vs 'bfloat16' (production
   per-layer kernels) at the same batch. One number decides whether the
   quality preset's numerics-conservative fallback is affordable.

       python -m bench.dtype_kblk_probe fp32 [B]

2. ``kblk`` — the measured per-grid-step overhead at moses_scaled shapes
   (4xGRU-1024), used to bound what a VMEM-fitting small-K sub-stack plan
   would cost (VERDICT r4 next 5): run once per K with
   MOLVAX_GRU_TIME_BLK={8,4,2,1} in SEPARATE processes (the jitted calls
   cache their block plan at trace time).

       MOLVAX_GRU_TIME_BLK=2 python -m bench.dtype_kblk_probe kblk [B]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys


def _cfg(preset, B, **model_kw):
    from molvax.config import get_preset
    from molvax.data import DEFAULT_CHARSET

    base = get_preset(preset)
    return dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model,
            charset_size=DEFAULT_CHARSET.size,
            use_pallas=True,
            **model_kw,
        ),
        train=dataclasses.replace(base.train, batch_size=B),
    )


def main(argv):
    from bench.step_matrix import rate
    from molvax.data import synthetic_dataset
    from molvax.utils import enable_persistent_cache

    enable_persistent_cache()
    mode = argv[0] if argv else "fp32"
    B = int(argv[1]) if len(argv) > 1 else 256
    ds = synthetic_dataset(8192, max_len=120, seed=0)

    if mode == "fp32":
        out = {"mode": "fp32_contract_cost", "B": B}
        for cd in ("bfloat16", "float32"):
            cfg = _cfg(
                "zinc250k", B, gru_kernel="per_layer", compute_dtype=cd
            )
            out[cd] = round(rate(cfg, ds.codes), 0)
        out["fp32_over_bf16"] = round(out["float32"] / out["bfloat16"], 3)
        print(json.dumps(out), flush=True)
    elif mode == "kblk":
        k = os.environ.get("MOLVAX_GRU_TIME_BLK", "auto")
        if k != "auto" and k:
            if 120 % int(k):
                # _time_block silently falls back to the auto plan for a
                # non-dividing K; refusing here keeps the overhead-slope
                # data honest (review finding round 5)
                raise SystemExit(
                    f"MOLVAX_GRU_TIME_BLK={k} does not divide T=120; "
                    "the kernel would ignore it"
                )
        cfg = _cfg("moses_scaled", B, gru_kernel="per_layer")
        # single-chip probe: drop the preset's 8-chip mesh request
        cfg = dataclasses.replace(
            cfg, mesh=dataclasses.replace(cfg.mesh, data_axis=1)
        )
        r = rate(cfg, ds.codes)
        print(
            json.dumps(
                {"mode": "kblk", "B": B, "K": k, "smiles_per_sec": round(r, 0)}
            ),
            flush=True,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}; use fp32|kblk")


if __name__ == "__main__":
    main(sys.argv[1:])
