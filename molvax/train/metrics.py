"""Structured metrics logging (JSONL + stdout).

Reference parity: the reference logs with bare ``print(epoch, loss)``
(SURVEY.md 5.5). Here: metrics come back from the jitted step as a small
device dict, are pulled to host only at log cadence (no per-step sync), and
go to a JSONL file + console line.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional, TextIO

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stream: Optional[TextIO] = None):
        self._file = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stderr
        self._t0 = time.perf_counter()

    def log(self, step: int, metrics: Dict, extra: Optional[Dict] = None) -> Dict:
        host = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }  # single device_get for the dict
        host["step"] = int(step)
        host["wall_s"] = round(time.perf_counter() - self._t0, 3)
        if extra:
            host.update(extra)
        line = json.dumps(host, sort_keys=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._stream:
            brief = " ".join(
                f"{k}={host[k]:.4g}"
                for k in ("loss", "recon", "kl", "beta", "acc")
                if k in host
            )
            if not brief:  # e.g. eval_-prefixed dicts: print them all
                brief = " ".join(
                    f"{k}={v:.4g}"
                    for k, v in sorted(host.items())
                    if k not in ("step", "wall_s")
                )
            print(f"[molvax] step {step}: {brief}", file=self._stream)
        return host

    def close(self):
        if self._file:
            self._file.close()


def device_metrics_ready(metrics: Dict) -> Dict:
    """Block on a metrics dict (for benchmarking / end of run)."""
    return jax.tree.map(lambda x: jax.block_until_ready(x), metrics)
