"""Device-derived VMEM capacity for kernel planning (ADVICE r2).

Round-2 budgets were baked in from one dev chip's measured ~120 MB usable
VMEM; on a 16 MB/core TPU (v2/v3 — the pallas guide's architectural
baseline) those plans would admit working sets that fail Mosaic compilation
outright. This module centralizes capacity detection: known-large chips get
the measured budget, anything unrecognized gets the conservative 16 MB
figure, and planners derive their admission budgets from it.
"""

from __future__ import annotations

import functools
import os

import jax

_MB = 1024 * 1024

# Substring match on jax.Device.device_kind (lowercased). v5 lite is the dev
# chip (~120 MB usable measured round 2 via a VMEM probe); v5e/v5p/v6 share
# the 128 MB-class VMEM. v2/v3/v4 and unknown kinds fall through to the
# conservative default — kernels still run there with smaller block plans,
# and the fused paths fall back to per-layer/XLA when nothing fits.
_KNOWN_VMEM = (
    ("v5 lite", 128 * _MB),
    ("v5litepod", 128 * _MB),
    ("v5e", 128 * _MB),
    ("v5p", 128 * _MB),
    ("v6", 128 * _MB),
)
_DEFAULT_VMEM = 16 * _MB


@functools.lru_cache(maxsize=None)
def vmem_capacity_bytes() -> int:
    """Per-core VMEM capacity of the attached TPU (or a large figure off-TPU,
    where kernels run in interpret mode and VMEM is not a constraint).
    MOLVAX_VMEM_MB overrides for sweeps on unlisted hardware."""
    forced = os.environ.get("MOLVAX_VMEM_MB")
    if forced:
        return int(forced) * _MB
    if jax.default_backend() != "tpu":
        return 128 * _MB
    kind = jax.devices()[0].device_kind.lower()
    for sub, cap in _KNOWN_VMEM:
        if sub in kind:
            return cap
    return _DEFAULT_VMEM


def plan_budget() -> int:
    """Admission budget for block planners (75% of capacity: headroom for
    Mosaic temporaries and small operands)."""
    return int(vmem_capacity_bytes() * 0.75)


def vmem_limit() -> int:
    """Value for CompilerParams(vmem_limit_bytes=...): just under capacity.
    This is a cap Mosaic enforces, not an allocation."""
    return int(vmem_capacity_bytes() * 0.9375)


def stream_budget() -> int:
    """Budget for double-buffered grid-streamed blocks in per-layer kernels
    (weights/scratch are accounted separately by the callers)."""
    return max(2 * _MB, int(vmem_capacity_bytes() * 0.1))
