"""Profiling / tracing utilities (SURVEY.md 5.1).

The reference has no tracing at all. molvax exposes:
  * trace(): context manager around jax.profiler - writes a Perfetto/XProf
    trace directory viewable in xprof / perfetto.dev;
  * annotate(): named TraceAnnotation spans (encode/decode/loss show up as
    labeled regions in the trace);
  * cost_summary(): compiled-HLO FLOPs/bytes estimates for a jitted fn - the
    compiler-side speed-of-light numbers used to sanity-check bench results;
  * step_timer(): drain-honest wall timing for async dispatch (the axon PJRT
    tunnel resolves readiness events optimistically on first bursts, so a
    bare block_until_ready under-measures; always fetch to host).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def cost_summary(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compiler cost analysis of a jittable fn at these args: FLOPs, bytes
    accessed, arithmetic intensity, and — when the device peak is known —
    the compute-bound speed-of-light step time in seconds
    (``sol_step_s``: XLA-counted FLOPs / bf16 peak; Pallas custom calls
    are invisible to the counter, so treat it as a lower bound)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older API returned one dict per computation
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    out = {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
    }
    peak = device_peak_tflops()
    if peak:
        out["sol_step_s"] = flops / (peak * 1e12)
    return out


def forward_flops_per_smiles(cfg) -> float:
    """Analytic matmul FLOPs of one forward pass, per sample.

    Counted by hand from the architecture (ModelConfig) rather than XLA's
    cost_analysis because the hot recurrence lives inside Pallas custom calls
    that the compiler's FLOP counter does not see into. Elementwise gate math
    is excluded (it is VPU work, not MXU FLOPs - the MFU convention counts
    matmul FLOPs only, as in the scaling-book speed-of-light accounting).
    """
    T, C, L, H = cfg.max_len, cfg.charset_size, cfg.latent_dim, cfg.gru_hidden
    f = 0.0
    # conv stack (orientation 'seq': conv along T, charset = in channels)
    if cfg.conv_orientation == "seq":
        length, in_ch = T, C
    else:
        length, in_ch = C, T
    for ch, k in zip(cfg.conv_channels, cfg.conv_kernels):
        length = length - k + 1
        f += 2.0 * length * ch * in_ch * k
        in_ch = ch
    flat = length * in_ch
    f += 2.0 * flat * cfg.enc_hidden  # linear_0
    f += 2.0 * cfg.enc_hidden * L * 2  # mu, logvar heads
    f += 2.0 * L * L  # decoder linear_3
    gru_in = L + C if cfg.decoder_conditioning == "teacher_forced" else L
    for layer in range(cfg.gru_layers):
        in_size = gru_in if layer == 0 else H
        f += 2.0 * T * (in_size + H) * 3 * H  # input + hidden gate GEMMs
    f += 2.0 * T * H * C  # output projection
    if cfg.n_properties > 0:
        f += 2.0 * (L * cfg.property_hidden + cfg.property_hidden * cfg.n_properties)
    return f


def train_flops_per_smiles(cfg) -> float:
    """Analytic matmul FLOPs of one *training* step, per sample: forward +
    backward. Backward re-does each GEMM twice (dX and dW), so train ~= 3x
    forward - the standard accounting used for MFU."""
    return 3.0 * forward_flops_per_smiles(cfg)


# bf16 MXU peak by device kind; override with MOLVAX_PEAK_TFLOPS for new
# hardware. v5 lite == v5e: 197 TFLOP/s bf16 per chip (public spec).
_PEAK_TFLOPS_BF16 = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def device_peak_tflops(device=None) -> Optional[float]:
    """bf16 peak TFLOP/s of the attached chip, or None if unknown."""
    import os

    env = os.environ.get("MOLVAX_PEAK_TFLOPS")
    if env:
        return float(env)
    device = device or jax.devices()[0]
    return _PEAK_TFLOPS_BF16.get(getattr(device, "device_kind", ""), None)


def mfu(smiles_per_sec: float, cfg, device=None) -> Dict[str, float]:
    """Measured model-FLOPs utilization from a throughput measurement:
    {flops_per_smiles, tflops_sustained, mfu}. mfu is 0 when the chip's peak
    is unknown (report sustained TFLOP/s regardless)."""
    fps = train_flops_per_smiles(cfg)
    sustained = fps * smiles_per_sec / 1e12
    peak = device_peak_tflops(device)
    return {
        "flops_per_smiles": fps,
        "tflops_sustained": sustained,
        "mfu": (sustained / peak) if peak else 0.0,
    }


def step_timer(
    step_fn: Callable,
    *args,
    steps: int = 10,
    rounds: int = 3,
    fetch: Optional[Callable] = None,
) -> float:
    """Median drain-honest seconds per invocation of step_fn(*args).

    fetch(out) must pull a scalar to the host (defaults to the first
    non-empty leaf, falling back to block_until_ready for empty/None
    outputs); run inside the timed region so the async queue fully
    drains."""
    if fetch is None:

        def fetch(out):
            for leaf in jax.tree.leaves(out):
                arr = np.asarray(leaf)
                if arr.size:
                    return float(arr.ravel()[0])
            jax.block_until_ready(out)
            return 0.0
    out = step_fn(*args)
    fetch(out)
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = step_fn(*args)
        fetch(out)
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times[1:] if len(times) > 1 else times))
