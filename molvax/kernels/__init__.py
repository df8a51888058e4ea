"""Pallas TPU kernels for the hot ops (SURVEY.md 7 stage 8), each with a jnp
reference implementation and interpret-mode tests:

  gru.py      - stacked-GRU layer recurrence (the training hot loop)
  conv_enc.py - fused conv encoder (codes -> mu/logvar, one-hot stays in VMEM)
  sampler.py  - fused reparameterization + KL with the on-chip PRNG
"""

import jax


def pallas_enabled() -> bool:
    """Kernels compile through Mosaic only on TPU; callers fall back to the
    jnp reference path elsewhere."""
    return jax.default_backend() == "tpu"
