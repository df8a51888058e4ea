"""Pallas TPU kernels for the hot ops (SURVEY.md 7 stage 8), each with a jnp
reference implementation and interpret-mode tests:

  gru.py       - per-layer GRU recurrence kernels + the kernel router
  gru_stack.py - all-layers fused recurrence (weights VMEM-resident; the
                 'auto' training path wherever its VMEM plan fits, round 4)
  conv_enc.py  - fused conv encoder (codes -> mu/logvar, one-hot in VMEM)
  sampler.py   - fused reparameterization + KL with the on-chip PRNG
  generate.py  - fully VMEM-resident autoregressive generation loop
  automaton.py - fused constrained-decoding automaton step (mask+select+
                 advance of latent/constrain.py in one Mosaic program)
"""

import jax


def pallas_enabled() -> bool:
    """Kernels compile through Mosaic only on TPU; callers fall back to the
    jnp reference path elsewhere."""
    return jax.default_backend() == "tpu"
